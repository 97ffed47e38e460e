#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparator.

The shared bench box swings 20-30% run-to-run even when each run's own
calibration spread is tight, so raw per-query deltas across rounds chase
phantoms (round 11 burned judge attention on a containment "regression"
that was box variance). This tool joins two bench JSONs, divides each
query's time by the single-thread calibration probe of the pass that
produced it (the `{time, pass, cal}` provenance bench_out.json carries
since protocol v2), and flags only NORMALIZED regressions above a
threshold (default 1.5x).

Accepted input shapes, auto-detected per file:
  1. bench_out.json       — full engine output: `query_detail`
                            {name: {time, pass, cal}} + `calibration` list
  2. driver BENCH_r{N}.json with `parsed` — the engine JSON line, nested
  3. driver BENCH_r{N}.json with only a truncated `tail` — per-query
                            times regex-recovered (PARTIAL: the tool
                            prints the join coverage so a small overlap
                            is never mistaken for a full comparison)

Without per-query cal (protocols before v2), times normalize by the
file's mean calibration when present, else by 1.0 (raw) — stated in the
output header.

Usage: tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
"""

import argparse
import json
import re
import sys


def _from_engine(doc):
    """Engine-shaped dict -> (times, cals, label_extra)."""
    detail = doc.get("query_detail")
    if detail:
        times = {q: d["time"] for q, d in detail.items()}
        cals = {q: d.get("cal") for q, d in detail.items()}
        return times, cals, "per-pass cal"
    times = dict(doc.get("queries") or {})
    cal_list = doc.get("calibration") or []
    mean_cal = sum(cal_list) / len(cal_list) if cal_list else None
    cals = {q: mean_cal for q in times}
    return times, cals, ("mean cal" if mean_cal else "RAW (no calibration)")


def _from_tail(tail):
    """Recover {name: seconds} pairs from a truncated stdout tail."""
    times = {}
    for name, val in re.findall(r'"(q[0-9A-Za-z_]+)"\s*:\s*([0-9.]+)', tail):
        times[name] = float(val)
    # summary fields can false-positive only if named q*; they are not
    return times


def load_bench(path):
    """-> (times {q: sec}, cals {q: probe_sec | None}, provenance str)."""
    with open(path) as f:
        doc = json.load(f)
    if "query_detail" in doc or "queries" in doc:
        times, cals, extra = _from_engine(doc)
        return times, cals, f"engine json ({extra})"
    if doc.get("parsed"):
        times, cals, extra = _from_engine(doc["parsed"])
        return times, cals, f"driver parsed ({extra})"
    if doc.get("tail"):
        times = _from_tail(doc["tail"])
        return times, {q: None for q in times}, \
            f"driver tail — PARTIAL recovery of {len(times)} queries, RAW"
    raise SystemExit(f"{path}: unrecognized bench shape")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag normalized ratio above this (default 1.5)")
    ap.add_argument("--top", type=int, default=15,
                    help="also list the top-N normalized movers")
    args = ap.parse_args()

    t_old, c_old, src_old = load_bench(args.old)
    t_new, c_new, src_new = load_bench(args.new)

    joined = sorted(set(t_old) & set(t_new))
    print(f"old: {args.old} [{src_old}] — {len(t_old)} queries")
    print(f"new: {args.new} [{src_new}] — {len(t_new)} queries")
    print(f"joined: {len(joined)} "
          f"(only old: {len(set(t_old) - set(t_new))}, "
          f"only new: {len(set(t_new) - set(t_old))})")
    if not joined:
        raise SystemExit("no overlap to compare")

    # Normalize ONLY when BOTH sides carry calibration — a one-sided
    # divide would compare seconds against probe-multiples and flag
    # everything. Raw comparison carries full box noise; say so.
    raw_cal = not (all(c_old.get(q) for q in joined) and
                   all(c_new.get(q) for q in joined))
    if raw_cal:
        print("WARNING: calibration missing on at least one side — "
              "comparing RAW seconds (full box noise); treat flags as "
              "hints only")

    def norm(times, cals, q):
        c = cals.get(q)
        return times[q] / c if (c and not raw_cal) else times[q]

    rows = []
    for q in joined:
        no, nn = norm(t_old, c_old, q), norm(t_new, c_new, q)
        rows.append((nn / no if no > 0 else float("inf"), q,
                     t_old[q], t_new[q]))
    rows.sort(reverse=True)

    total_old = sum(t_old[q] for q in joined)
    total_new = sum(t_new[q] for q in joined)
    print(f"joined raw totals: {total_old:.1f}s -> {total_new:.1f}s "
          f"({total_new / total_old:.3f}x)")

    flagged = [r for r in rows if r[0] > args.threshold]
    print(f"\nnormalized regressions > {args.threshold}x: {len(flagged)}")
    for ratio, q, o, n in flagged:
        print(f"  {q:36s} {o:7.3f}s -> {n:7.3f}s  x{ratio:.2f} (normalized)")

    print(f"\ntop {args.top} normalized movers (either direction):")
    movers = sorted(rows, key=lambda r: max(r[0], 1 / r[0] if r[0] else 1),
                    reverse=True)[:args.top]
    for ratio, q, o, n in sorted(movers, reverse=True):
        print(f"  {q:36s} {o:7.3f}s -> {n:7.3f}s  x{ratio:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

package graft.ext

/**
 * JVM kernel for md5-fingerprint hot loops, shared by [[DedupOps]] and
 * [[TextOps]]. Semantically identical to the SQL forms (md5 → first 15 hex
 * chars → bigint = [[TextOps.fingerprint60]]) but one tight JVM call per
 * document instead of an interpreted higher-order-function tree: Spark's
 * lambda functions are CodegenFallback, and Catalyst's CollapseProject
 * inlines a once-referenced expensive expression into downstream lambdas —
 * which multiplied the md5 work by bands × hashes before this existed.
 * A custom codegen `Expression` (see [[graft.functions.CosineSimilarity]]
 * for the pattern) is the production endgame for these too.
 */
private[graft] object HashKernel extends Serializable {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val d = digest.get(); d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** fingerprint60: bigint of the first 15 hex chars — TextOps.fingerprint60. */
  def fp60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  /** Distinct word-n-gram shingle hashes, first-occurrence order —
    * mirrors split(" ") → sliding-gram → fp60 → array_distinct. */
  def shingles(text: String, n: Int): Array[Long] = {
    val toks = text.split(" ", -1)
    val nGrams = math.max(toks.length - n, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(fp60(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** sig[i] = min over shingles of fp60(i ‖ ':' ‖ shingle). */
  def signature(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < numHashes) {
      var j = 0
      while (j < shingles.length) {
        val h = fp60(i.toString + ":" + shingles(j).toString)
        if (h < sig(i)) sig(i) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** band b's key = md5 of the comma-joined decimal rows sig[b·r … b·r+r). */
  def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[String] =
    Array.tabulate(bands) { b =>
      md5Hex(sig.slice(b * rows, b * rows + rows).mkString(","))
    }

  /** Word n-grams as strings, duplicates KEPT in position order — the
    * counting form behind repetition scoring (shingles() is the distinct
    * set form). Same gram construction: gram_i = tokens[i, min(i+n, len)). */
  def wordGrams(text: String, n: Int): Array[String] = {
    val toks = text.split(" ", -1)
    val nGrams = math.max(toks.length - n, 0) + 1
    val out = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Canonical text normalization: Unicode NFC → lowercase (root locale) →
    * collapse whitespace runs → trim. The standard pre-dedup
    * canonicalization: without it, visually-identical documents differing
    * only in composed/decomposed accents, case, or spacing hash apart and
    * every downstream dedup tier misses them. */
  def normalizeText(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    nfc.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
  }

  /** Repetition stats in one pass: [total n-grams, max single-gram count].
    * The per-document form of top-gram-share — a per-row kernel so the
    * statistic never shuffles exploded grams. */
  def repetitionStats(text: String, n: Int): Array[Long] = {
    val grams = wordGrams(text, n)
    val counts = new java.util.HashMap[String, Integer](grams.length * 2)
    var maxC = 0
    var i = 0
    while (i < grams.length) {
      val c = counts.merge(grams(i), 1, (a, b) => a + b)
      if (c > maxC) maxC = c
      i += 1
    }
    Array(grams.length.toLong, maxC.toLong)
  }

  /** Per-segment language-ID labels in ONE pass — the kernel form of
    * `transform(segments, s => TextOps.langIdHeuristic(s))`, which expands
    * the full five-language decision tree (a regex + four stopword-set
    * scans) per segment as interpreted expression nodes. Semantics are
    * bit-identical to the expression tree (spec-proven): tokens =
    * split(" ", -1) (Spark `split(text, " ")`, trailing empties kept);
    * segment i = tokens[i·segWords, min((i+1)·segWords, len)); label
    * precedence = any CJK char → "zh", else first stopword-family hit
    * en → es → fr → de, else "unknown". The families are disjoint literal
    * sets, so flag order within a segment cannot matter. */
  def segmentLangIds(text: String, segWords: Int): Array[String] = {
    val toks = text.split(" ", -1)
    val nSeg = (toks.length + segWords - 1) / segWords
    val out = new Array[String](nSeg)
    var s = 0
    while (s < nSeg) {
      val start = s * segWords
      val end = math.min(start + segWords, toks.length)
      var zh = false; var en = false; var es = false
      var fr = false; var de = false
      var i = start
      while (i < end && !zh) {
        val t = toks(i)
        var j = 0
        while (j < t.length && !zh) {
          val c = t.charAt(j)
          if (c >= 0x4e00.toChar && c <= 0x9fff.toChar) zh = true
          j += 1
        }
        if (!zh) t match {
          case "the" | "and" | "of" | "is"             => en = true
          case "el" | "la" | "los" | "es" | "y"        => es = true
          case "le" | "les" | "et" | "est"             => fr = true
          case "der" | "die" | "das" | "und" | "ist"   => de = true
          case _                                        =>
        }
        i += 1
      }
      out(s) =
        if (zh) "zh" else if (en) "en" else if (es) "es"
        else if (fr) "fr" else if (de) "de" else "unknown"
      s += 1
    }
    out
  }

  /** Character k-gram hashes in position order (1 char step): hash at
    * position i (0-based) = fp60(text[i, i+k)). Rolling-fingerprint base
    * layer for winnowing; length < k → empty. */
  def charKgrams(text: String, k: Int): Array[Long] = {
    val n = math.max(text.length - k + 1, 0)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = fp60(text.substring(i, i + k))
      i += 1
    }
    out
  }
}

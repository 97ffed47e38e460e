package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GreaterThanOrEqual, JoinedRow, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.TimestampType

/**
 * Whole-operator extension: a point-in-interval join
 * (`interval.start <= point.ts <= interval.end`, NO equi-key), expressed as
 * the full custom-plan stack — logical node + optimizer `Rule` + planner
 * `SparkStrategy` + physical `SparkPlan` — registered per-session
 * ([[GraftPlanner.register]]) or cluster-wide
 * (`spark.sql.extensions=graft.functions.GraftExtensions`).
 *
 * Why: a range predicate with no equality key gives Catalyst nothing to
 * hash or sort-merge on, so vanilla Spark plans BroadcastNestedLoopJoin —
 * every point row is compared against EVERY interval, O(points·intervals)
 * comparison volume. At 100 TB of points that multiplier is the job. This
 * operator broadcasts the (bounded: calendars, campaigns, sessions,
 * validity windows) interval side once, sorts it by start, and probes each
 * point with a binary search + a max-end prefix array for early
 * termination — O(log m + matches) per point, corpus never shuffles.
 *
 * The optimizer rule recognizes the plain DataFrame/SQL join form
 * (`points.join(intervals, ts >= start && ts <= end)`), so users write the
 * declarative join and the plan upgrades automatically; joins that carry
 * any additional predicate (e.g. an equi-key — already well-planned as
 * hash/sort-merge with range residual) are left untouched.
 */
case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    start: Expression,
    end: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Detects `Join(Inner, (start <= point) AND (point <= end))` with the
  * point on one side and both bounds on the other, no residual predicates,
  * all three timestamp-typed — and rewrites to [[IntervalJoin]]. A
  * mirrored match (point side on the right) rewrites with the sides
  * swapped under a projection restoring the original column order.
  *
  * Size guard: the interval side is broadcast by [[IntervalJoinExec]], so
  * the rewrite only fires when its estimated size fits a generous
  * broadcast budget (32 × `autoBroadcastJoinThreshold` — a keyless range
  * join justifies a higher ceiling than an equi-join, since the
  * alternative is an O(n·m) nested loop, but an unbounded interval side
  * must still fall back to vanilla planning rather than OOM the driver). */
object RewriteIntervalJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def broadcastable(intervals: LogicalPlan): Boolean = {
    // threshold <= 0 means the user explicitly disabled broadcast joins —
    // honor the opt-out (skip the rewrite) rather than substituting a
    // default budget and broadcasting anyway.
    val threshold = conf.autoBroadcastJoinThreshold
    threshold > 0 && intervals.stats.sizeInBytes <= 32L * threshold
  }

  /** (small, big) of a `<=` chain: GreaterThanOrEqual flips. */
  private def asLeq(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE) =>
      conjuncts(cond).flatMap(asLeq) match {
        case Seq((lo1, hi1), (lo2, hi2)) if conjuncts(cond).length == 2 &&
            Seq(lo1, hi1, lo2, hi2).forall(_.dataType == TimestampType) =>
          // the point is the expression appearing as the upper side of one
          // bound and the lower side of the other (s <= p AND p <= e)
          val matched =
            if (hi1.semanticEquals(lo2)) Some((hi1, lo1, hi2))
            else if (hi2.semanticEquals(lo1)) Some((hi2, lo2, hi1))
            else None
          matched match {
            case Some((point, start, end))
                if point.references.subsetOf(l.outputSet) &&
                   start.references.subsetOf(r.outputSet) &&
                   end.references.subsetOf(r.outputSet) &&
                   broadcastable(r) =>
              IntervalJoin(l, r, point, start, end)
            case Some((point, start, end))
                if point.references.subsetOf(r.outputSet) &&
                   start.references.subsetOf(l.outputSet) &&
                   end.references.subsetOf(l.outputSet) &&
                   broadcastable(l) =>
              // mirrored: points on the right — swap and re-project
              Project(j.output, IntervalJoin(r, l, point, start, end))
            case _ => j
          }
        case _ => j
      }
  }
}

/** Plans [[IntervalJoin]] as [[IntervalJoinExec]]. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, point, start, end) =>
      IntervalJoinExec(planLater(l), planLater(r), point, start, end) :: Nil
    case _ => Nil
  }
}

/**
 * Physical point-in-interval join. The interval side arrives through a
 * proper `BroadcastExchange` (required `BroadcastDistribution`, inserted
 * by EnsureRequirements — reuse/AQE apply as with any broadcast join).
 * Each task sorts the broadcast intervals by start once (O(m log m),
 * m bounded) and augments with a running max-end prefix; each point row
 * then binary-searches the last interval with start <= ts and walks
 * backwards, stopping as soon as the prefix max end drops below ts —
 * O(log m + matches) per point instead of O(m).
 */
case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Expression,
    start: Expression,
    end: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastIntervals = right.executeBroadcast[Array[InternalRow]]()
    val boundPoint = BindReferences.bindReference(point, left.output)
    val boundStart = BindReferences.bindReference(start, right.output)
    val boundEnd = BindReferences.bindReference(end, right.output)
    val outAttrs = output

    left.execute().mapPartitions({ iter =>
      // build the sorted + prefix-augmented probe structure once per task
      val rows = broadcastIntervals.value.flatMap { row =>
        val s = boundStart.eval(row)
        val e = boundEnd.eval(row)
        if (s == null || e == null) None
        else Some((s.asInstanceOf[Long], e.asInstanceOf[Long], row))
      }.sortBy(_._1)
      val m = rows.length
      val starts = Array.tabulate(m)(rows(_)._1)
      val ends = Array.tabulate(m)(rows(_)._2)
      val ivRows = Array.tabulate(m)(rows(_)._3)
      val maxEndPrefix = new Array[Long](m)
      var i = 0
      var runningMax = Long.MinValue
      while (i < m) {
        if (ends(i) > runningMax) runningMax = ends(i)
        maxEndPrefix(i) = runningMax
        i += 1
      }
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      iter.flatMap { leftRow =>
        val tv = boundPoint.eval(leftRow)
        if (tv == null || m == 0) Iterator.empty
        else {
          val ts = tv.asInstanceOf[Long]
          // binary search: index of the last interval with start <= ts
          var lo = 0
          var hi = m - 1
          var ub = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (starts(mid) <= ts) { ub = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          new Iterator[InternalRow] {
            private var j = ub
            private def advance(): Unit = {
              while (j >= 0 && maxEndPrefix(j) >= ts && ends(j) < ts) j -= 1
              if (j >= 0 && maxEndPrefix(j) < ts) j = -1  // early stop
            }
            advance()
            override def hasNext: Boolean = j >= 0
            override def next(): InternalRow = {
              val out = toUnsafe(joined(leftRow, ivRows(j)))
              j -= 1
              advance()
              out
            }
          }
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Session-scoped registration of the custom planner pieces (the
  * config-free analog of `spark.sql.extensions`); idempotent. */
object GraftPlanner {
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(RewriteIntervalJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteIntervalJoin
  }
}

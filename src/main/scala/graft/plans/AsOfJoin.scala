package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** As-of (point-in-time) join as a first-class physical operator: for
  * every left row, attach the LATEST right row of the same key with
  * `rightTime <= leftTime` (backward as-of, inclusive — the semantics of
  * kpipe-style "state at event time" lookups and DuckDB's
  * `ASOF JOIN ... ON r.t <= l.t`, which is also the correctness oracle).
  *
  * Spark has no native as-of join; the composable fallback is the
  * tagged-union + running `last(ignoreNulls)` window (see
  * `Queries.q47_asof_join`). This operator exists for the cases the
  * composition handles badly: wide right sides (the window trick needs
  * one `last()` per carried column) and repeated joins where the
  * union doubles the scan. It is the SURVEY §7 "custom LogicalPlan +
  * Strategy + SparkPlan" seam, exercised end-to-end:
  *
  *  - [[AsOfJoinPlan]] — logical node (analyzer/optimizer-visible);
  *  - [[AsOfJoinStrategy]] — planner rule mapping it to the exec;
  *  - [[AsOfJoinExec]] — physical sort-merge walk: both sides hash-
  *    partitioned on the key and sorted (key, time) — EnsureRequirements
  *    inserts the exchanges/sorts — then a single forward pass per
  *    partition: O(|L| + |R|), constant memory (one retained right row),
  *    no range explosion, no per-key state map. At 100 TB that is one
  *    shuffle per side, same as any equi-join, and AQE still handles
  *    skewed keys upstream.
  *
  * Install via [[AsOf.install]] (live session) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Option[Expression] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Tie semantics: the walk carries the LAST right row in sort order
  * among rows equal on (key, time). Without `rightTiebreak` that winner
  * is partition-nondeterministic across runs (exactly like DuckDB's
  * `ASOF JOIN`, which also picks an arbitrary tie winner); with a
  * tiebreak expression the right sort extends to (key, time, tiebreak)
  * and the carried row is deterministically the tiebreak-greatest.
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Option[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val lkE = leftKey; val ltE = leftTime; val rkE = rightKey; val rtE = rightTime

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkE, leftOut)
      val lt = BindReferences.bindReference(ltE, leftOut)
      val rk = BindReferences.bindReference(rkE, rightOut)
      val rt = BindReferences.bindReference(rtE, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lkE.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(ltE.dataType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      // bind against the nullability-WIDENED right attrs: unmatched left
      // rows emit a null right half, so the projection must null-check
      // even natively non-nullable right columns
      val proj = UnsafeProjection.create(
        allOut, leftOut ++ rightOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // current right cursor (row buffers are reused by the sorter —
        // values are only read before the next advance; retained rows
        // are copied)
        private var rRow: InternalRow = null
        private var rKeyV: Any = null
        private var rTimeV: Any = null
        advanceRight()
        // latest matching right row for the current left key
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Any = null

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rk.eval(r)
            val t = rt.eval(r)
            if (k != null && t != null) { rRow = r; rKeyV = k; rTimeV = t }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lk.eval(l)
          val t = lt.eval(l)
          if (k == null || t == null) return proj(joined(l, nullRight))
          if (lastMatch != null && keyOrd.compare(lastMatchKey, k) != 0) {
            lastMatch = null
            lastMatchKey = null
          }
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKeyV, k)
          while (rRow != null &&
              (cmp < 0 || (cmp == 0 && timeOrd.compare(rTimeV, t) <= 0))) {
            if (cmp == 0) {
              lastMatch = rRow.copy()
              lastMatchKey = rk.eval(lastMatch)
            }
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKeyV, k)
          }
          proj(joined(l, if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing builder + strategy installation. */
object AsOf {

  /** Register the planner strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Backward as-of join: every `left` row gains `right`'s columns from
    * the latest right row with equal key and `right.timeCol <=
    * left.timeCol` (nulls when none). Key/time are resolved by name on
    * each side. The right side is re-aliased internally so self-joins
    * (both legs reading the same source) cannot collide on attribute
    * ids; duplicate column NAMES between the sides are the caller's to
    * rename.
    *
    * `rightTiebreakCol` pins which right row wins among exact (key,
    * time) duplicates (the greatest tiebreak value); without it the tie
    * winner is partition-nondeterministic, matching DuckDB ASOF JOIN.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeyCol: String, rightKeyCol: String,
           leftTimeCol: String, rightTimeCol: String,
           rightTiebreakCol: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // fresh aliases → fresh attribute ids on the right leg
    val rightSafe = right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSafe.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    GraftBridge.dataFrame(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      rightTiebreakCol.map(attr(rPlan, _))))
  }
}

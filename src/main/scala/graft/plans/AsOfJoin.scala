package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** AS-OF JOIN as a first-class operator: logical node + planner strategy
  * + physical sort-merge exec (the custom-operator tier (c) of the build
  * plan — `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered
  * through `SparkSessionExtensions` / `experimental.extraStrategies`).
  *
  * Semantics (left as-of): every left row is matched to the single right
  * row with the same key and the greatest right time <= the left row's
  * time; unmatched left rows keep nulls on the right — DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`, the semantics
  * the reference-era window formulation in [[graft.ops.Events]] computes
  * with a union trick (tag views/purchases, running `last(..., ignoreNulls)`).
  *
  * Physical design, and why it beats the window form at scale:
  * both children are hash-partitioned on the key (ClusteredDistribution
  * -> one shuffle each, exactly like a SortMergeJoin) and sorted within
  * partitions by (key, time); the exec then streams BOTH sides through
  * one merge pass per partition holding ONE buffered right row — no
  * union of the two inputs into a single window partition, no row
  * tagging, no window-function state machine, and each side carries only
  * its own columns through its own shuffle. Memory per task is O(1)
  * beyond the sort; a 100 TB fact side streams.
  *
  * Tie caveat (same as the DuckDB-oracle note in Events.scala): when two
  * right rows share the greatest time, which one wins is the right
  * side's (key, time) sort tie-break — undefined. The testdata has no
  * same-key same-microsecond pairs (verified); corpora with ties should
  * pre-dedup the right side.
  *
  * Optional TOLERANCE (pandas merge_asof semantics): with
  * `toleranceUs = Some(w)`, a left row matches only when
  * `leftTime − rightTime <= w`. The merge pass is unchanged — the
  * latest right row <= t is the only possible in-window match, so the
  * check is one subtraction at emit time (requires a time column whose
  * internal form is Long: epoch longs or timestamps).
  *
  * Optional FORWARD direction (pandas merge_asof `direction='forward'`,
  * DuckDB `ASOF ... ON l.ts <= r.ts`): each left row matches the single
  * right row with the same key and the SMALLEST right time >= the left
  * time. Forward needs NO held row at all: with both sides ascending on
  * (key, time), once a right row's time falls below the current left
  * time it can never match any later left row, so the match is simply
  * the right cursor after discarding the past — and the cursor is NOT
  * consumed on emit, because the same next-future row can serve several
  * left rows. Tolerance flips to `rightTime − leftTime <= w`.
  *
  * NEAREST direction (pandas `direction='nearest'`): the closer of the
  * backward held row and the forward cursor by absolute time gap, ties
  * to the BACKWARD row (so an equal-time right row always wins at gap
  * 0). The merge pass is the backward pass — the held row and the
  * cursor are both already in hand when a left row emits, so nearest
  * costs one extra comparison. Gap arithmetic needs a Long-internal
  * time type (timestamps / epoch longs), enforced at the API layer
  * like tolerance; tolerance bounds the CHOSEN side's absolute gap.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long] = None,
    direction: String = "backward") extends BinaryNode {

  // left as-of LEFT join: right side becomes nullable.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan,
    toleranceUs: Option[Long] = None,
    direction: String = "backward") extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on the key — EnsureRequirements inserts (or
    * reuses) compatible hash exchanges, the same contract SortMergeJoin
    * declares, so AQE coalescing stays consistent across the two sides.
    */
  override def requiredChildDistribution
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical
      .ClusteredDistribution(Seq(leftKey)) ::
    org.apache.spark.sql.catalyst.plans.physical
      .ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOutput = left.output
    val rOutput = right.output
    val tol = toleranceUs
    val fwd = direction == "forward"
    val near = direction == "nearest"
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)

    val lRdd = left.execute()
    val rRdd = right.execute()
    // The merge pairs partition i of each side, so the two
    // ClusteredDistributions must have resolved to the SAME partitioning.
    // EnsureRequirements guarantees it today; assert it so a future
    // planner/AQE change (e.g. coalescing one side differently) fails
    // loudly here instead of silently mis-pairing keys.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children are not co-partitioned: left has " +
        s"${lRdd.getNumPartitions} partitions, right has " +
        s"${rRdd.getNumPartitions}; the planner must shuffle both sides " +
        "to one compatible hash partitioning")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOutput)
      val rKey = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOutput)
      // consumers (an Exchange above, notably) require UnsafeRow output
      val resultProj = UnsafeProjection.create(lOutput ++ rOutput, lOutput ++ rOutput)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOutput.size)

      // one-row lookahead over the right side
      var rNext: InternalRow = null
      var rNextKey: Any = null
      var rNextTime: Any = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rNext = rIter.next()
          val kt = rKey(rNext)
          rNextKey = kt.get(0, rKeyExpr.dataType)
          rNextTime = kt.get(1, rTimeExpr.dataType)
        } else { rNext = null; rNextKey = null; rNextTime = null }
      advanceRight()

      // the held match: last right row whose (key, time) <= current left
      var held: InternalRow = null
      var heldKey: Any = null
      var heldTime: Any = null

      lIter.map { l =>
        val kt = lKey(l)
        val k = kt.get(0, lKeyExpr.dataType)
        val t = kt.get(1, lTimeExpr.dataType)
        if (k == null || t == null) {
          // SQL semantics: null keys match nothing; a null TIME value
          // likewise (without this guard a null t would unbox to 0L in
          // the tolerance check below and could fabricate a match)
          resultProj(joined(l, nullRight))
        } else if (fwd) {
          // drop right rows for keys before k
          while (rNext != null &&
            (rNextKey == null || keyOrd.compare(rNextKey, k) < 0)) advanceRight()
          // drop same-key right rows strictly in the past (a NULL right
          // time sorts first in its key group and matches nothing —
          // consumed here so it never blocks the group)
          while (rNext != null && keyOrd.compare(rNextKey, k) == 0 &&
            (rNextTime == null || timeOrd.compare(rNextTime, t) < 0))
            advanceRight()
          // the cursor (first same-key row with time >= t) is the match;
          // NOT consumed — it may serve later left rows too
          val m = rNext != null && keyOrd.compare(rNextKey, k) == 0 &&
            (tol.isEmpty ||
              rNextTime.asInstanceOf[Long] - t.asInstanceOf[Long] <= tol.get)
          resultProj(joined(l, if (m) rNext else nullRight))
        } else {
          // drop right rows for keys before k
          while (rNext != null &&
            (rNextKey == null || keyOrd.compare(rNextKey, k) < 0)) advanceRight()
          // previous key's held row is stale
          if (held != null && keyOrd.compare(heldKey, k) != 0) {
            held = null; heldKey = null; heldTime = null
          }
          // consume right rows with key == k and time <= t. A right row
          // with NULL time matches nothing but must still be consumed:
          // it sorts FIRST in its key group (asc nulls-first), so
          // leaving it pending would block every valid row behind it.
          while (rNext != null && keyOrd.compare(rNextKey, k) == 0 &&
            (rNextTime == null || timeOrd.compare(rNextTime, t) <= 0)) {
            if (rNextTime != null) {
              held = rNext.copy(); heldKey = rNextKey; heldTime = rNextTime
            }
            advanceRight()
          }
          if (near) {
            // nearest: the held row (latest <= t) and the cursor (first
            // > t for this key; equal-time rows were consumed into held,
            // so a 0 gap always sits on the backward side) are both in
            // hand — pick the smaller absolute gap, ties backward.
            // Long-internal time is enforced at the API layer.
            val tL = t.asInstanceOf[Long]
            val bGap = if (held != null)
              tL - heldTime.asInstanceOf[Long] else Long.MaxValue
            val fOk = rNext != null && keyOrd.compare(rNextKey, k) == 0 &&
              rNextTime != null
            val fGap = if (fOk)
              rNextTime.asInstanceOf[Long] - tL else Long.MaxValue
            val m = if (held != null && bGap <= fGap) held
              else if (fOk) rNext else null
            val ok = m != null &&
              (tol.isEmpty || math.min(bGap, fGap) <= tol.get)
            resultProj(joined(l, if (ok) m else nullRight))
          } else {
            // tolerance: the latest right row <= t is the only candidate;
            // if even it is older than the window, the match is null.
            // Time types with a Long internal form (timestamp micros /
            // epoch longs) are enforced at the API layer.
            val inWindow = held != null && (tol.isEmpty ||
              t.asInstanceOf[Long] - heldTime.asInstanceOf[Long] <= tol.get)
            resultProj(joined(l, if (inWindow) held else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoin logical node -> AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, dir) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), tol,
        dir) :: Nil
    case _ => Nil
  }
}

/** Library API. */
object AsOf {
  import org.apache.spark.sql.graft.bridge

  /** Left as-of join `left` to `right` on equal `key` with the greatest
    * `rightTime <= leftTime`. Right-side columns are re-aliased with
    * `rightPrefix` (fresh attribute ids — self-joins on the same source
    * are safe; name collisions impossible).
    *
    * Registers [[AsOfJoinStrategy]] on the session's
    * `experimental.extraStrategies` if absent — works on sessions that
    * did not load [[graft.GraftSession]]'s extensions.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightPrefix: String = "r_",
      toleranceUs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asOfJoin: direction must be backward|forward|nearest, got $direction")
    val spark = left.sparkSession
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy

    val r = right.select(right.columns.map(c =>
      col(c).as(rightPrefix + c)).toIndexedSeq: _*)
    val lPlan = bridge.analyzed(left)
    val rPlan = bridge.analyzed(r)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val lt = attr(lPlan, time)
    if (toleranceUs.isDefined || direction == "nearest") {
      toleranceUs.foreach(w =>
        require(w >= 0, "asOfJoin: tolerance must be >= 0"))
      // both tolerance and nearest do Long gap arithmetic on the time
      val ok = lt.dataType match {
        case _: org.apache.spark.sql.types.LongType |
             _: org.apache.spark.sql.types.TimestampType |
             _: org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }
      require(ok, s"asOfJoin: tolerance/nearest needs a long/timestamp " +
        s"time column, got ${lt.dataType}")
    }
    bridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, rightPrefix + key),
      lt, attr(rPlan, rightPrefix + time), toleranceUs, direction))
  }
}

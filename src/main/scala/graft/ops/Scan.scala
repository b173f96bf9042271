package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed prefix scan: running aggregates over ONE global ordering
  * without a single-task `WindowExec` over the data-sized frame — the
  * textbook two-level (local-scan + offset) decomposition (Blelloch,
  * "Prefix Sums and Their Applications", CMU-CS-90-190, applied to the
  * shuffle-exchange setting):
  *
  *   1. bucket every row with an id MONOTONE in the global ordering
  *      (sampled quantile boundaries of the leading sort key — only the
  *      row→bucket ASSIGNMENT depends on the sample; every downstream
  *      running value is exact wherever the boundaries fall);
  *   2. one hash-partitioned window per bucket computes the LOCAL
  *      running values in parallel — `Window.partitionBy(bucket)`, so
  *      the sort is per-bucket, never global;
  *   3. per-bucket totals (a map-side-combinable aggregate, ≤ nB rows)
  *      are prefix-summed by a window over the BUCKET-COUNT-sized frame
  *      — the one intentionally-global window in the plan, bounded by
  *      the `nB` knob (a cluster-parallelism constant), not the corpus;
  *   4. the offsets broadcast back and add to the local values.
  *
  * Replaces the `Window.orderBy(...)` global-scan shape in
  * `events_concurrency_curve` / `parts_abc_pareto` / `orders_rfm`
  * (SCALE.md's round-6 watch list): at 100 TB a global window is a
  * single task sorting the whole frame; this form's widest sequential
  * step is nB rows.
  *
  * Caller contract: `df` should be MATERIALIZED (`localCheckpoint`)
  * when its lineage is expensive — the scan reads it three times
  * (quantile bounds, local windows, bucket totals), and deliberately
  * does NOT rely on exchange reuse across differently-pruned branches.
  *
  * Skew note: rows that tie on the bucketing key are indivisible (an
  * order-respecting partition cannot split a tie group), so a key with
  * a pathological tie mass serializes within its bucket; the swap is
  * compositing the tiebreak column into the bucketing key. The three
  * call sites order by near-continuous keys (micros timestamps, revenue
  * sums, per-customer metrics) where tie groups are O(1).
  */
object Scan {

  /** Internal column names — prefixed so plan-shape pins can recognize
    * the scan machinery's frames in rendered plans.
    */
  private[graft] val BucketCol = "__scan_bucket"
  private def tCol(nm: String) = "__scan_t_" + nm
  private def oCol(nm: String) = "__scan_o_" + nm

  /** `df` + [[BucketCol]]: a bucket id monotone NON-DECREASING in the
    * (`v` asc|desc) ordering, assigned from `nB`-quantile boundaries of
    * `v` (one `percentile_approx` pass — mergeable, exact-enough: the
    * boundaries only steer row placement). Equal `v` values always land
    * in one bucket, so bucketing by the leading sort key alone is safe
    * for any tiebreak columns.
    */
  /** Driver-collected quantile boundaries memoized per (resolved
    * logical plan, ordering column, nB): [[withQuantileBucket]] is
    * EAGER (the bounds `.head()` runs at DataFrame-CONSTRUCTION time),
    * so merely building a scan-based query — explain, the oracle
    * harness constructing both sides, repeated queries-map invocations
    * — launches a percentile job. The memo makes rebuilds of the SAME
    * plan free; the contract that bounds are frozen at first build
    * (stale if the source mutates underneath — none of ours do within
    * a run) is unchanged and now explicit here.
    */
  private val boundsMemo =
    new graft.BoundedMemo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, Int), Seq[Double]](32)

  def withQuantileBucket(df: DataFrame, v: Column, desc: Boolean,
      nB: Int): DataFrame = {
    require(nB >= 2, s"need at least 2 buckets, got $nB")
    // NULL ordering guard: a null v would silently land in bucket 0
    // (size(filter(...)) over a null comparison is 0), which fronts the
    // global order regardless of asc/desc — the opposite of Spark's
    // desc = NULLS LAST — and an all-null frame would return null
    // quantile bounds and drop every row at the offset join. No call
    // site orders by a nullable key; fail loudly if one ever does.
    val vd = when(v.isNull, raise_error(lit(
        "Scan.withQuantileBucket: null ordering key — the quantile " +
        "bucketing has no null placement; filter or coalesce first")))
      .otherwise(v).cast("double")
    val probs = array((1 until nB).map(i => lit(i.toDouble / nB)): _*)
    // accuracy 1000 ⇒ boundary mass error ≤ 0.1% — bucket sizes stay
    // balanced within a few percent, and the boundaries only steer row
    // placement (every downstream running value is exact regardless).
    // The boundaries COLLECT TO THE DRIVER (nB-1 doubles — the k-means
    // centroid pattern; this call is therefore EAGER) and inline as
    // literals, for two measured reasons at sf0.1 (600 k rows):
    //   1. the previous array-HOF form (`size(filter(bounds, ...))`)
    //      interprets its lambda per element — rows × (nB-1) closure
    //      calls outside codegen; the unrolled literal comparisons
    //      stay inside whole-stage codegen;
    //   2. prefixSums evaluates the bucketed frame in TWO branches
    //      (local windows + totals) and Catalyst shares neither the
    //      bounds aggregate nor the bucket expression across them —
    //      driver-side bounds make the recompute 63 codegen'd
    //      comparisons instead of a second percentile pass.
    // memo key: the CANONICALIZED analyzed plan (ExprIds normalized, so
    // two separately-built copies of the same query share one entry)
    // plus the ordering expression and bucket count; desc does not
    // affect the boundary VALUES, only the assignment direction.
    val bs: Seq[Double] = boundsMemo.getOrCompute(
        (df.queryExecution.analyzed.canonicalized, v.toString, nB)) {
      val row = df.agg(
        percentile_approx(vd, probs, lit(1000)).as("__scan_bounds")).head()
      if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
    }
    // bucket = #boundaries strictly on the ALREADY-ORDERED side of v:
    // asc → |{b : v > b}| (non-decreasing in v), desc → |{b : v < b}|
    // (non-decreasing as v falls). Empty input ⇒ no bounds ⇒ bucket 0.
    // Deliberately an array HOF over the literal bounds, NOT nB-1
    // unrolled comparisons: the unrolled form generates a 63-term
    // codegen source whose Janino compilation takes ~30 s (measured)
    // on first execution of every composed plan; the HOF's interpreted
    // lambda costs ~1 s per 600 k rows and compiles instantly.
    val b =
      if (bs.isEmpty) lit(0)
      else size(filter(lit(bs.toArray),
        x => if (desc) vd < x else vd > x))
    df.withColumn(BucketCol, b)
  }

  /** Running sums over the global ([[BucketCol]] asc, `order`) ordering.
    * `outs` = (outName, value expression) pairs; all outs share ONE
    * per-bucket WindowExec pass. Returns `df`'s columns + the outs.
    * `df` must already carry [[BucketCol]] (see [[withQuantileBucket]]).
    */
  /** A single-partition [[Window]] spec for a DELIBERATELY-BOUNDED
    * frame (an aggregated ≤|lang·source| / |zones| / nB-row table —
    * never corpus-sized; SCALE.md's bounded-window rule). Semantically
    * identical to `Window.partitionBy(lit(1))` / an empty spec, but
    * those two make WindowExec log the generic "No Partition Defined"
    * scale-killer WARN on every run (Spark 4's
    * EliminateWindowPartitions folds literal keys back to the empty
    * spec), which is indistinguishable in sweep logs from a genuine
    * data-sized global window. `pmod(hash(anchor), 1)` is 0 for EVERY
    * row (hash never returns null, even for null input), yet carries
    * an attribute, so it survives optimization and the log stays
    * clean — and a plan audit can still tell these windows apart from
    * real per-key ones (the spec is a pmod/`_w`-projected constant,
    * not a data attribute).
    *
    * `anchor`: any column of the frame (value irrelevant).
    */
  def onePartition(anchor: Column)
      : org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(pmod(hash(anchor), lit(1)))

  def prefixSums(df: DataFrame, order: Seq[Column],
      outs: Seq[(String, Column)]): DataFrame = {
    val wLocal = Window.partitionBy(col(BucketCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = outs.foldLeft(df) { case (acc, (nm, v)) =>
      acc.withColumn(nm, sum(v).over(wLocal))
    }
    val aggs = outs.map { case (nm, v) => sum(v).as(tCol(nm)) }
    val totals = df.groupBy(col(BucketCol)).agg(aggs.head, aggs.tail: _*)
    // the bounded global window: ≤ nB+1 rows, running total of the rows
    // BEFORE each bucket (unbounded-preceding .. -1; first bucket null).
    // Partitioned by a CONSTANT key, not left with an empty partition
    // spec: the result is identical (one partition holding all ≤ nB+1
    // rows either way), but an empty spec makes WindowExec log the
    // generic "No Partition Defined" scale-killer WARN on every run —
    // indistinguishable in sweep logs from a genuine data-sized global
    // window. The input here is the grouped totals frame (one row per
    // bucket), so the single partition is bounded BY CONSTRUCTION.
    // The constant key comes from [[onePartition]] (see there for why
    // a plain literal would fold back to the empty spec and re-emit
    // the WARN).
    val wOff = onePartition(col(BucketCol)).orderBy(col(BucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col(BucketCol) +: outs.map { case (nm, _) =>
        sum(col(tCol(nm))).over(wOff).as(oCol(nm))
      }: _*)
    val orig = df.columns.filterNot(_ == BucketCol)
    local.join(broadcast(offsets), Seq(BucketCol))
      .select(orig.map(col) ++ outs.map { case (nm, _) =>
        (col(nm) + coalesce(col(oCol(nm)), lit(0))).as(nm)
      }: _*)
  }

  /** [[withQuantileBucket]] + [[prefixSums]] in one call: running sums
    * over the (`v` asc|desc, then `order` tiebreaks) global ordering.
    * `order` must be the FULL sort (including `v` first) — the bucket
    * column only coarsens it.
    */
  def runningOver(df: DataFrame, v: Column, desc: Boolean,
      order: Seq[Column], outs: Seq[(String, Column)],
      nB: Int = 64): DataFrame =
    prefixSums(withQuantileBucket(df, v, desc, nB), order, outs)

  /** Exact long integer division for NON-NEGATIVE long operands
    * (divisor > 0): Catalyst's IntegralDivide (the SQL `div`
    * function) — exact 64-bit integer division past the 2^53 bound
    * where the subtract-remainder double-division idiom starts
    * rounding. Precondition: `a >= 0`. IntegralDivide truncates
    * toward ZERO, so for a negative dividend it differs from floor
    * division (-7 div 2 = -3, floor = -4); every call site here
    * (ntile ranks, cumulative cents) is non-negative by construction.
    */
  private def idiv(a: Column, b: Column): Column =
    call_function("div", a, b).cast(LongType)

  /** SQL `ntile(n)` computed from a global 1-based rank and the total
    * row count — the distributed-rank replacement for a global ntile
    * window: the first `total % n` tiles hold `⌈total/n⌉` rows, the
    * rest `⌊total/n⌋` (identical to Spark's and DuckDB's NTILE). When
    * `total < n` every row is its own tile and the (division-by-zero)
    * else branch is provably unreachable — CaseWhen evaluates lazily.
    */
  def ntileOf(rnk: Column, n: Int, total: Column): Column = {
    val q = idiv(total, lit(n))
    val rem = total % n
    val threshold = rem * (q + 1)
    when(rnk <= threshold, idiv(rnk - 1, q + 1) + 1)
      .otherwise(rem + idiv(rnk - threshold - 1, q) + 1)
      .cast(LongType)
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable DDSKETCH (relative-error quantile summary) — the fourth
  * corner of the mergeable-summary suite (SURVEY.md §2.7): HLL answers
  * distinct counts, CMS point frequencies, Misra-Gries frequent items,
  * and DDSketch answers QUANTILES with a RELATIVE-error guarantee
  * (Masson, Rim, Lee, "DDSketch", VLDB 2019): the estimate for the
  * rank-q value x_q satisfies |est − x_q| ≤ α·x_q — uniform relative
  * accuracy across magnitudes, where a fixed-width histogram's error
  * explodes on the small quantiles and a GK sketch bounds RANK, not
  * value.
  *
  * Positive values land in log-γ buckets (γ = (1+α)/(1−α), bucket
  * ceil(ln x / ln γ)); each bucket's midpoint 2γ^i/(γ+1) is within α
  * of every value it covers. Buckets are a sparse sorted (index,
  * count) pair of arrays: counts merge by keywise ADDITION, so the
  * sketch is merge-order independent — bit-identical partials at any
  * parallelism, the property every oracle compare here leans on.
  * Non-positive values (none in the driven column; the guard costs
  * nothing) collapse into a zero bucket reported as 0.0.
  *
  * The JVM float ops (ln, pow) make bucket BOUNDARIES
  * platform-consistent within the Spark job; the oracle never
  * recomputes them — it checks exact quantiles and the guarantee
  * booleans, which hold for any consistent boundary set.
  */
object DDSketch {
  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)
  private val LnGamma = math.log(Gamma)

  def bucketOf(x: Double): Int = math.ceil(math.log(x) / LnGamma).toInt
  def midpoint(idx: Int): Double = 2.0 * math.pow(Gamma, idx) / (Gamma + 1)

  /** Value estimate at rank ceil(q·n) (1-based, ascending). */
  def quantile(b: DdBuf, q: Double): Double = {
    val n = b.nZero + b.counts.sum
    if (n == 0) return 0.0
    val target = math.max(1L, math.ceil(q * n).toLong)
    if (target <= b.nZero) return 0.0
    var cum = b.nZero
    var i = 0
    while (i < b.counts.length) {
      cum += b.counts(i)
      if (cum >= target) return midpoint(b.idx(i))
      i += 1
    }
    midpoint(b.idx(b.idx.length - 1))
  }
}

/** Sparse log-bucket store: `idx` strictly ascending, parallel counts;
  * `nZero` holds the non-positive values.
  */
case class DdBuf(idx: Array[Int], counts: Array[Long], nZero: Long)

/** Finished readout: estimates at the three operating quantiles. */
case class DdQuantiles(p50: Double, p90: Double, p99: Double, n: Long)

object DDSketchAgg extends Aggregator[Double, DdBuf, DdQuantiles] {
  import DDSketch._

  override def zero: DdBuf =
    DdBuf(Array.emptyIntArray, Array.emptyLongArray, 0L)

  override def reduce(b: DdBuf, x: Double): DdBuf = {
    if (!(x > 0.0)) return b.copy(nZero = b.nZero + 1)
    val k = bucketOf(x)
    val pos = java.util.Arrays.binarySearch(b.idx, k)
    if (pos >= 0) { b.counts(pos) += 1L; b }
    else {
      // new bucket: rare after warmup (bucket count is bounded by the
      // value range, ~log(max/min)/α buckets), so the O(k) insert
      // amortizes away; the per-row path above is a binary search.
      val at = -pos - 1
      val ni = new Array[Int](b.idx.length + 1)
      val nc = new Array[Long](b.counts.length + 1)
      System.arraycopy(b.idx, 0, ni, 0, at)
      System.arraycopy(b.counts, 0, nc, 0, at)
      ni(at) = k; nc(at) = 1L
      System.arraycopy(b.idx, at, ni, at + 1, b.idx.length - at)
      System.arraycopy(b.counts, at, nc, at + 1, b.counts.length - at)
      DdBuf(ni, nc, b.nZero)
    }
  }

  override def merge(a: DdBuf, b: DdBuf): DdBuf = {
    if (b.idx.isEmpty) return a.copy(nZero = a.nZero + b.nZero)
    if (a.idx.isEmpty) return b.copy(nZero = a.nZero + b.nZero)
    val ni = new Array[Int](a.idx.length + b.idx.length)
    val nc = new Array[Long](ni.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.idx.length || j < b.idx.length) {
      if (j >= b.idx.length || (i < a.idx.length && a.idx(i) < b.idx(j))) {
        ni(o) = a.idx(i); nc(o) = a.counts(i); i += 1
      } else if (i >= a.idx.length || b.idx(j) < a.idx(i)) {
        ni(o) = b.idx(j); nc(o) = b.counts(j); j += 1
      } else {
        ni(o) = a.idx(i); nc(o) = a.counts(i) + b.counts(j); i += 1; j += 1
      }
      o += 1
    }
    DdBuf(ni.take(o), nc.take(o), a.nZero + b.nZero)
  }

  override def finish(b: DdBuf): DdQuantiles =
    DdQuantiles(quantile(b, 0.5), quantile(b, 0.9), quantile(b, 0.99),
      b.nZero + b.counts.sum)

  override def bufferEncoder: Encoder[DdBuf] = Encoders.product[DdBuf]
  override def outputEncoder: Encoder[DdQuantiles] =
    Encoders.product[DdQuantiles]
}

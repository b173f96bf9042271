package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DdBuf, DDSketch, DDSketchAgg}

/** Pure-JVM properties of the DDSketch Aggregator: the relative-error
  * guarantee on every quantile, merge-tree independence (bit-identical
  * buckets under any split), and the zero/negative guard.
  */
class DDSketchSpec extends AnyFunSuite {

  // log-uniform-ish values spanning 4 decades plus heavy repetition —
  // the latency-shaped distribution DDSketch exists for
  private val data: Seq[Double] =
    (1 to 4000).map(i => math.exp((i % 997).toDouble / 997.0 * 9.2) + 0.5)

  private def build(xs: Seq[Double]): DdBuf =
    xs.foldLeft(DDSketchAgg.zero)(DDSketchAgg.reduce)

  private def exactAt(q: Double): Double = {
    val sorted = data.sorted
    sorted((math.ceil(q * sorted.size).toLong.toInt - 1).max(0))
  }

  test("relative error <= alpha at every probed quantile") {
    val sk = build(data)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)) {
      val est = DDSketch.quantile(sk, q)
      val exact = exactAt(q)
      assert(math.abs(est - exact) <= DDSketch.Alpha * exact + 1e-9,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("merge is order-independent: any split tree = one pass, bit-exact") {
    val onePass = build(data)
    for (chunk <- Seq(61, 500, 3999)) {
      val parts = data.grouped(chunk).map(build).toSeq
      val leftFold = parts.reduceLeft((a, b) => DDSketchAgg.merge(copy(a), copy(b)))
      val rightFold = parts.reverse
        .reduceLeft((a, b) => DDSketchAgg.merge(copy(a), copy(b)))
      for (m <- Seq(leftFold, rightFold)) {
        assert(m.idx.toSeq === onePass.idx.toSeq)
        assert(m.counts.toSeq === onePass.counts.toSeq)
        assert(m.nZero === onePass.nZero)
      }
    }
  }

  test("non-positive values park in the zero bucket, not a log bucket") {
    val sk = build(Seq(-3.0, 0.0, 5.0, 5.0))
    assert(sk.nZero === 2L)
    assert(sk.counts.sum === 2L)
    // rank 1..2 of 4 are the zero bucket
    assert(DDSketch.quantile(sk, 0.25) === 0.0)
    assert(math.abs(DDSketch.quantile(sk, 0.99) - 5.0) <= 0.05)
  }

  test("finish reports n and the three operating quantiles") {
    val f = DDSketchAgg.finish(build(data))
    assert(f.n === data.size.toLong)
    assert(f.p50 > 0 && f.p50 <= f.p90 && f.p90 <= f.p99)
  }

  /** merge may mutate shared state; copy so partials can be reused. */
  private def copy(b: DdBuf) =
    DdBuf(b.idx.clone(), b.counts.clone(), b.nZero)
}

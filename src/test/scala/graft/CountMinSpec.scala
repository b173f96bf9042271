package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CountMin, CountMinAgg}

/** Pure-JVM properties of the Count-Min Aggregator: the sketch
  * guarantees (no undercount, bounded overcount) and merge-tree
  * independence (the property that makes partial aggregation correct at
  * any parallelism).
  */
class CountMinSpec extends AnyFunSuite {

  // skewed multiset: key k appears ~97-k times — heavy and light keys
  private val data: Seq[Long] =
    (1L to 96L).flatMap(k => Seq.fill((97 - k).toInt)(k))

  private val exact: Map[Long, Long] =
    data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def build(xs: Seq[Long]) =
    xs.foldLeft(CountMinAgg.zero)(CountMinAgg.reduce)

  private def estimate(cells: Array[Long], v: Long): Long =
    (0 until CountMin.Depth).map(r =>
      cells(r * CountMin.Width + CountMin.slot(r, v))).min

  test("never undercounts; overcount bounded by 3eN/w") {
    val sk = build(data)
    val margin = 9L * data.size / CountMin.Width
    exact.foreach { case (k, n) =>
      val e = estimate(sk.cells, k)
      assert(e >= n, s"undercount for $k")
      assert(e <= n + margin, s"overcount for $k: $e vs $n + $margin")
    }
  }

  test("negative keys hash into valid cells of their own row") {
    val neg = Seq(-5L, -5L, -999999999999L, 7L)
    for (r <- 0 until CountMin.Depth; v <- neg) {
      val s = CountMin.slot(r, v)
      assert(s >= 0 && s < CountMin.Width, s"slot($r,$v)=$s")
    }
    val sk = build(neg)
    assert(estimate(sk.cells, -5L) >= 2L)
    assert(estimate(sk.cells, -999999999999L) >= 1L)
  }

  test("merge is associative/commutative: any split tree = one pass") {
    val chunks = data.grouped(700).map(build).toSeq
    val leftFold = chunks.reduceLeft((a, b) =>
      CountMinAgg.merge(CmsCopy(a), CmsCopy(b)))
    val rightFold = chunks.reverse.reduceLeft((a, b) =>
      CountMinAgg.merge(CmsCopy(a), CmsCopy(b)))
    val onePass = build(data)
    assert(leftFold.cells.toSeq === onePass.cells.toSeq)
    assert(rightFold.cells.toSeq === onePass.cells.toSeq)
  }

  /** merge mutates its left arg; copy so chunks can be reused. */
  private def CmsCopy(b: graft.functions.CmsBuf) =
    graft.functions.CmsBuf(b.cells.clone())
}

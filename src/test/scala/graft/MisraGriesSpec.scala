package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MgBuf, MisraGriesAgg, MisraGriesWeightedAgg}

/** Pure-JVM properties of the Misra-Gries Aggregator: the two-sided
  * guarantee (never an overcount, undercount ≤ (N−S)/(k+1)) under
  * arbitrary merge trees, and exactness + merge-tree independence when
  * the key universe fits in k counters — the property the
  * `agg_heavy_hitters` oracle hash-relies on.
  */
class MisraGriesSpec extends AnyFunSuite {

  // skewed multiset: key k appears ~97-k times — heavy and light keys
  private val data: Seq[Long] =
    (1L to 96L).flatMap(k => Seq.fill((97 - k).toInt)(k))

  private val exact: Map[Long, Long] =
    data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def build(agg: MisraGriesAgg, xs: Seq[Long]): MgBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def est(b: MgBuf, v: Long): Long = {
    val i = b.keys.indexOf(v)
    if (i < 0) 0L else b.counts(i)
  }

  private def mass(b: MgBuf): Long = b.counts.sum

  private def checkGuarantees(b: MgBuf, k: Int, n: Long): Unit = {
    assert(b.keys.length <= k)
    val bound = n - mass(b) // (k+1)·allowed undercount
    exact.foreach { case (key, true_n) =>
      val e = est(b, key)
      assert(e <= true_n, s"overcount for $key: $e > $true_n")
      assert((true_n - e) * (k + 1) <= bound,
        s"undercount bound broken for $key: $true_n - $e vs $bound/${k + 1}")
    }
  }

  test("k=8 stressed regime: two-sided guarantee holds, one pass") {
    val agg = new MisraGriesAgg(8)
    checkGuarantees(build(agg, data), 8, data.size.toLong)
  }

  test("k=8 stressed regime: guarantee holds for every merge tree tried") {
    val agg = new MisraGriesAgg(8)
    for (chunk <- Seq(37, 256, 991)) {
      val parts = data.grouped(chunk).map(build(agg, _)).toSeq
      val leftFold = parts.reduceLeft((a, b) => agg.merge(copy(a), copy(b)))
      val rightFold = parts.reverse
        .reduceLeft((a, b) => agg.merge(copy(a), copy(b)))
      checkGuarantees(leftFold, 8, data.size.toLong)
      checkGuarantees(rightFold, 8, data.size.toLong)
    }
  }

  test("k >= distinct: exact and identical under any merge tree") {
    val agg = new MisraGriesAgg(128) // 96 distinct keys fit
    val onePass = agg.finish(build(agg, data))
    for (chunk <- Seq(37, 991)) {
      val parts = data.grouped(chunk).map(build(agg, _)).toSeq
      val merged = agg.finish(
        parts.reduceLeft((a, b) => agg.merge(copy(a), copy(b))))
      assert(merged.keys.toSeq === onePass.keys.toSeq)
      assert(merged.counts.toSeq === onePass.counts.toSeq)
    }
    exact.foreach { case (key, n) => assert(est(onePass, key) === n) }
  }

  test("merge pivot evicts down to <= k and sheds ties with the pivot") {
    val agg = new MisraGriesAgg(2)
    // two full buffers with disjoint keys force the pivot subtraction
    val a = MgBuf(Array(1L, 2L), Array(10L, 4L), 0L)
    val b = MgBuf(Array(3L, 4L), Array(4L, 2L), 0L)
    val m = agg.merge(a, b)
    // counts 10,4,4,2 → pivot = 3rd largest = 4 → keep 1→6 only (ties
    // at the pivot drop to 0)
    assert(m.keys.toSeq === Seq(1L))
    assert(m.counts.toSeq === Seq(6L))
    // and the pivot subtraction is a recorded spill event
    assert(m.spills === 1L)
  }

  test("finish emits canonical key order") {
    val agg = new MisraGriesAgg(8)
    val f = agg.finish(MgBuf(Array(5L, 1L, 3L), Array(2L, 7L, 4L), 0L))
    assert(f.keys.toSeq === Seq(1L, 3L, 5L))
    assert(f.counts.toSeq === Seq(7L, 4L, 2L))
  }

  // ---- weighted aggregator (round 10) --------------------------------

  private def buildW(agg: MisraGriesWeightedAgg,
      xs: Seq[(Long, Long)]): MgBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("weighted exact regime == unweighted on the expanded stream") {
    // folding per-key (key, total) pairs through the weighted path must
    // equal folding each raw occurrence — the reshape's correctness
    // claim for the pre-aggregated plan
    val aggU = new MisraGriesAgg(128)
    val aggW = new MisraGriesWeightedAgg(128)
    val weighted = exact.toSeq.sortBy(_._1)
    val u = aggU.finish(build(aggU, data))
    val w = aggW.finish(buildW(aggW, weighted))
    assert(w.keys.toSeq === u.keys.toSeq)
    assert(w.counts.toSeq === u.counts.toSeq)
    assert(w.spills === 0L)
  }

  test("weighted stressed regime: two-sided guarantee for every merge tree") {
    val agg = new MisraGriesWeightedAgg(8)
    val weighted = exact.toSeq.sortBy(_._1)
    checkGuarantees(buildW(agg, weighted), 8, data.size.toLong)
    for (chunk <- Seq(3, 17, 41)) {
      val parts = weighted.grouped(chunk).map(buildW(agg, _)).toSeq
      val leftFold = parts.reduceLeft((a, b) => agg.merge(copy(a), copy(b)))
      val rightFold = parts.reverse
        .reduceLeft((a, b) => agg.merge(copy(a), copy(b)))
      checkGuarantees(leftFold, 8, data.size.toLong)
      checkGuarantees(rightFold, 8, data.size.toLong)
      // stressed (96 distinct > 8): every merge tree records spills
      assert(leftFold.spills > 0L)
      assert(rightFold.spills > 0L)
    }
  }

  test("spills == 0 iff the key universe fits k, under every tree tried") {
    // the regime self-report the stream_heavy_hitters contract reads:
    // deterministically distinct <= k, whatever the merge order
    val weighted = exact.toSeq.sortBy(_._1)
    for ((k, fits) <- Seq(128 -> true, 96 -> true, 8 -> false);
         chunk <- Seq(5, 37)) {
      val agg = new MisraGriesWeightedAgg(k)
      val parts = weighted.grouped(chunk).map(buildW(agg, _)).toSeq
      val m = parts.reduceLeft((a, b) => agg.merge(copy(a), copy(b)))
      assert((m.spills == 0L) === fits, s"k=$k chunk=$chunk")
    }
  }

  test("weighted singleton overflow matches the PODS'12 merge closed form") {
    val agg = new MisraGriesWeightedAgg(2)
    val full = MgBuf(Array(1L, 2L), Array(10L, 4L), 0L)
    // new key, weight 6: pivot = min(10, 4, 6) = 4 → keys 1→6, 3→2
    val m = agg.reduce(MgBuf(full.keys.clone(), full.counts.clone(), 0L),
      (3L, 6L))
    assert(m.keys.toSeq === Seq(1L, 3L))
    assert(m.counts.toSeq === Seq(6L, 2L))
    assert(m.spills === 1L)
    // new key, weight 2 (≤ min counts): pivot = 2 → incoming dies
    val m2 = agg.reduce(MgBuf(full.keys.clone(), full.counts.clone(), 0L),
      (3L, 2L))
    assert(m2.keys.toSeq === Seq(1L, 2L))
    assert(m2.counts.toSeq === Seq(8L, 2L))
    assert(m2.spills === 1L)
  }

  /** merge may mutate shared state; copy so partials can be reused. */
  private def copy(b: MgBuf) = MgBuf(b.keys.clone(), b.counts.clone(),
    b.spills)
}

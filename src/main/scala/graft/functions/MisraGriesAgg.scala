package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable MISRA-GRIES heavy-hitter summary over a long key column
  * (SURVEY.md §2.7 custom-Aggregator tier) — the deterministic
  * counter-based dual of the Count-Min sketch ([[CountMinAgg]]): k
  * counters, O(k) memory per partial, and for every key the estimate
  * NEVER exceeds the true count and undercounts by at most
  * (N − S) / (k + 1), where N is the stream length and S the surviving
  * counter mass (Misra & Gries 1982; merge rule and bound per Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS'12).
  *
  * Two regimes matter for verification:
  *   - EXACT regime: while the merged key universe fits in k counters,
  *     no decrement ever fires, so every partial is a plain per-key sum
  *     and the result is bit-identical under ANY merge tree — the
  *     estimates themselves hash-compare against an exact-SQL oracle.
  *   - STRESSED regime (distinct > k): which keys survive depends on
  *     the merge order, but the two-sided guarantee
  *     (est ≤ true ∧ true − est ≤ (N − S)/(k+1)) holds for every merge
  *     tree, so guarantee booleans are deterministic and oracle-safe.
  *
  * Buffer layout is two parallel variable-length arrays (product-encoder
  * friendly, like [[CmsBuf]]); reduce is an O(k) linear probe — at
  * k ≤ 64 that is a few cache lines, far cheaper than a hash map's
  * boxing inside a tight Aggregator loop.
  */
case class MgBuf(keys: Array[Long], counts: Array[Long])

object MisraGries {

  /** Point-estimate Column for key `v` against a finished sketch's
    * `keys`/`counts` array columns: 0 when the key holds no counter
    * (array_position is 1-based and 0 = absent).
    */
  def estimateCol(keys: Column, counts: Column, v: Column): Column = {
    val pos = array_position(keys, v)
    when(pos > 0, element_at(counts, pos.cast("int"))).otherwise(lit(0L))
      .cast(LongType)
  }

  /** Surviving counter mass S = Σ counts — the bound's tightener. */
  def massCol(counts: Column): Column =
    coalesce(aggregate(counts, lit(0L), (acc, c) => acc + c), lit(0L))
}

class MisraGriesAgg(k: Int) extends Aggregator[Long, MgBuf, MgBuf] {
  require(k > 0, s"MisraGriesAgg: k must be positive, got $k")

  override def zero: MgBuf = MgBuf(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: MgBuf, v: Long): MgBuf = {
    // keys are maintained SORTED through every path (sorted insert
    // here; merge and compact preserve order), so the per-row probe is
    // a binary search. Round 9: the previous linear probe was "a few
    // cache lines" at the k=64 sketch-demo scale, but the k=16384
    // exact-regime budget made it O(k) PER ROW — the sf1 sweep
    // measured stream_heavy_hitters at ~6.5e9 probe steps (10.9 s);
    // log2(k)=14 steps leaves the scan dominated by the scan itself.
    // Sorted slots are also the exact-regime canonical order that
    // merge/finish already emit.
    val pos = java.util.Arrays.binarySearch(b.keys, v)
    if (pos >= 0) { b.counts(pos) += 1L; return b }
    if (b.keys.length < k) {
      val ins = -pos - 1
      val n = b.keys.length
      val ks = new Array[Long](n + 1); val cs = new Array[Long](n + 1)
      System.arraycopy(b.keys, 0, ks, 0, ins)
      System.arraycopy(b.counts, 0, cs, 0, ins)
      ks(ins) = v; cs(ins) = 1L
      System.arraycopy(b.keys, ins, ks, ins + 1, n - ins)
      System.arraycopy(b.counts, ins, cs, ins + 1, n - ins)
      MgBuf(ks, cs)
    } else {
      // all k counters held by other keys: decrement everyone (the
      // incoming item cancels against one unit of each counter), drop
      // zeros — the classical MG step; total decrement ≤ (N−S)/(k+1)
      // because each step retires k+1 units of stream mass.
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1L; j += 1 }
      compact(b)
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (b.keys.isEmpty) return a
    if (a.keys.isEmpty) return b
    // keywise sum of the two counter sets...
    val m = collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < a.keys.length) { m(a.keys(i)) = a.counts(i); i += 1 }
    i = 0
    while (i < b.keys.length) {
      m(b.keys(i)) = m.getOrElse(b.keys(i), 0L) + b.counts(i); i += 1
    }
    if (m.size <= k) {
      val ks = m.keys.toArray.sorted // canonical slot order
      MgBuf(ks, ks.map(m))
    } else {
      // ...then subtract the (k+1)-th largest count from every counter
      // and keep the positive ones: ≤ k survive (everything tied with
      // the pivot goes to ≤ 0), and the subtracted mass per key is
      // exactly the PODS'12 offset that preserves the MG bound.
      val pivot = m.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val kept = m.iterator.map { case (key, c) => (key, c - pivot) }
        .filter(_._2 > 0L).toArray.sortBy(_._1)
      MgBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(b: MgBuf): MgBuf = {
    // canonical key order so the exact-regime output is one stable
    // rendering regardless of arrival order.
    val idx = b.keys.indices.sortBy(b.keys)
    MgBuf(idx.map(b.keys).toArray, idx.map(b.counts).toArray)
  }

  private def compact(b: MgBuf): MgBuf = {
    var n = 0
    var i = 0
    while (i < b.counts.length) { if (b.counts(i) > 0L) n += 1; i += 1 }
    if (n == b.counts.length) return b
    val ks = new Array[Long](n); val cs = new Array[Long](n)
    var o = 0; i = 0
    while (i < b.counts.length) {
      if (b.counts(i) > 0L) { ks(o) = b.keys(i); cs(o) = b.counts(i); o += 1 }
      i += 1
    }
    MgBuf(ks, cs)
  }

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}

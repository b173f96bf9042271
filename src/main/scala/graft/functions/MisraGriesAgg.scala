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
  * (N − S) / (k + 1), where N is the stream length (total weight) and
  * S the surviving counter mass (Misra & Gries 1982; merge rule and
  * bound per Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * Summaries", PODS'12).
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
  * REGIME SELF-REPORTING (round 10): `spills` counts decrement events
  * (reduce-overflow steps and merge pivot subtractions). Its VALUE is
  * merge-order-dependent in the stressed regime, but `spills == 0` is
  * a DETERMINISTIC boolean — distinct ≤ k never spills under any tree,
  * distinct > k always does (keys only leave via a spill, so the first
  * overflow is unavoidable) — letting a consumer read regime exit off
  * the artifact itself instead of discovering it as a correctness
  * failure at the next scale-up (the k-escalation class fired in
  * rounds 7 and 9; round 10 retired it — see [[MisraGriesWeightedAgg]]).
  *
  * Buffer layout is two parallel variable-length arrays (product-encoder
  * friendly, like [[CmsBuf]]); keys stay SORTED through every path, so
  * the per-row probe is a binary search.
  */
case class MgBuf(keys: Array[Long], counts: Array[Long], spills: Long)

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

  private[functions] val emptyBuf =
    MgBuf(Array.emptyLongArray, Array.emptyLongArray, 0L)

  /** Sorted insert of (v, c) into a buffer known to have space and not
    * hold v; `ins` is the binarySearch insertion point.
    */
  private[functions] def insertAt(b: MgBuf, ins: Int, v: Long,
      c: Long): MgBuf = {
    val n = b.keys.length
    val ks = new Array[Long](n + 1); val cs = new Array[Long](n + 1)
    System.arraycopy(b.keys, 0, ks, 0, ins)
    System.arraycopy(b.counts, 0, cs, 0, ins)
    ks(ins) = v; cs(ins) = c
    System.arraycopy(b.keys, ins, ks, ins + 1, n - ins)
    System.arraycopy(b.counts, ins, cs, ins + 1, n - ins)
    MgBuf(ks, cs, b.spills)
  }

  /** The PODS'12 k-bounded merge of two counter sets: keywise sum; if
    * more than k keys survive, subtract the (k+1)-th largest count from
    * every counter and keep the positive ones (≤ k survive — everything
    * tied with the pivot goes to ≤ 0). The subtracted mass per key is
    * exactly the offset that preserves the two-sided MG bound. Spill
    * counts add; a pivot subtraction is one more spill event.
    */
  private[functions] def mergeBufs(a: MgBuf, b: MgBuf, k: Int): MgBuf = {
    if (b.keys.isEmpty && b.spills == 0L) return a
    if (a.keys.isEmpty && a.spills == 0L) return b
    val m = collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < a.keys.length) { m(a.keys(i)) = a.counts(i); i += 1 }
    i = 0
    while (i < b.keys.length) {
      m(b.keys(i)) = m.getOrElse(b.keys(i), 0L) + b.counts(i); i += 1
    }
    val spills = a.spills + b.spills
    if (m.size <= k) {
      val ks = m.keys.toArray.sorted // canonical slot order
      MgBuf(ks, ks.map(m), spills)
    } else {
      val pivot = m.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val kept = m.iterator.map { case (key, c) => (key, c - pivot) }
        .filter(_._2 > 0L).toArray.sortBy(_._1)
      MgBuf(kept.map(_._1), kept.map(_._2), spills + 1L)
    }
  }

  private[functions] def finishBuf(b: MgBuf): MgBuf = {
    // canonical key order so the exact-regime output is one stable
    // rendering regardless of arrival order.
    val idx = b.keys.indices.sortBy(b.keys)
    MgBuf(idx.map(b.keys).toArray, idx.map(b.counts).toArray, b.spills)
  }

  private[functions] def compact(b: MgBuf): MgBuf = {
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
    MgBuf(ks, cs, b.spills)
  }
}

class MisraGriesAgg(k: Int) extends Aggregator[Long, MgBuf, MgBuf] {
  require(k > 0, s"MisraGriesAgg: k must be positive, got $k")

  override def zero: MgBuf = MisraGries.emptyBuf

  override def reduce(b: MgBuf, v: Long): MgBuf = {
    // keys are maintained SORTED through every path (sorted insert
    // here; merge and compact preserve order), so the per-row probe is
    // a binary search. Round 9: the previous linear probe was "a few
    // cache lines" at the k=64 sketch-demo scale, but a large exact-
    // regime budget made it O(k) PER ROW — the sf1 sweep measured
    // stream_heavy_hitters at ~6.5e9 probe steps (10.9 s) at k=16384;
    // log2(k) steps leaves the scan dominated by the scan itself.
    // Sorted slots are also the exact-regime canonical order that
    // merge/finish already emit.
    val pos = java.util.Arrays.binarySearch(b.keys, v)
    if (pos >= 0) { b.counts(pos) += 1L; return b }
    if (b.keys.length < k) MisraGries.insertAt(b, -pos - 1, v, 1L)
    else {
      // all k counters held by other keys: decrement everyone (the
      // incoming item cancels against one unit of each counter), drop
      // zeros — the classical MG step; total decrement ≤ (N−S)/(k+1)
      // because each step retires k+1 units of stream mass.
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1L; j += 1 }
      val c = MisraGries.compact(b)
      MgBuf(c.keys, c.counts, c.spills + 1L)
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf =
    MisraGries.mergeBufs(a, b, k)

  override def finish(b: MgBuf): MgBuf = MisraGries.finishBuf(b)

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}

/** WEIGHTED Misra-Gries over (key, weight) rows — the aggregator the
  * round-10 `stream_heavy_hitters` reshape runs AFTER a per-(day, user)
  * pre-aggregation: the keyed pre-agg bounds the sketch's insert volume
  * to the number of DISTINCT keys (map-side combine collapses the raw
  * event mass before any sketch sees it), and the sketch folds each
  * distinct key ONCE with its total count as the weight. This retires
  * the k-escalation treadmill (k was chasing max distinct users/day —
  * 256→2048→16384 across three scale-ups — turning the sketch into an
  * exact counter whose per-partial cost grew with data): k is again a
  * genuine top-N budget, and a further 10× cannot break the contract
  * by construction because the verified outputs are the two-sided
  * guarantee booleans, deterministic in BOTH regimes.
  *
  * reduce(b, (v, w)) is the PODS'12 merge with the singleton {v: w}
  * (weights enter the bound as stream mass: est ≤ true and
  * true − est ≤ (N − S)/(k+1) with N the total weight); the exact-
  * regime fast paths (key present / buffer has room) stay a binary
  * search + O(k) insert, and only the genuine overflow pays the
  * singleton merge: pivot = min(min(counts), w) — the (k+1)-th largest
  * of counts ∪ {w} — subtracted from everything, survivors > 0.
  */
class MisraGriesWeightedAgg(k: Int)
    extends Aggregator[(Long, Long), MgBuf, MgBuf] {
  require(k > 0, s"MisraGriesWeightedAgg: k must be positive, got $k")

  override def zero: MgBuf = MisraGries.emptyBuf

  override def reduce(b: MgBuf, kv: (Long, Long)): MgBuf = {
    val (v, w) = kv
    require(w > 0, s"MisraGriesWeightedAgg: weight must be positive " +
      s"(key $v, weight $w) — zero/negative weights have no MG semantics")
    val pos = java.util.Arrays.binarySearch(b.keys, v)
    if (pos >= 0) { b.counts(pos) += w; return b }
    if (b.keys.length < k) MisraGries.insertAt(b, -pos - 1, v, w)
    else {
      // singleton merge: subtract the pivot min(min(counts), w) from
      // every entry of counts ∪ {w}, keep positive — at least the
      // minimum dies, so the survivor count stays ≤ k
      var mn = w
      var j = 0
      while (j < b.counts.length) {
        if (b.counts(j) < mn) mn = b.counts(j); j += 1
      }
      j = 0
      while (j < b.counts.length) { b.counts(j) -= mn; j += 1 }
      val c = MisraGries.compact(b)
      val withSpill = MgBuf(c.keys, c.counts, c.spills + 1L)
      if (w - mn > 0L) {
        val ins = java.util.Arrays.binarySearch(withSpill.keys, v)
        MisraGries.insertAt(withSpill, -ins - 1, v, w - mn)
      } else withSpill
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf =
    MisraGries.mergeBufs(a, b, k)

  override def finish(b: MgBuf): MgBuf = MisraGries.finishBuf(b)

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}

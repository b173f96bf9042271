package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every query in [[SparkEntry.queries]] against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Timing forces FULL evaluation of the physical plan
  * (`queryExecution.toRdd` + a count over the produced InternalRows):
  * a plain `df.count()` would let Catalyst prune every computed column
  * and drop the sorts, under-measuring the real operator cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // untimed warmup: file-index + parquet footers + first codegen, so
    // the alphabetically-first query doesn't absorb session startup.
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.t(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () }
    }
    // best-of-2 per query (steady-state time, robust to one-off JIT/GC
    // pauses), plus a third run when the two disagree >3x — this host
    // shows CPU-steal windows that can stall both consecutive runs.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
        if (times.size == 2 && times.max / times.min > 3.0)
          times ++ once() else times
      // a query with no successful run reports -1, not a fast-fail time
      name -> (if (all.isEmpty) -1.0 else all.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

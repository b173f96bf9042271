package graft.tools

/** Ad-hoc single-query timing (not part of the driver contract):
  * `runMain graft.tools.Scratch q1 q2 ...` times each named query from
  * [[graft.SparkEntry.queries]] at sf0.1 (override via
  * SPARK_GRAFT_SF_DIR), twice each, same forced evaluation as Bench.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.t(spark, sf, n).limit(1).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(f"$name%-28s UNKNOWN QUERY")
        case Some(fn) =>
          (1 to 2).foreach { run =>
            val t0 = System.nanoTime()
            val n = fn(spark, sf).queryExecution.toRdd.count()
            println(f"$name%-28s run$run ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
          }
      }
    }
    spark.stop()
  }
}

package graft.tools

/** Scale diagnostic: build each shared memoized artifact one at a time
  * with wall timing, so an at-scale OOM names its artifact instead of
  * dying inside Bench's silent warmup loop. Not a driver query.
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("testdata-gen/sf30")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try { f; println(f"[warm] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s ok") }
      catch { case e: Throwable =>
        println(f"[warm] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s FAILED: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
      }
      System.out.flush()
    }
    time("tables scan")(graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.t(spark, d, n).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    })
    time("events.sessionFrame")(graft.ops.Events.sessionFrame(spark, d))
    time("dedup.warmArtifacts")(graft.ops.Dedup.warmArtifacts(spark, d))
    time("relational.warmArtifacts")(graft.ops.Relational.warmArtifacts(spark, d))
    time("similarity.warmArtifacts")(graft.ops.Similarity.warmArtifacts(spark, d))
    spark.stop()
  }
}

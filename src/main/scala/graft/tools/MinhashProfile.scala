package graft.tools

/** Count-only candidate-volume instrument for the minhash dedup
  * family — prints [[graft.ops.Dedup.profileMinhash]]'s one JSON line
  * for each sf dir argument (the BASELINE.md regime-row evidence:
  * fixed-vocab collision mass vs the Heaps'-law regime).
  *
  * Usage: runMain graft.tools.MinhashProfile <sfDir> [<sfDir> ...]
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      println(graft.ops.Dedup.profileMinhash(spark, dir))
    }
    spark.stop()
  }
}

package graft.tools

/** Ad-hoc stage profiler for the prefix-filtered dedup whales:
  * `runMain graft.tools.DedupProfile` against SPARK_GRAFT_SF_DIR.
  * See [[graft.ops.Dedup.profileScale]].
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark =
      graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.ops.Dedup.profileScale(spark, sf)
    spark.stop()
  }
}

package graft.tools

/** Plan inspection helper (not part of the driver contract).
  * `sbt "runMain graft.tools.Explain q1_agg q5_region_revenue"` prints the
  * formatted physical plan of each named query (all queries if no args)
  * against SPARK_GRAFT_SF_DIR.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

/** Exchange-count probe (not part of the driver contract):
  * `runMain graft.tools.ExchangeCount q1 q2 ...` prints, per query, the
  * number of shuffle exchanges / broadcast exchanges / sort-merge joins
  * in `executedPlan.toString` — the same representation PlanShapeSpec
  * pins, so pin ceilings are read straight off this output.
  */
object ExchangeCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      def c(pat: String): Int = pat.r.findAllIn(p).length
      println(f"$n%-28s shuffle=${c("Exchange (?:range|hash)partitioning")}%2d single=${c("Exchange SinglePartition")}%2d bcast=${c("BroadcastExchange")}%2d smj=${c("SortMergeJoin")}%2d bnlj=${c("BroadcastNestedLoopJoin")}%2d cart=${c("CartesianProduct")}%2d")
    }
    spark.stop()
  }
}

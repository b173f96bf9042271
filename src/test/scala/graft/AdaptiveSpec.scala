package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning pins (SCALE.md): the behaviors the engine
  * leans on at 100 TB — skew-join splitting and partition coalescing —
  * demonstrated at test scale by lowering the size thresholds, with the
  * markers asserted in the FINAL adaptive plan (after execution, when
  * AQE has replaced its initial guesses with observed sizes).
  */
class AdaptiveSpec extends SparkSpec {

  private def withConfs[T](confs: Seq[(String, String)])(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // one key owns half the left side — the classic hot-key join. With
    // the skew thresholds lowered to test scale, AQE must detect the
    // oversized shuffle partition after the map stage and split it
    // (skew=true on the join, no correctness change). At 100 TB the
    // default thresholds (256 MB advisory) do this unprompted; salting
    // (`join_salted`) remains the pre-planned form for when the skew is
    // known ahead of time.
    withConfs(Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val left = spark.range(0, 200000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 2000).select(col("id").as("k"))
      val q = left.hint("merge").join(right, Seq("k"))
        .agg(count(lit(1)).as("n"))
      val n = q.collect().head.getLong(0)
      // key 0 matches 100k left rows; the 1000 odd ids < 2000 match once
      assert(n === 100000L + 1000L)
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // the inverse guard: a tiny aggregate must NOT keep one reducer per
    // configured shuffle partition — AQE merges the undersized outputs
    // (AQEShuffleRead coalesced), so task count tracks data size, not a
    // static conf. This is what makes shuffle.partitions safe to size
    // for the LARGEST stage of a 100 TB job.
    val q = graft.sources.Tables.t(spark, sf, "nation")
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    assert(q.collect().length > 0)
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead coalesced"),
      finalPlan.take(3000))
  }
}

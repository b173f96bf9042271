package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.api.OptOutEtl

class EtlApiSpec extends SparkSpec {

  private val fixture = graft.ops.Wnv.FixtureCsv

  test("process() runs extract->transform->load and reports count") {
    val out = Files.createTempDirectory("etl_out").toString + "/pts"
    val etl = new OptOutEtl(spark, fixture, "/tmp", out)
    val n = etl.process()
    // 10 fixture rows minus deterministic geocode misses
    assert(n >= 8 && n <= 10)
    val cols = spark.read.parquet(out).columns.toSeq
    assert(cols === Seq("x", "y", "Type"))
  }

  test("finalAnalysis erases candidates within 1500ft of opt-out points") {
    val out = Files.createTempDirectory("etl_out2").toString + "/pts"
    val etl = new OptOutEtl(spark, fixture, "/tmp", out)
    etl.process()
    val optOut = spark.read.parquet(out).head()
    val nearX = graft.geo.Geo.xFt(lit(optOut.getDouble(0)))
    val nearY = graft.geo.Geo.yFt(lit(optOut.getDouble(1)))
    import spark.implicits._
    // candidate exactly at an opt-out point (erased) + one far away (kept)
    val cands = Seq(1, 2).toDF("id")
      .withColumn("cx_ft", when(col("id") === 1, nearX).otherwise(lit(9e7)))
      .withColumn("cy_ft", when(col("id") === 1, nearY).otherwise(lit(9e7)))
    val kept = etl.finalAnalysis(cands).select("id").collect().map(_.getInt(0))
    assert(kept.toSeq === Seq(2))
  }

  test("process() re-runs idempotently (overwrite semantics, P9)") {
    val out = Files.createTempDirectory("etl_out3").toString + "/pts"
    val etl = new OptOutEtl(spark, fixture, "/tmp", out)
    assert(etl.process() === etl.process())
  }
}

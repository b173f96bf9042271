package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Wnv

class WnvReportSpec extends SparkSpec {

  test("csvPipeline output matches the independently-generated golden") {
    val got = Wnv.csvPipeline(spark, Wnv.FixtureCsv)
      .orderBy(col("x"), col("y"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
    val golden = scala.io.Source
      .fromFile("src/test/resources/golden_opt_out_transformed.csv")
      .getLines().drop(1).map { l =>
        val Array(x, y, t) = l.split(",")
        (x.toDouble, y.toDouble, t)
      }.toSeq
    assert(got.toSeq === golden)
  }

  test("target address report: 7-col projection, Join_Count = 1 only") {
    val addrs = graft.sources.Tables.csv(spark,
      "/root/repo/src/main/resources/boulder_addresses.csv",
      StructType(Seq("FULLADDR", "ADDRNUM", "UNITID", "PREDIR",
        "STREETNAME", "STREETSUFF", "POSTDIR").map(StructField(_, StringType))
        ++ Seq(StructField("x", DoubleType), StructField("y", DoubleType))))
    // planar position of 825 Walnut (in-zone target) and 1200 Pearl
    // (covered twice -> excluded by the definition query)
    def ft(lon: Double, lat: Double) =
      ((lon - graft.geo.Geo.Lon0) * graft.geo.Geo.FtPerDegX,
        (lat - graft.geo.Geo.Lat0) * graft.geo.Geo.FtPerDegY)
    val (wx, wy) = ft(-105.2836912, 40.0136327)  // 825 Walnut
    val (px, py) = ft(-105.2795210, 40.0189730)  // 1200 Pearl
    import spark.implicits._
    val zones = Seq(
      (1L, wx, wy, 800.0),   // contains Walnut only
      (2L, px, py, 500.0),   // Pearl zone A
      (3L, px + 100, py, 500.0)) // Pearl zone B (overlap -> Join_Count 2)
      .toDF("zone_id", "cx_ft", "cy_ft", "radius_ft")
    val report = Wnv.targetAddressReport(addrs, zones).collect()
    assert(report.map(_.getString(0)).toSeq === Seq("825 Walnut St"))
    assert(report.head.length === 7)
  }

  test("summary report (S7 analogue) writes title, subtitle, one line per zone") {
    val out = java.nio.file.Files.createTempDirectory("report")
      .resolve("wnv_summary.txt")
    Wnv.exportSummaryReport(spark, sf, out, "August 2026 spray plan")
    val lines = java.nio.file.Files.readAllLines(out)
    assert(lines.get(0).contains("West Nile Virus"))
    assert(lines.get(1) === "August 2026 spray plan")
    val zoneLines = (3 until lines.size).map(lines.get)
    val expected = graft.SparkEntry.queries("wnv_map_export")(spark, sf).count()
    assert(zoneLines.size.toLong === expected && expected > 0)
    assert(zoneLines.forall(_.matches("Zone \\d+: \\d+ target addresses")))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.XF

class XFSpec extends SparkSpec {

  test("dsum is order-independent (decimal accumulation)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val xs = List.fill(200)((rnd.nextDouble() - 0.5) * 1e9)
      val a = xs.toDF("v").select(XF.dsum(col("v"))).head().getDouble(0)
      val b = rnd.shuffle(xs).toDF("v")
        .repartition(7).select(XF.dsum(col("v"))).head().getDouble(0)
      assert(a === b)
    }
  }

  test("h32 is non-negative and fits 32 bits") {
    import spark.implicits._
    val vals = (1 to 500).map(i => s"probe-$i").toDF("s")
      .select(XF.h32(col("s")).as("h")).collect().map(_.getLong(0))
    assert(vals.forall(h => h >= 0 && h <= 0xFFFFFFFFL))
    // uniform-ish: both halves of the range populated
    assert(vals.count(_ < 0x80000000L) > 100)
    assert(vals.count(_ >= 0x80000000L) > 100)
  }

  test("try_cast clean reproduces the reference drop semantics") {
    import spark.implicits._
    // strip quotes/space then cast; non-numeric → null → dropped
    val rows = Seq("\"40.01\"", " '39.5' ", "N/A", "", "12x", "7.25")
      .toDF("raw")
      .withColumn("v",
        regexp_replace(trim(col("raw")), "['\"]", "").try_cast("double"))
      .filter(col("v").isNotNull)
      .collect().map(_.getDouble(1))
    assert(rows.toSeq === Seq(40.01, 39.5, 7.25))
  }

  test("dateS renders identically to java.time formatting") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-03-09 23:59:59")
    val got = Seq(ts).toDF("ts").select(XF.dateS(col("ts"))).head().getString(0)
    assert(got === "2024-03-09")
  }
}

package graft

import org.apache.spark.sql.functions._

class DistJoinRuleSpec extends SparkSpec {

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.toString
  }

  private def d2(ax: String, ay: String, bx: String, by: String) =
    (col(ax) - col(bx)) * (col(ax) - col(bx)) +
      (col(ay) - col(by)) * (col(ay) - col(by))

  test("pure distance join is rewritten: no cartesian / BNLJ in the plan") {
    val df = SparkEntry.queries("wnv_point_pairs_auto")(spark, sf)
    val p = planString(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the 3×3 cover = two chained cell explodes
    assert("Generate".r.findAllIn(p).length >= 2, p)
  }

  test("rewritten distance join matches a driver-side brute force") {
    import spark.implicits._
    graft.plans.DistJoinRule.register(spark)
    val pts = Seq((1L, 0.0, 0.0), (2L, 9.0, 0.0), (3L, 7.0, 7.0),
      (4L, -9.9, 0.1), (5L, 100.0, 100.0), (6L, 0.0, -10.0))
    val l = pts.toDF("i", "axf", "ayf")
    val r = pts.map { case (i, x, y) => (i, x, y) }.toDF("j", "bxf", "byf")
    val got = l.join(r, col("i") < col("j") &&
        d2("axf", "ayf", "bxf", "byf") <= lit(100.0))
      .select(col("i"), col("j")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val expect = (for {
      (i, ax, ay) <- pts; (j, bx, by) <- pts
      if i < j && (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= 100.0
    } yield (i, j)).toSet
    // boundary pairs included: (1,6) at exactly distance 10
    assert(expect.contains((1L, 6L)))
    assert(got === expect)
    assert(expect.nonEmpty)
  }

  test("distance join WITH an equi key is left to the regular hash join") {
    import spark.implicits._
    graft.plans.DistJoinRule.register(spark)
    val l = Seq((1L, 0.0, 0.0), (2L, 50.0, 0.0)).toDF("k", "axf", "ayf")
    val r = Seq((1L, 3.0, 4.0), (2L, 500.0, 0.0)).toDF("k2", "bxf", "byf")
    val df = l.join(r, col("k") === col("k2") &&
      d2("axf", "ayf", "bxf", "byf") <= lit(100.0))
    assert(!planString(df).contains("Generate"), planString(df))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("negative coordinates and cell boundaries stay lossless") {
    import spark.implicits._
    graft.plans.DistJoinRule.register(spark)
    // points straddling cell boundary 0 and the negative side: floor
    // cells differ, the 3×3 cover must still find every pair
    val l = Seq((1L, -0.5, -0.5), (2L, -10.0, -10.0)).toDF("i", "axf", "ayf")
    val r = Seq((10L, 0.5, 0.5), (20L, -10.1, -9.9), (30L, 12.0, 0.0))
      .toDF("j", "bxf", "byf")
    val got = l.join(r, d2("axf", "ayf", "bxf", "byf") <= lit(4.0))
      .select(col("i"), col("j")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }
}

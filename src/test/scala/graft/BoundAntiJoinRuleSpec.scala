package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The monotone-bound semi/anti decorrelation
  * ([[graft.plans.BoundAntiJoinRule]]): plan pins, exhaustive
  * null-semantics equivalence against a brute-force evaluation of the
  * original existential, and the non-fire guards.
  */
class BoundAntiJoinRuleSpec extends SparkSpec {

  import spark.implicits._

  private def planString(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.toString
  }

  // suppliers: (key, nation, bal) with NULL nations and balances;
  // customers: (nation, bal) with NULL everything, plus a nation (7)
  // that exists on the supplier side only (empty group) and one (9)
  // on the customer side only
  private val JInt = java.lang.Integer.valueOf(_: Int)
  private val JDbl = java.lang.Double.valueOf(_: Double)
  private def suppliers: DataFrame =
    Seq[(Long, java.lang.Integer, java.lang.Double)](
      (1L, JInt(1), JDbl(100.0)), (2L, JInt(1), JDbl(5000.0)),
      (3L, JInt(2), JDbl(0.0)), (4L, JInt(7), JDbl(50.0)),
      (5L, null, JDbl(10.0)), (6L, JInt(2), null),
      (7L, JInt(1), null), (8L, JInt(2), JDbl(9999.0))
    ).toDF("sk", "snat", "sbal")
  private def customers: DataFrame =
    Seq[(java.lang.Integer, java.lang.Double)](
      (JInt(1), JDbl(300.0)), (JInt(1), JDbl(800.0)), (JInt(1), null),
      (JInt(2), JDbl(1.0)), (JInt(2), JDbl(2.0)),
      (JInt(9), JDbl(1e9)), (null, JDbl(1e9)), (JInt(2), null)
    ).toDF("cnat", "cbal")

  /** Brute-force three-valued-logic evaluation of
    * `[NOT] EXISTS (SELECT 1 FROM c WHERE c.cnat = s.snat AND
    * cmp(c.cbal, s.sbal))` over the fixtures above.
    */
  private def expected(anti: Boolean,
      cmp: (Double, Double) => Boolean): Set[Long] = {
    val cs = customers.collect().map(r =>
      (Option(r.get(0)).map(_.asInstanceOf[Int]),
        Option(r.get(1)).map(_.asInstanceOf[Double])))
    suppliers.collect().flatMap { r =>
      val sk = r.getLong(0)
      val snat = Option(r.get(1)).map(_.asInstanceOf[Int])
      val sbal = Option(r.get(2)).map(_.asInstanceOf[Double])
      val exists = cs.exists { case (cnat, cbal) =>
        cnat.isDefined && snat.isDefined && cnat == snat &&
          cbal.isDefined && sbal.isDefined && cmp(cbal.get, sbal.get)
      }
      if (exists != anti) Some(sk) else None
    }.toSet
  }

  private def run(joinType: String, cond: org.apache.spark.sql.Column)
      : (Set[Long], String) = {
    val df = suppliers.join(customers, cond, joinType).select(col("sk"))
    (df.collect().map(_.getLong(0)).toSet, planString(df))
  }

  test("anti join with > bound: rewritten to a max-aggregate outer join") {
    val (got, plan) = run("left_anti",
      col("cnat") === col("snat") && col("cbal") > col("sbal") * 2 + lit(100.0))
    assert(!plan.contains("LeftAnti"), plan)
    assert(plan.contains("max("), plan)
    assert(got === expected(anti = true, (c, s) => c > s * 2 + 100.0))
  }

  test("anti join with < bound: min aggregate, same answer as brute force") {
    val (got, plan) = run("left_anti",
      col("cnat") === col("snat") && col("cbal") < col("sbal"))
    assert(!plan.contains("LeftAnti"), plan)
    assert(plan.contains("min("), plan)
    assert(got === expected(anti = true, (c, s) => c < s))
  }

  test("anti join with flipped-orientation bound (stream expr on the left)") {
    val (got, plan) = run("left_anti",
      col("cnat") === col("snat") && col("sbal") >= col("cbal"))
    assert(!plan.contains("LeftAnti"), plan)
    assert(got === expected(anti = true, (c, s) => s >= c))
  }

  test("semi join with bound: rewritten to an inner aggregate join") {
    val (got, plan) = run("left_semi",
      col("cnat") === col("snat") && col("cbal") >= col("sbal"))
    assert(!plan.contains("LeftSemi"), plan)
    assert(plan.contains("max("), plan)
    assert(got === expected(anti = false, (c, s) => c >= s))
  }

  test("SQL NOT EXISTS route: the anti join from RewriteSubquery is caught") {
    suppliers.createOrReplaceTempView("bspec_s")
    customers.createOrReplaceTempView("bspec_c")
    val df = spark.sql(
      """SELECT sk FROM bspec_s s
        |WHERE NOT EXISTS (SELECT 1 FROM bspec_c c
        |                  WHERE c.cnat = s.snat AND c.cbal > s.sbal)""".stripMargin)
    val plan = planString(df)
    assert(!plan.contains("LeftAnti"), plan)
    assert(plan.contains("max("), plan)
    assert(df.collect().map(_.getLong(0)).toSet ===
      expected(anti = true, (c, s) => c > s))
  }

  test("guards: two bounds, non-equi extras, and pure-equi joins don't fire") {
    // two inequality conjuncts do not decompose into one aggregate
    val (got2, plan2) = run("left_anti",
      col("cnat") === col("snat") && col("cbal") > col("sbal") &&
        col("cbal") < col("sbal") * 3)
    assert(plan2.contains("LeftAnti"), plan2)
    // a <=> conjunct is outside the rewrite's scope
    val (_, plan3) = run("left_anti",
      col("cnat") <=> col("snat") && col("cbal") > col("sbal"))
    assert(plan3.contains("LeftAnti"), plan3)
    // pure equi anti join untouched (q21/q4 class)
    val (_, plan4) = run("left_anti", col("cnat") === col("snat"))
    assert(plan4.contains("LeftAnti"), plan4)
    // and the two-bound answer still matches brute force via the hash join
    assert(got2 === expected(anti = true, (c, s) => c > s && c < s * 3))
  }

  test("guard: float/double equi keys don't fire (NormalizeFloatingNumbers " +
    "runs before the user batch, so ±0.0 would split synthesized groups)") {
    // build side holds BOTH zero bit patterns under the same SQL key
    // value; an unguarded rewrite groups them separately and a semi→
    // inner rewrite would emit the stream row TWICE (multiplicity bug)
    val right = Seq((0.0, 10.0), (-0.0, 20.0), (1.5, 5.0))
      .toDF("rk", "rv")
    val left = Seq((0.0, 1.0), (1.5, 99.0)).toDF("lk", "lv")
    val df = left.join(right,
      col("lk") === col("rk") && col("rv") > col("lv"), "left_semi")
    val rows = df.collect()
    val plan = planString(df)
    assert(plan.contains("LeftSemi"), plan) // guard held: no rewrite
    assert(rows.length === 1 && rows.head.getDouble(0) === 0.0)
  }

  test("stream-side broadcast hint survives the rewrite") {
    val hinted = broadcast(suppliers).join(customers,
      col("cnat") === col("snat") && col("cbal") > col("sbal"), "left_anti")
      .select(col("sk"))
    val opt = hinted.queryExecution.optimizedPlan
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // rewrite fired (no anti join left) AND the stream side's hint
    // rode along onto the synthesized outer join
    assert(joins.nonEmpty && joins.forall(_.joinType !=
      org.apache.spark.sql.catalyst.plans.LeftAnti), opt.toString)
    assert(joins.exists(_.hint.leftHint.isDefined), opt.toString)
    assert(hinted.collect().map(_.getLong(0)).toSet ===
      expected(anti = true, (c, s) => c > s))
  }
}

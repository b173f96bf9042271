package graft

import org.apache.spark.sql.functions._

class SqlSpec extends SparkSpec {

  test("correlated subquery decorrelates to the groupBy+join formulation") {
    val viaSql = graft.SparkEntry.queries("sql_corr_subquery")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val cust = graft.sources.Tables.t(spark, sf, "customer")
    val avgByNation = cust.groupBy(col("c_nationkey").as("nk"))
      .agg((graft.functions.XF.dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val viaJoin = cust.join(avgByNation, col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select("c_custkey").orderBy("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaJoin)
    assert(viaSql.nonEmpty)
  }

  test("IN subquery equals the left-semi join formulation") {
    val viaSql = graft.SparkEntry.queries("sql_in_subquery")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val viaSemi = graft.sources.Tables.t(spark, sf, "orders")
      .filter(col("o_totalprice") > 350000.0)
      .join(graft.sources.Tables.t(spark, sf, "customer")
        .filter(col("c_mktsegment") === "MACHINERY"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaSemi)
  }

  test("q6 revenue equals the DataFrame formulation") {
    val viaSql = graft.SparkEntry.queries("sql_q6_forecast")(spark, sf).head()
    val li = graft.sources.Tables.t(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2001-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(graft.functions.XF.dsum(col("l_extendedprice") * col("l_discount")),
        count(lit(1)))
      .head()
    assert(viaSql.getDouble(0) === li.getDouble(0))
    assert(viaSql.getLong(1) === li.getLong(1))
  }

  test("graft_shingle_hashes generator is callable from SQL") {
    graft.sources.Tables.t(spark, sf, "documents")
      .createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, s FROM docs_sql
        |LATERAL VIEW graft_shingle_hashes(text, 3) t AS s
        |ORDER BY doc_id, s""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaColumn = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.ShingleHashes(col("text"), 3))
      .orderBy("doc_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaColumn)
    assert(viaSql.nonEmpty)
  }

  test("graft_dup_gram_frac kernel is callable from SQL") {
    graft.sources.Tables.t(spark, sf, "documents")
      .createOrReplaceTempView("docs_dup_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_dup_gram_frac(split(text, ' '), 2) AS f
        |FROM docs_dup_sql ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaColumn = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.ArrayExprs
        .dupGramFrac(split(col("text"), " "), 2).as("f"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql === viaColumn)
    assert(viaSql.exists(_._2 > 0.0)) // the corpus has real repetition
  }

  test("SQL-defined scalar UDF inlines into codegen, equals DataFrame math") {
    val df = SparkEntry.queries("sql_udf_scalar")(spark, sf)
    val rows = df.collect() // executes THIS plan → AQE finalizes it
    val plan = df.queryExecution.executedPlan.toString
    // the analyzer must INLINE the function body — a surviving black-box
    // UDF node would break pushdown/codegen, the reason SQL UDFs exist
    assert(!plan.contains("ScalaUDF") && !plan.contains("SQLFunction"), plan)
    // `*(n)` markers = whole-stage codegen stages in the final plan
    assert(plan.contains("*("), plan)
    val got = rows
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = graft.sources.Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)),
        graft.functions.XF.dsum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("named parameter markers bind as literals and push down") {
    val df = SparkEntry.queries("sql_param_markers")(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the bound values behave as plan literals: the quantity/discount
    // predicates reach the parquet scan as pushed filters
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(l_quantity,30.0)"), plan)
    val want = graft.sources.Tables.t(spark, sf, "lineitem")
      .filter(col("l_quantity") >= 30.0 &&
        col("l_discount").between(0.02, 0.08))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)),
        graft.functions.XF.dsum(col("l_extendedprice") * col("l_discount")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = rows
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("SQL-defined table UDF behaves as the parameterized view it names") {
    val got = SparkEntry.queries("sql_udf_table")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = graft.sources.Tables.t(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")))
      .filter(col("n") >= 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}

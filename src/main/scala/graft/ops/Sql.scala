package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.XF._
import graft.sources.Tables.t

/** The SQL entry path: tables registered as temp views (the analogue of
  * the reference's `addDataFromPath` layer registration,
  * final_project.py:200) and queried through `spark.sql` — exercising the
  * parser/analyzer front end end-to-end, including correlated subqueries
  * that Catalyst must decorrelate into joins.
  *
  * The Spark SQL text and the DuckDB oracle text stay dialect-compatible
  * except for the documented determinism casts (XF).
  */
object Sql {

  private def reg(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => t(s, d, n).createOrReplaceTempView(n))

  private val q6 =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
       |       COUNT(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
       |  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
       |  AND l_quantity < CAST(24 AS DOUBLE)""".stripMargin

  // correlated scalar subquery: customers spending above their nation's
  // average total — Catalyst decorrelates into an aggregate + join.
  private val corr =
    s"""SELECT c_custkey, c_nationkey
       |FROM customer c
       |WHERE c_acctbal > (SELECT ${davgSql("c2.c_acctbal")}
       |                   FROM customer c2
       |                   WHERE c2.c_nationkey = c.c_nationkey)
       |ORDER BY c_custkey""".stripMargin

  // uncorrelated IN subquery → left-semi join after rewrite.
  private val inSub =
    s"""SELECT o_orderkey, o_totalprice
       |FROM orders
       |WHERE o_custkey IN (SELECT c_custkey FROM customer
       |                    WHERE c_mktsegment = 'MACHINERY')
       |  AND o_totalprice > CAST(350000 AS DOUBLE)
       |ORDER BY o_orderkey""".stripMargin

  // GROUPING SETS is SQL-only surface in Spark (rollup/cube cover the
  // DataFrame API side, see Relational).
  private val gsets =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // correlated EXISTS / NOT EXISTS → semi/anti joins after decorrelation:
  // suppliers in nations that have customers but where no customer's
  // balance exceeds 2× the supplier's + 5000 (threshold chosen to keep
  // the result non-empty at every test sf).
  private val existsSub =
    s"""SELECT s_suppkey, s_nationkey
       |FROM supplier s
       |WHERE EXISTS (SELECT 1 FROM customer c
       |              WHERE c.c_nationkey = s.s_nationkey)
       |  AND NOT EXISTS (SELECT 1 FROM customer c2
       |                  WHERE c2.c_nationkey = s.s_nationkey
       |                    AND c2.c_acctbal > CAST(2 AS DOUBLE) * s.s_acctbal
       |                                       + CAST(5000 AS DOUBLE))
       |ORDER BY s_suppkey""".stripMargin

  // multi-level CTE chain with a window inside — parser surface for
  // WITH + nested references.
  private val cte =
    s"""WITH nat_orders AS (
       |  SELECT c.c_nationkey AS nk, o.o_totalprice AS price,
       |         o.o_orderkey AS ok
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
       |ranked AS (
       |  SELECT nk, price,
       |         row_number() OVER (PARTITION BY nk
       |                            ORDER BY price DESC, ok) AS rk
       |  FROM nat_orders)
       |SELECT nk, ${dsumSql("price")} AS top5_total
       |FROM ranked WHERE rk <= 5
       |GROUP BY nk ORDER BY nk""".stripMargin

  // SQL-dialect PIVOT clause (parser surface — the DataFrame .pivot side
  // is events_pivot). The oracle uses the dialect-portable FILTER form:
  // PIVOT syntax differs between engines, the result contract doesn't.
  private val pivotSpark =
    """SELECT * FROM (
      |  SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders)
      |PIVOT (COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
      |         AS DOUBLE) AS total
      |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
      |ORDER BY o_orderpriority""".stripMargin

  private val pivotOracle =
    s"""SELECT o_orderpriority,
       |  COUNT(*) FILTER (o_orderstatus = 'F') AS f_n,
       |  ${dsumSql("o_totalprice")
            .replace("o_totalprice", "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
       |  COUNT(*) FILTER (o_orderstatus = 'O') AS o_n,
       |  ${dsumSql("o_totalprice")
            .replace("o_totalprice", "CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
       |  COUNT(*) FILTER (o_orderstatus = 'P') AS p_n,
       |  ${dsumSql("o_totalprice")
            .replace("o_totalprice", "CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
       |FROM orders GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // LATERAL VIEW explode — the Hive-dialect generator syntax in Spark's
  // parser; the oracle uses DuckDB's unnest, same contract.
  private val lateralSpark =
    """SELECT lang, token, COUNT(*) AS n
      |FROM documents
      |LATERAL VIEW explode(split(text, ' ')) tok AS token
      |WHERE length(token) >= 8
      |GROUP BY lang, token
      |ORDER BY lang, n DESC, token
      |LIMIT 50""".stripMargin

  private val lateralOracle =
    """SELECT lang, token, COUNT(*) AS n
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
      |      FROM documents)
      |WHERE length(token) >= 8
      |GROUP BY lang, token
      |ORDER BY lang, n DESC, token
      |LIMIT 50""".stripMargin

  // WITH RECURSIVE (Spark 4 parser feature) — depth-per-node over the
  // implicit heap tree parent(n) = (n−1)/2 rooted at nation 0: the
  // recursion is the declarative form of iterative reachability
  // (graph_pagerank/dedup_clusters do the driver-loop version; this is
  // the engine-managed one). Integer-division syntax is the one dialect
  // split: Spark `DIV`, DuckDB `//`.
  private def recursiveTree(intdiv: String) =
    s"""WITH RECURSIVE tree(node, depth) AS (
       |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  UNION ALL
       |  SELECT CAST(n.n_nationkey AS BIGINT), t.depth + 1
       |  FROM nation n JOIN tree t
       |    ON CAST(n.n_nationkey - 1 AS BIGINT) $intdiv 2 = t.node
       |  WHERE n.n_nationkey > 0)
       |SELECT t.depth, COUNT(*) AS n_nodes,
       |  MIN(n.n_name) AS first_name, MAX(n.n_name) AS last_name
       |FROM tree t
       |JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = t.node
       |GROUP BY t.depth ORDER BY t.depth""".stripMargin

  // VARIANT (Spark 4 binary JSON): parse once, typed-path extraction —
  // the open-schema column type a 100 TB event pipeline stores instead
  // of re-parsing JSON strings per query. DuckDB twin reads the same
  // semantics through its JSON functions.
  // REPARTITION hint on the INPUT subquery (a hint on the outer SELECT
  // lands above the aggregate — useless): the variant parse is a
  // CPU-heavy per-row stage and the single-row-group events file pins
  // the scan to 1-2 tasks (the codec-stage rule, Multimodal.pngMedia);
  // the integer SUM is order-independent, so only parallelism changes.
  private val variantSpark =
    """SELECT CAST(variant_get(parse_json(props), '$.k', 'int') % 10 AS BIGINT)
      |    AS k_mod,
      |  COUNT(*) AS n,
      |  CAST(SUM(variant_get(parse_json(props), '$.k', 'int')) AS BIGINT)
      |    AS k_sum
      |FROM (SELECT /*+ REPARTITION(32) */ props FROM events) ev
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val variantOracle =
    """SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
      |    AS BIGINT) AS k_mod,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
      |    AS BIGINT) AS k_sum
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // the SQL-dialect UNPIVOT clause (the inverse of sql_pivot's clause;
  // unpivot_long covers the DataFrame-API melt) — SQL-standard form,
  // accepted verbatim by both engines
  private val unpivotSql =
    """WITH w AS (
      |  SELECT o_orderstatus,
      |    COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
      |    COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
      |    COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, priority, n FROM w
      |UNPIVOT (n FOR priority IN (urgent, high, low))
      |ORDER BY o_orderstatus, priority""".stripMargin

  // SQL-standard named WINDOW clause: one spec shared by several window
  // functions — parser surface the DataFrame API has no analogue for.
  // The running sum accumulates exact long cents (a running DOUBLE sum
  // would be order-dependent only in the last ulp, but exactness is
  // free here); identical text runs in DuckDB.
  private val namedWindow =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rn,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
      |    AS BIGINT) AS run_cents,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, rn""".stripMargin

  // SQL-DEFINED FUNCTIONS (Spark 4 SQL UDFs, SPARK-46246): business
  // logic declared IN SQL — `CREATE FUNCTION … RETURN <expr|query>` —
  // which the analyzer INLINES into the calling plan
  // (ResolveSQLFunctions), so unlike a JVM/Python UDF the body stays
  // inside whole-stage codegen, pushdown-able and costable: zero
  // black-box penalty, the right default for shareable derived-metric
  // definitions at 100 TB. The scalar UDF is a net-price formula used
  // inside an aggregate; the TABLE UDF is a parameterized view invoked
  // in FROM position. DuckDB has macros for the same idea, but the
  // oracle inlines the bodies by hand — proving the inlining is
  // semantics-preserving is exactly the point of the check.
  private val udfScalarCreate =
    """CREATE OR REPLACE TEMPORARY FUNCTION net_price(
      |  price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
      |RETURN price * (CAST(1 AS DOUBLE) - disc) *
      |  (CAST(1 AS DOUBLE) + tax)""".stripMargin

  private val udfScalarQuery =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${dsumSql("net_price(l_extendedprice, l_discount, l_tax)")}
       |    AS net_revenue
       |FROM lineitem
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val udfScalarOracle =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${dsumSql("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * (CAST(1 AS DOUBLE) + l_tax)")}
       |    AS net_revenue
       |FROM lineitem
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val udfTableCreate =
    """CREATE OR REPLACE TEMPORARY FUNCTION orders_above(min_total DOUBLE)
      |RETURNS TABLE (o_orderkey BIGINT, o_custkey BIGINT,
      |               o_totalprice DOUBLE)
      |RETURN SELECT o_orderkey, o_custkey, o_totalprice
      |       FROM orders WHERE o_totalprice > min_total""".stripMargin

  private val udfTableQuery =
    """SELECT o_custkey, COUNT(*) AS n_big,
      |  MAX(o_totalprice) AS top_price
      |FROM orders_above(CAST(400000 AS DOUBLE))
      |GROUP BY o_custkey
      |HAVING COUNT(*) >= 2
      |ORDER BY o_custkey""".stripMargin

  private val udfTableOracle =
    """SELECT o_custkey, COUNT(*) AS n_big,
      |  MAX(o_totalprice) AS top_price
      |FROM (SELECT o_orderkey, o_custkey, o_totalprice
      |      FROM orders WHERE o_totalprice > CAST(400000 AS DOUBLE))
      |GROUP BY o_custkey
      |HAVING COUNT(*) >= 2
      |ORDER BY o_custkey""".stripMargin

  // PARAMETERIZED SQL (named parameter markers, SPARK-44066): the text
  // carries `:name` placeholders and values bind at plan time through
  // `spark.sql(text, args)` — the injection-safe templating path (the
  // binding is a literal in the parsed plan, never string splicing), and
  // bound literals still constant-fold and push down like inline ones.
  private val paramQuery =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${dsumSql("l_extendedprice * l_discount")} AS discount_revenue
       |FROM lineitem
       |WHERE l_quantity >= :minqty AND l_discount BETWEEN :dlo AND :dhi
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val paramOracle =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${dsumSql("l_extendedprice * l_discount")} AS discount_revenue
       |FROM lineitem
       |WHERE l_quantity >= CAST(30 AS DOUBLE)
       |  AND l_discount BETWEEN CAST(0.02 AS DOUBLE)
       |                     AND CAST(0.08 AS DOUBLE)
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "sql_param_markers" -> ((s: SparkSession, d: String) => {
      reg(s, d, "lineitem")
      s.sql(paramQuery,
        Map("minqty" -> 30.0, "dlo" -> 0.02, "dhi" -> 0.08))
    }),
    "sql_udf_scalar" -> ((s: SparkSession, d: String) => {
      reg(s, d, "lineitem"); s.sql(udfScalarCreate); s.sql(udfScalarQuery)
    }),
    "sql_udf_table" -> ((s: SparkSession, d: String) => {
      reg(s, d, "orders"); s.sql(udfTableCreate); s.sql(udfTableQuery)
    }),
    "sql_named_window" -> ((s: SparkSession, d: String) => {
      reg(s, d, "orders"); s.sql(namedWindow)
    }),
    "sql_unpivot" -> ((s: SparkSession, d: String) => {
      reg(s, d, "orders"); s.sql(unpivotSql)
    }),
    "sql_recursive_tree" -> ((s: SparkSession, d: String) => {
      reg(s, d, "nation"); s.sql(recursiveTree("DIV"))
    }),
    "sql_variant_extract" -> ((s: SparkSession, d: String) => {
      reg(s, d, "events"); s.sql(variantSpark)
    }),
    "sql_lateral_explode" -> ((s: SparkSession, d: String) => {
      reg(s, d, "documents"); s.sql(lateralSpark)
    }),
    "sql_pivot" -> ((s: SparkSession, d: String) => {
      reg(s, d, "orders"); s.sql(pivotSpark)
    }),
    "sql_exists_subquery" -> ((s: SparkSession, d: String) => {
      reg(s, d, "supplier", "customer"); s.sql(existsSub)
    }),
    "sql_cte_window" -> ((s: SparkSession, d: String) => {
      reg(s, d, "orders", "customer"); s.sql(cte)
    }),
    "sql_q6_forecast" -> ((s: SparkSession, d: String) => {
      reg(s, d, "lineitem"); s.sql(q6)
    }),
    "sql_grouping_sets" -> ((s: SparkSession, d: String) => {
      reg(s, d, "orders"); s.sql(gsets)
    }),
    "sql_corr_subquery" -> ((s: SparkSession, d: String) => {
      reg(s, d, "customer"); s.sql(corr)
    }),
    "sql_in_subquery" -> ((s: SparkSession, d: String) => {
      reg(s, d, "customer", "orders"); s.sql(inSub)
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "sql_param_markers" -> paramOracle,
    "sql_udf_scalar" -> udfScalarOracle,
    "sql_udf_table" -> udfTableOracle,
    "sql_named_window" -> namedWindow,
    "sql_unpivot" -> unpivotSql,
    "sql_recursive_tree" -> recursiveTree("//"),
    "sql_variant_extract" -> variantOracle,
    "sql_lateral_explode" -> lateralOracle,
    "sql_pivot" -> pivotOracle,
    "sql_exists_subquery" -> existsSub,
    "sql_cte_window" -> cte,
    "sql_q6_forecast" -> q6,
    "sql_grouping_sets" -> gsets,
    "sql_corr_subquery" -> corr,
    "sql_in_subquery" -> inSub
  )
}

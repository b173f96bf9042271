package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables.t

/** In-flight pipeline metrics via the Observation API — the audit
  * pattern a 100 TB run needs: row counts and invariant checks ride the
  * query's own pass (collected by the observe operator as the rows
  * stream through), so validating a load costs ZERO extra scans. The
  * driver-loop alternative — a separate `.count()` / `.agg()` per
  * metric — re-reads the fact table once per metric.
  */
class ObservationSpec extends SparkSpec {

  test("observe collects audit metrics on the query's own pass") {
    val obs = Observation("lineitem_audit")
    val out = t(spark, sf, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") <= 0 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("bad_quantity"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"))
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .collect()

    val m = obs.get
    // metrics describe the PRE-filter stream: every scanned row counted
    val total = t(spark, sf, "lineitem").count()
    assert(m("rows_seen") === total)
    // the generator's quantity domain is (0, 50] and shipdate is dense
    assert(m("bad_quantity") === 0L)
    assert(m("null_shipdate") === 0L)
    // and the query result itself is still correct alongside
    assert(out.map(_.getLong(1)).sum ===
      t(spark, sf, "lineitem").filter(col("l_returnflag") === "R").count())
  }

  test("observed invariant gate: a load can fail fast on bad rows") {
    val obs = Observation("gate")
    t(spark, sf, "orders")
      .observe(obs, sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L))
        .as("nonpositive_price"))
      // force the full pass without collecting rows; must be a real SQL
      // action (noop sink) — a bare queryExecution.toRdd.count() never
      // fires the execution-end event Observation.get waits on
      .write.format("noop").mode("overwrite").save()
    // the gate a production load would enforce before publishing
    assert(obs.get("nonpositive_price") === 0L)
  }
}

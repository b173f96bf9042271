package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2), one named
  * DataFrame builder per operator; `oracleSql` carries the DuckDB twin the
  * driver hash-compares against at sf0.01. Ops whose values are
  * implementation-defined (HLL sketches) appear in `queries` only.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full WNV pipeline (geocode → zones → erase → per-zone targets).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("wnv_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(
      Seq[(String, (SparkSession, String) => DataFrame)],
      Seq[(String, String)])] = Seq(
    (ops.Wnv.queries, ops.Wnv.oracles),
    (ops.Relational.queries, ops.Relational.oracles),
    (ops.Analytics.queries, ops.Analytics.oracles),
    (ops.Text.queries, ops.Text.oracles),
    (ops.Curation.queries, ops.Curation.oracles),
    (ops.Events.queries, ops.Events.oracles),
    (ops.Dedup.queries, ops.Dedup.oracles),
    (ops.Similarity.queries, ops.Similarity.oracles),
    (ops.Multimodal.queries, ops.Multimodal.oracles),
    (ops.Sql.queries, ops.Sql.oracles),
    (streaming.Streams.queries, streaming.Streams.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  val oracleSql: Map[String, String] = modules.flatMap(_._2).toMap

  require(oracleSql.keySet.subsetOf(queries.keySet),
    s"oracle without query: ${oracleSql.keySet -- queries.keySet}")

  // a duplicate name across modules would silently drop a query in toMap
  private val allNames = modules.flatMap(_._1.map(_._1))
  require(allNames.distinct.size == allNames.size,
    s"duplicate query names: ${allNames.diff(allNames.distinct).distinct}")
}

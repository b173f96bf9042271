package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Geo
import graft.ops.Wnv
import graft.sources.Tables

/** The reference's OO API track re-expressed over DataFrames.
  *
  * Mirrors `SpatialEtl` (reference SpatialETL_Lab2.py:1-16: ctor holding
  * remote/local/format/destination, stub extract/transform/load) and
  * `GSheetsEtl` (GSheetsETL_Lab2.py:11-150: overrides + `process()`
  * template method + `final_analysis` Buffer/Erase).
  *
  * The crucial structural difference from the reference: each stage
  * RETURNS a lazy DataFrame instead of materializing a file between
  * stages — `process()` composes one DAG; only `load()` executes it.
  * Stage boundaries survive as the API, not as disk barriers.
  */
abstract class SpatialEtl(
    val spark: SparkSession,
    val remote: String,
    val localDir: String,
    val dataFormat: String,
    val destination: String) {

  /** Source acquisition → raw frame (reference extract()). */
  def extract(): DataFrame

  /** Enrichment/cleaning → transformed frame (reference transform()). */
  def transform(raw: DataFrame): DataFrame

  /** Sink materialization; returns loaded row count (reference load()
    * prints `GetCount_management`, Lab2ETL.py:94).
    */
  def load(transformed: DataFrame): Long

  /** Template method (reference process(), GSheetsETL_Lab2.py:137-150). */
  def process(): Long = load(transform(extract()))
}

/** The `GSheetsEtl` analogue: opt-out addresses from a CSV snapshot of
  * the published sheet → geocoded residential points → parquet, plus
  * `finalAnalysis` = Buffer(1500ft) + Erase as distance anti-join.
  *
  * @param remote      source CSV path (a URL snapshot; file path here —
  *                    network acquisition is deliberately outside the
  *                    data plane, reference Lab2ETL.py:12-19)
  * @param destination output parquet directory
  */
class OptOutEtl(
    spark: SparkSession,
    remote: String,
    localDir: String,
    destination: String)
  extends SpatialEtl(spark, remote, localDir, "csv", destination) {

  override def extract(): DataFrame =
    Tables.csv(spark, remote, Tables.optOutSchema)

  /** P1 concat → P2 geocode → P4 miss-drop → P6 tag → S4 x/y/Type. */
  override def transform(raw: DataFrame): DataFrame = {
    val addr = concat(col("Street Address"), lit(" Boulder CO"))
    raw.select(addr.as("addr"))
      .filter(Geo.geocodeHit(col("addr")))
      .select(
        Geo.geocodeLon(col("addr")).as("x"),
        Geo.geocodeLat(col("addr")).as("y"),
        lit("Residential").as("Type"))
  }

  override def load(transformed: DataFrame): Long = {
    transformed.write.mode("overwrite").parquet(destination)
    spark.read.parquet(destination).count()
  }

  /** Buffer 1500 ft + Erase (GSheetsETL_Lab2.py:112-134): zone points
    * minus opt-out buffers, as a distance anti-join on projected feet.
    * `zones` carries (cx_ft, cy_ft) candidate points to keep.
    */
  def finalAnalysis(candidates: DataFrame): DataFrame = {
    val pts = spark.read.parquet(destination)
      .select(Geo.xFt(col("x")).as("ox"), Geo.yFt(col("y")).as("oy"))
    candidates.join(
      broadcast(pts),
      Geo.dist2(col("cx_ft"), col("cy_ft"), col("ox"), col("oy"))
        <= lit(Wnv.BufferFt * Wnv.BufferFt),
      "left_anti")
  }
}

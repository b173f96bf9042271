package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders for the driver testdata plus the reference's CSV
  * source/sink surface (SURVEY.md §2.1).
  *
  * Parquet is the primary format (columnar, pushdown- and pruning-friendly;
  * the driver testdata ships as one parquet per table). CSV helpers mirror
  * the reference's header-CSV in/out (reference Lab2ETL.py:62-68) with
  * explicit schemas — no `inferSchema` in production paths, since inference
  * means an extra full scan and nondeterministic typing at 100 TB.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table. Plain `spark.read.parquet` keeps the scan a
    * v1/v2 FileSourceScan with full filter pushdown + column pruning.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark refuses to read
    * as a timestamp; we read it as a long (nanos) via the legacy conf and
    * truncate to microseconds — exactly what DuckDB's parquet reader does
    * (ns → µs TIMESTAMP, floor), so oracle compares stay bit-identical.
    *
    * Loaded frames are memoized per (session, path): a fresh
    * `spark.read.parquet` builds a new InMemoryFileIndex (file listing +
    * footer schema read) every call, which at one-query-per-call harness
    * cadence is pure fixed overhead. Reusing the resolved plan reuses the
    * index; the data path is unchanged (nothing is cached/persisted).
    */
  private val loaded =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.getOrElseUpdate((spark, dir, name),
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/events.parquet")
          .withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts DIV 1000")))
      } else spark.read.parquet(s"$dir/$name.parquet"))

  /** Header CSV scan with a declared schema (reference Lab2ETL.py:66-68:
    * `csv.DictReader` keys rows by the header). PERMISSIVE mode keeps
    * malformed rows as nulls so the caller can apply the reference's
    * drop-on-parse-failure semantics (Lab2ETL.py:79-80) with a filter.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Header CSV sink (reference Lab2ETL.py:62-64 writes header then rows).
    * Overwrite mirrors `arcpy.env.overwriteOutput = True` (Lab2ETL.py:85).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Schema of the reference's opt-out extract
    * (FIXTURES.md §1.1; reference GSheetsETL_Lab2.py:16-18).
    */
  val optOutSchema: StructType = StructType(Seq(
    StructField("Timestamp", StringType),
    StructField("Street Address", StringType),
    StructField("Zipcode", StringType)))
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The partition-pruning path (SCALE.md): Hive-style partitioned layout
  * makes a filter on the partition column a DIRECTORY prune — the scan
  * never lists, opens, or reads the other partitions' files. The
  * storage-side complement of BucketingSpec's shuffle elimination.
  */
class PartitioningSpec extends SparkSpec {

  test("partitioned write prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("part").toString
    graft.sources.Tables.writePartitioned(
      graft.sources.Tables.t(spark, sf, "documents"), dir, "lang")

    // layout: one directory per language
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.forall(_.startsWith("lang=")), subdirs.mkString(","))

    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    // the lang predicate must appear as a PartitionFilter (directory
    // prune), not a post-scan data filter
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    assert(plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(lang"),
      plan.take(2000))
    // correctness: partitioned round-trip equals the direct filter
    val expected = graft.sources.Tables.t(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(q.count() === expected)

    // only the en partition's files were read: the scan's numFiles
    // metric (post-pruning) must be strictly below the 5-language total
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    val numFiles = scan.metrics("numFiles").value
    val totalFiles = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(numFiles < totalFiles, s"read $numFiles of $totalFiles files")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions") {
    // the star-join form of the same prune: the selective predicate
    // lives on the DIMENSION (is_primary), not the fact, so no static
    // partition filter exists — Catalyst derives one at runtime from
    // the broadcast dim (DPP subquery on the partition join key). At
    // 100 TB this is the difference between scanning every date/lang
    // directory of the fact and scanning the handful the dim row set
    // actually references.
    val dir = Files.createTempDirectory("dpp").toString
    graft.sources.Tables.writePartitioned(
      graft.sources.Tables.t(spark, sf, "documents"), dir, "lang")
    val fact = spark.read.parquet(dir)
    import spark.implicits._
    // the dim must be FILE-based: a filter over a local relation is
    // constant-folded away before the PartitionPruning rule looks for
    // a surviving selective predicate on the dim side
    // ... and the predicate must be one DPP considers selective (a
    // comparison — a bare boolean attribute fails isLikelySelective)
    val dimDir = Files.createTempDirectory("dpp_dim").toString
    Seq(("en", "primary"), ("de", "secondary"), ("fr", "secondary"),
      ("es", "secondary"), ("zh", "secondary")).toDF("lang", "tier")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = fact.join(broadcast(dim).filter(col("tier") === "primary"),
        Seq("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
    val expected = graft.sources.Tables.t(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("en" -> expected))
  }
}

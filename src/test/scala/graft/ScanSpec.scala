package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Scan

/** Property tests for the distributed prefix scan (ops/Scan.scala): the
  * two-level (per-bucket window + broadcast offsets) form must equal the
  * single global window on every input — including adversarial ones
  * (heavy ties that straddle quantile boundaries, negative running
  * sums, tiny frames with more buckets than rows) — and the NTILE
  * formula must replicate Spark's ntile at every (N, n) shape.
  */
class ScanSpec extends SparkSpec {

  import spark.implicits._

  private def refRunning(df: org.apache.spark.sql.DataFrame,
      order: Seq[org.apache.spark.sql.Column],
      value: org.apache.spark.sql.Column) = {
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("want", sum(value).over(w))
  }

  test("runningOver == global window on a deterministic pseudo-random frame") {
    // deterministic keys with deliberate collisions (k % 17) so tie
    // groups cross any quantile boundary placement; values mix signs so
    // running sums rise and fall
    val df = (0 until 500).map { i =>
      (i.toLong, (i * 2654435761L) % 17, if (i % 3 == 0) -2L else 1L)
    }.toDF("id", "k", "v")
    val got = Scan.runningOver(df, v = col("k"), desc = false,
        order = Seq(col("k"), col("id")), outs = Seq(("run", col("v"))),
        nB = 8)
      .select(col("id"), col("run"))
    val want = refRunning(df, Seq(col("k"), col("id")), col("v"))
      .select(col("id"), col("want"))
    val joined = got.join(want, Seq("id"))
      .filter(col("run") =!= col("want"))
    assert(joined.count() === 0)
  }

  test("runningOver descending with running count == row_number") {
    val df = (0 until 300).map { i =>
      (i.toLong, ((i * 31) % 7).toLong)
    }.toDF("id", "k")
    val got = Scan.runningOver(df, v = col("k"), desc = true,
        order = Seq(col("k").desc, col("id")),
        outs = Seq(("rnk", lit(1L))), nB = 5)
    val want = df.withColumn("want",
      row_number().over(Window.orderBy(col("k").desc, col("id")))
        .cast("long"))
    assert(got.join(want, Seq("id"))
      .filter(col("rnk") =!= col("want")).count() === 0)
  }

  test("more buckets than rows, and a single-row frame, still scan correctly") {
    val tiny = Seq((1L, 10L), (2L, 10L), (3L, 5L)).toDF("id", "v")
    val got = Scan.runningOver(tiny, v = col("v"), desc = false,
        order = Seq(col("v"), col("id")), outs = Seq(("run", col("v"))),
        nB = 64)
      .orderBy(col("run")).select(col("id"), col("run"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((3L, 5L), (1L, 15L), (2L, 25L)))
    val one = Seq((7L, 42L)).toDF("id", "v")
    assert(Scan.runningOver(one, col("v"), desc = false,
      Seq(col("v"), col("id")), Seq(("run", col("v"))))
      .select(col("run")).head().getLong(0) === 42L)
  }

  test("decimal running sums stay exact through the offset join") {
    // the parts_abc_pareto path: corpus-scaled DECIMAL(38,0)
    // accumulators — the per-bucket sums, the offsets window, and the
    // final local+offset addition must all stay in the decimal domain
    // (a silent fall-through to double would round large cumulative
    // totals and break the oracle hash)
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val big = 1234567890123456L // ~2^60 per row: double would round
    val df = (0 until 200).map(i => (i.toLong, big + i)).toDF("id", "v")
    val scanned = Scan.runningOver(df, col("v"), desc = false,
      Seq(col("v"), col("id")),
      Seq(("cum", col("v").cast(DecimalType(38, 0)))), nB = 7)
    assert(scanned.schema("cum").dataType === DecimalType(38, 0))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("want",
      sum(col("v").cast(DecimalType(38, 0))).over(w))
    assert(scanned.join(want, Seq("id"))
      .filter(col("cum") =!= col("want")).count() === 0)
    // the grand cumulative total is exact to the last digit
    val total = scanned.agg(max(col("cum"))).head().getDecimal(0)
    assert(total === new java.math.BigDecimal(
      (BigInt(big) * 200 + (0 until 200).sum).toString))
  }

  test("ntileOf replicates Spark ntile at every (N, n) shape") {
    for (n <- Seq(2, 3, 4, 7); nRows <- Seq(1, 2, 3, 4, 5, 6, 7, 8, 30, 97)) {
      val df = (1 to nRows).map(i => (i.toLong, (i * 13 % 11).toLong))
        .toDF("id", "m")
      val w = Window.orderBy(col("m"), col("id"))
      val want = df.withColumn("want", ntile(n).over(w).cast("long"))
        .withColumn("rnk", row_number().over(w).cast("long"))
      val got = want.withColumn("got",
        Scan.ntileOf(col("rnk"), n, lit(nRows.toLong)))
      assert(got.filter(col("got") =!= col("want")).count() === 0,
        s"N=$nRows n=$n")
    }
  }

  test("pathological tie mass: one key holds half the frame, scan stays exact") {
    // Scan.scala's documented skew hazard made a property: an
    // order-respecting partition cannot split a tie group, so a
    // dominant key's rows are indivisible — they all land in ONE
    // bucket and serialize within it. Correctness must hold anyway
    // (ties share a bucket by construction, and the within-bucket
    // window orders by the full sort); the cost bound is that bucket's
    // size (here N/2 — the whole tie mass), which is why the
    // production call sites order by near-continuous keys and the
    // documented swap is compositing the tiebreak into the bucket key.
    val n = 400
    val df = (0 until n).map { i =>
      val k = if (i % 2 == 0) 100L else (i * 37 % 50).toLong
      (i.toLong, k, if (i % 5 == 0) -3L else 1L)
    }.toDF("id", "k", "v")
    val got = Scan.runningOver(df, v = col("k"), desc = false,
      order = Seq(col("k"), col("id")), outs = Seq(("run", col("v"))),
      nB = 8)
    val want = refRunning(df, Seq(col("k"), col("id")), col("v"))
    assert(got.join(want.select(col("id"), col("want")), Seq("id"))
      .filter(col("run") =!= col("want")).count() === 0)
    // the serialization bound: the ENTIRE tie mass carries one bucket
    // id (no boundary ever splits it), so the widest sequential step
    // is exactly the dominant key's row count
    val withB = Scan.withQuantileBucket(df, col("k"), desc = false,
      nB = 8)
    assert(withB.filter(col("k") === 100L)
      .select(col(Scan.BucketCol)).distinct().count() === 1)
  }

  test("multiple outs share one per-bucket window pass") {
    val df = (0 until 100).map(i => (i.toLong, (i % 9).toLong))
      .toDF("id", "v")
    val scanned = Scan.runningOver(df, col("v"), desc = false,
      Seq(col("v"), col("id")),
      Seq(("cnt", lit(1L)), ("tot", col("v"))), nB = 4)
    // correctness of both outs
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("wc", sum(lit(1L)).over(w))
      .withColumn("wt", sum(col("v")).over(w))
    assert(scanned.join(want, Seq("id"))
      .filter(col("cnt") =!= col("wc") || col("tot") =!= col("wt"))
      .count() === 0)
    // one WindowExec handles both running columns (plus the one
    // bounded offsets window over the totals frame)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.window.WindowExec
      val windows = scanned.queryExecution.executedPlan.collect {
        case we: WindowExec => we
      }
      assert(windows.length === 2, windows.mkString("\n"))
      // per-bucket = partitioned by the bucket ATTRIBUTE; the offsets
      // window's round-9 constant pmod(bucket, 1) key is nonEmpty too,
      // so a bare nonEmpty filter would match both
      val perBucket = windows.filter(_.partitionSpec.exists {
        case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference => a.name == graft.ops.Scan.BucketCol
        case _ => false
      })
      assert(perBucket.length === 1)
      assert(perBucket.head.windowExpression.length === 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Ev

/** Streaming/batch equivalence: every streaming transform is a pure
  * DataFrame function, so we feed the same events through a MemoryStream
  * (two micro-batches, out-of-order split) and through the batch path and
  * require identical results (complete/append semantics permitting).
  */
class StreamsSpec extends SparkSpec {

  private def sampleEvents(): Seq[Ev] = {
    val rows = graft.sources.Tables.t(spark, sf, "events")
      .filter(col("user_id") < 20)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
    rows.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
      r.getString(3), r.getDouble(4))).toSeq
  }

  private def runStream(evs: Seq[Ev], mode: String)
                       (xf: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val query = xf(mem.toDF()).writeStream
      .format("memory").queryName("out").outputMode(mode).start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    spark.table("out")
  }

  test("streaming tumbling counts equal the batch formulation (complete)") {
    val evs = sampleEvents()
    import spark.implicits._
    val got = runStream(evs, "complete")(Streams.tumbling)
      .orderBy("bucket", "event_type").collect().toSeq
    val want = Streams.tumbling(evs.toDF())
      .orderBy("bucket", "event_type").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming session windows equal the batch session_window (complete)") {
    val evs = sampleEvents()
    import spark.implicits._
    val got = runStream(evs, "complete")(Streams.sessions)
      .orderBy("user_id", "session_start_us").collect().toSeq
    val want = Streams.sessions(evs.toDF())
      .orderBy("user_id", "session_start_us").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark keeps one event per (user, type)") {
    // Single micro-batch: within one watermark horizon the dedup is
    // exact. (Across batches, state outside the 30-min horizon is
    // evicted by design — that bounded-state property is the point.)
    val evs = sampleEvents()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val query = Streams.dedupFirst(mem.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try { mem.addData(evs); query.processAllAvailable() }
    finally query.stop()
    val gotKeys = spark.table("dedup_out")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(gotKeys.distinct.length === gotKeys.length)
    assert(gotKeys.toSet ===
      evs.map(e => (e.user_id, e.event_type)).toSet)
  }

  test("file-source readStream + AvailableNow equals the batch tumbling query") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("ckpt").toString
    val streamed = Streams.tumbling(Streams.readEventsStream(spark, sf))
    val query = streamed.writeStream
      .format("memory").queryName("file_tumbling")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)
    val got = spark.table("file_tumbling")
      .orderBy("bucket", "event_type").collect().toSeq
    val want = graft.SparkEntry.queries("events_tumbling")(spark, sf)
      .select("bucket", "event_type", "n", "total").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join") {
    val evs = sampleEvents()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[Ev]
    val pMem = MemoryStream[Ev]
    val joined = Streams.viewPurchaseJoin(
      vMem.toDF().filter(col("event_type") === "view"),
      pMem.toDF().filter(col("event_type") === "purchase"))
    val query = joined.writeStream
      .format("memory").queryName("ss_join").outputMode("append").start()
    try {
      vMem.addData(evs); pMem.addData(evs)
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("ss_join")
      .orderBy("purchase_id", "view_id").collect().toSeq
    val batch = Streams.viewPurchaseJoin(
      evs.toDF().filter(col("event_type") === "view"),
      evs.toDF().filter(col("event_type") === "purchase"))
      .orderBy("purchase_id", "view_id").collect().toSeq
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("stream-static enrichment join equals the batch join (append)") {
    val evs = sampleEvents()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val customers = graft.sources.Tables.t(spark, sf, "customer")
    val mem = MemoryStream[Ev]
    val query = Streams.enrichWithSegment(mem.toDF(), customers)
      .writeStream
      .format("memory").queryName("enriched").outputMode("append").start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("enriched")
      .orderBy("event_id").collect().toSeq
    val batch = Streams.enrichWithSegment(evs.toDF(), customers)
      .orderBy("event_id").collect().toSeq
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val evs = sampleEvents()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val query = Streams.runningTotals(mem.toDS()).writeStream
      .format("memory").queryName("running").outputMode("append").start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    // last emitted row per user = final running state
    val finalRows = spark.table("running")
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = evs.groupBy(_.user_id).map { case (u, es) => u -> es.size.toLong }
    assert(finalRows === want)
  }
}

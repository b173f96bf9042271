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

  test("watermark advance evicts closed-window state (bounded state store)") {
    // the streaming scale guard: unbounded state is what kills a
    // streaming job at 100 TB/day, and the watermark is the eviction
    // contract. Fill the tumbling aggregate's state with many open
    // windows, then advance event time far past them all (+30 min
    // delay) — the state store must SHRINK, not accumulate forever.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2001-01-01 00:00:00").getTime
    def ev(id: Long, plusMin: Long) = Ev(id,
      new java.sql.Timestamp(base + plusMin * 60000L), id, "view", 1.0)
    val mem = MemoryStream[Ev]
    val query = Streams.tumbling(mem.toDF()).writeStream
      .format("memory").queryName("evict_out").outputMode("append").start()
    try {
      // 60 events over 10 hours → many distinct hour windows in state
      mem.addData((1L to 60L).map(i => ev(i, i * 10)))
      query.processAllAvailable()
      val filled = query.lastProgress.stateOperators.head.numRowsTotal
      assert(filled > 1, s"expected several open windows, got $filled")
      // one event 10 DAYS later closes every earlier window; a second
      // batch commits the eviction the advanced watermark allows
      mem.addData(Seq(ev(1000, 14400)))
      query.processAllAvailable()
      mem.addData(Seq(ev(1001, 14401)))
      query.processAllAvailable()
      val after = query.lastProgress.stateOperators.head.numRowsTotal
      assert(after < filled, s"state did not shrink: $filled -> $after")
    } finally query.stop()
  }

  test("watermarked dedup emits every event exactly once under replay") {
    val evs = sampleEvents()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.dedupWithinWatermark(mem.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      // batch 1 already contains a slice of batch 2 (early duplicates);
      // batch 2 replays a slice of batch 1 (at-least-once redelivery)
      mem.addData(b1 ++ b2.take(5)); q.processAllAvailable()
      mem.addData(b2 ++ b1.take(5)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got.length === got.distinct.length, "a duplicate survived")
    assert(got.toSet === evs.map(_.event_id).toSet)
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

  test("flatMapGroupsWithState running totals accumulate across batches") {
    // all events inside the idle horizon (10-minute span, two in-order
    // batches) so no state expires; cross-batch accumulation must equal
    // the per-user batch totals. Expiry itself is pinned by the next test.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, minutes: Long) =
      Ev(id, new java.sql.Timestamp(minutes * 60000L), uid, "click", 2.0)
    val evs = for (uid <- 1L to 3L; k <- 0L until 6L)
      yield ev(uid * 10 + k, uid, 600 + k)
    val mem = MemoryStream[Ev]
    val query = Streams.runningTotals(mem.toDS()).writeStream
      .format("memory").queryName("running").outputMode("append").start()
    try {
      val (b1, b2) = evs.sortBy(_.ts.getTime).splitAt(evs.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    // last emitted row per user = final running state
    val finalRows = spark.table("running")
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n"), max(col("total")).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(finalRows === Map(1L -> (6L, 12.0), 2L -> (6L, 12.0), 3L -> (6L, 12.0)))
  }

  test("running-total state expires on EventTimeTimeout and restarts from zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, minutes: Long) =
      Ev(id, new java.sql.Timestamp(minutes * 60000L), uid, "click", 1.0)
    val mem = MemoryStream[Ev]
    val query = Streams.runningTotals(mem.toDS()).writeStream
      .format("memory").queryName("expiry").outputMode("append").start()
    try {
      // batch 1: user 1 at t=10h. timeout armed at 10h30m.
      mem.addData(ev(1, 1L, 600)); query.processAllAvailable()
      // batch 2: user 2 at t=12h → watermark advances to 11h30m (delay
      // 30m), past user 1's timeout.
      mem.addData(ev(2, 2L, 720)); query.processAllAvailable()
      // batch 3: fires user 1's timeout (state removed) while user 2
      // keeps the watermark where it is.
      mem.addData(ev(3, 2L, 721)); query.processAllAvailable()
      // batch 4: user 1 returns at t=12h02 — expired state must restart
      // the count at 1, not continue at 2.
      mem.addData(ev(4, 1L, 722)); query.processAllAvailable()
    } finally query.stop()
    val u1 = spark.table("expiry").filter(col("user_id") === 1L)
      .select(col("n")).collect().map(_.getLong(0)).toSeq
    assert(u1 === Seq(1L, 1L), s"expected state expiry + restart, got $u1")
  }

  test("idempotent parquet sink survives a micro-batch replay without duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val evs = sampleEvents().take(40)
    val mem = MemoryStream[Ev]
    val query = Streams.idempotentParquetSink(mem.toDF(), s"$dir/out", ckpt)
    try {
      val (b1, b2) = evs.splitAt(20)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val once = spark.read.parquet(s"$dir/out")
    assert(once.count() === evs.length.toLong)
    assert(once.select(col("batch_id")).distinct().count() === 2L)
    // simulate the at-least-once replay window: re-deliver batch 0's data
    // with the same batch id — the partition overwrite must leave the
    // sink byte-identical, not append
    Streams.writeBatchIdempotent(evs.take(20).toDF(), 0L, s"$dir/out")
    val replayed = spark.read.parquet(s"$dir/out")
    assert(replayed.count() === evs.length.toLong)
    assert(replayed.select(col("event_id")).distinct().count() === evs.length.toLong)
  }

  test("streaming cdc state converges to the batch latest-state snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = sampleEvents()
    val mem = MemoryStream[Ev]
    val query = Streams.cdcLatestState(mem.toDS()).writeStream
      .format("memory").queryName("cdc").outputMode("update").start()
    try {
      // out-of-order delivery: second half first
      val (b1, b2) = evs.splitAt(evs.length / 2)
      mem.addData(b2); query.processAllAvailable()
      mem.addData(b1); query.processAllAvailable()
    } finally query.stop()
    // per-key final state = the max-version update emitted
    val got = spark.table("cdc").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(3), r.getLong(2), r.getDouble(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = SparkEntry.queries("events_cdc_upsert")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(3), r.getLong(2), r.getDouble(4))))
      .filter(k => evs.exists(e => e.user_id == k._1._1 &&
        e.event_type == k._1._2))
      .toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming anomaly scores equal the batch trailing-window query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // finalized daily counts, day-ordered per key — what the upstream
    // watermarked day window emits
    val daily = graft.sources.Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .count().orderBy(col("day"))
      .collect()
      .map(r => Streams.TypeDay(r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val mem = MemoryStream[Streams.TypeDay]
    val query = Streams.anomalyScores(mem.toDS()).writeStream
      .format("memory").queryName("zs").outputMode("append").start()
    try {
      val (b1, b2) = daily.splitAt(daily.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("zs").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val want = SparkEntry.queries("events_anomaly_zscore")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming as-of enrichment equals the batch as-of join in order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // event-time-ordered batches: the documented contract under which
    // the stream twin replays the batch operator exactly
    val evs = sampleEvents().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Ev]
    val query = Streams.asOfEnrich(mem.toDS()).writeStream
      .format("memory").queryName("asof_s").outputMode("append").start()
    try {
      evs.grouped((evs.length / 3).max(1)).foreach { b =>
        mem.addData(b); query.processAllAvailable()
      }
    } finally query.stop()
    val got = spark.table("asof_s").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val want = SparkEntry.queries("events_asof_custom")(spark, sf)
      .collect()
      .filter(r => evs.exists(_.event_id == r.getLong(0)))
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("as-of enrichment misses only views arriving after their purchase") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: Long, uid: Long, tpe: String) =
      Ev(id, new java.sql.Timestamp(t), uid, tpe, 1.0)
    val mem = MemoryStream[Ev]
    val query = Streams.asOfEnrich(mem.toDS()).writeStream
      .format("memory").queryName("asof_late").outputMode("append").start()
    try {
      // batch 1: the purchase at t=200 arrives BEFORE the t=100 view
      mem.addData(Seq(ev(2, 200000, 7, "purchase")))
      query.processAllAvailable()
      // batch 2: the late view + a second purchase that CAN see it
      mem.addData(Seq(ev(1, 100000, 7, "view"), ev(3, 300000, 7, "purchase")))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("asof_late").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got === Map(2L -> -1L, 3L -> 1L))
  }

  test("transformWithState spend totals run on RocksDB and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB provider — running it here
    // also pins that the bundled off-heap store works in this build
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val evs = sampleEvents()
      val mem = MemoryStream[Ev]
      val query = Streams.spendTotals(mem.toDS()).writeStream
        .format("memory").queryName("spend").outputMode("update").start()
      try {
        val (b1, b2) = evs.splitAt(evs.length / 2)
        mem.addData(b1); query.processAllAvailable()
        mem.addData(b2); query.processAllAvailable()
      } finally query.stop()
      // final emission per user = max n (counts only grow)
      val got = spark.table("spend")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n"), col("total_cents"))).as("s"))
        .select(col("user_id"), col("s.n"), col("s.total_cents"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = evs.groupBy(_.user_id).map { case (u, es) =>
        u -> ((es.size.toLong, es.map(e => math.round(e.value * 100)).sum))
      }
      assert(got === want)
      assert(got.nonEmpty)
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming heavy-hitter sketch converges to exact day counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // out-of-order batches: MG merge is commutative in the exact
    // regime, so arrival order must not matter
    val evs = sampleEvents()
    val (odd, even) = evs.partition(_.event_id % 2 == 1)
    val mem = MemoryStream[Ev]
    val query = Streams.heavyHittersStream(mem.toDS()).writeStream
      .format("memory").queryName("hitters").outputMode("update").start()
    try {
      mem.addData(even); query.processAllAvailable()
      mem.addData(odd); query.processAllAvailable()
    } finally query.stop()
    // the FINAL emission per day is the one with the largest surviving
    // mass (counts only grow in the exact regime — no decrement fires)
    val rows = spark.table("hitters").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val finalPerDay = rows.groupBy(_._1).map { case (day, v) =>
      val last = v.maxBy(_._3.sum)
      day -> last._2.zip(last._3).toMap
    }
    // exact regime (≤ 20 distinct users per day < k=64): the sketch IS
    // the exact per-day per-user count table, even through the weighted
    // per-batch pre-aggregation path
    val want = evs.groupBy(e => java.time.Instant.ofEpochMilli(e.ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
      .map { case (day, es) =>
        day -> es.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      }
    assert(finalPerDay === want)
    // and the batch driver query (FULL corpus) reports the same top-5
    // as a direct exact ranking of per-day per-user counts, with the
    // sketch's guarantee booleans TRUE on every probe row (they hold
    // under every merge tree, in both regimes)
    val full = graft.sources.Tables.t(spark, sf, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = SparkEntry.queries("stream_heavy_hitters")(spark, sf)
      .collect()
    val gotTop = got
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    got.foreach { r =>
      assert(r.getBoolean(4), s"est_le_true violated: $r")
      assert(r.getBoolean(5), s"within_bound violated: $r")
    }
    // the regime self-report equals the distinct-users-per-day <= k
    // predicate, per day
    val usersPerDay = full.groupBy(_._1).view.mapValues(_.map(_._2)
      .distinct.size).toMap
    got.foreach { r =>
      assert(r.getBoolean(6) ===
        (usersPerDay(r.getString(0)) <= Streams.HittersK), s"regime: $r")
    }
    val wantTop = full.groupBy(_._1).toSeq.flatMap { case (day, es) =>
      es.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (u, n) => (-n, u) }.take(5).zipWithIndex
        .map { case ((u, n), i) => (day, i + 1, u, n) }
    }.sortBy(t => (t._1, t._2))
    assert(gotTop.toSeq === wantTop)
  }

  test("streaming span probe converges to the batch crawl-probe result") {
    // the continuous-crawl form of substring dedup: new documents
    // arrive over two micro-batches and probe the STATIC corpus
    // k-gram index; the union of update-mode emissions must equal the
    // batch stream_span_probe query row for row (each doc arrives
    // whole in one batch, so its single emission is final)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val idx = graft.ops.Dedup.corpusKgramIndex(spark, sf)
    val mem = MemoryStream[(Long, String)]
    val query = Streams.spanProbe(
        mem.toDS().select(col("_1").as("doc_id"), col("_2").as("text")),
        idx)
      .writeStream.format("memory").queryName("span_probe")
      .outputMode("update").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    def rows(df: DataFrame) = df
      .select("doc_id", "n_tokens", "corpus_dup_tokens", "dup_fraction",
        "flag_near_dup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
      .toSet
    val got = rows(spark.table("span_probe"))
    val want = rows(SparkEntry.queries("stream_span_probe")(spark, sf))
    assert(want.nonEmpty) // the testdata's near-dup structure guarantees hits
    assert(got === want)
  }

  // ---- round 9: URL curation twins -----------------------------------

  test("streaming URL dedup drops cross-batch duplicates to state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real canonical frame, arrival order = doc_id order (its ts
    // contract); the 500-doc sf ts span (500 s) sits far inside the
    // 30-minute watermark delay, so nothing evicts mid-test
    val rowsIn = graft.ops.Curation
      .canonicalFrame(graft.sources.Tables.t(spark, sf, "documents"))
      .select("doc_id", "canonical", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = Streams.urlDedupStream(
        mem.toDS().select(col("_1").as("doc_id"),
          col("_2").as("canonical"), col("_3").as("ts")))
      .writeStream.format("memory").queryName("url_dedup")
      .outputMode("append").start()
    try {
      val (b1, b2) = rowsIn.splitAt(rowsIn.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("url_dedup")
      .select("canonical", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // keep-first == the oracle-checked batch min(doc_id) view
    val want = SparkEntry.queries("stream_url_dedup")(spark, sf)
      .select("canonical", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
    // the dedup BOUND: canonicals collide across the batch split
    // (doc_id % 40 path), so state must have dropped something
    assert(got.size < rowsIn.size,
      "no cross-batch duplicate existed - the state assertion is vacuous")
  }

  test("stateful domain cap continues counting across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def u(id: Long, dom: String) = Streams.UrlDoc(id, s"c$id", dom)
    val mem = MemoryStream[Streams.UrlDoc]
    val query = Streams.domainCapStream(mem.toDS(), cap = 3)
      .writeStream.format("memory").queryName("dom_cap")
      .outputMode("append").start()
    try {
      // batch 1: domain a takes 2 of its 3 slots; b takes 1
      mem.addData(Seq(u(1, "a"), u(2, "a"), u(10, "b")))
      query.processAllAvailable()
      // batch 2: a may emit ONE more (state = 2), then drops; a fresh
      // run without state would emit all three at ranks 1..3
      mem.addData(Seq(u(3, "a"), u(4, "a"), u(5, "a"), u(11, "b")))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("dom_cap")
      .select("domain", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 10L, 1L), ("b", 11L, 2L)))
  }
}

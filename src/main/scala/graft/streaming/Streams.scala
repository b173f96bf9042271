package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.functions.XF
import graft.sources.Tables.t

/** Structured Streaming surface over the `events` schema (SURVEY.md §2.6).
  *
  * The reference is a manually-triggered batch pipeline with no streaming
  * at all (reference Lab2ETL.py:100-108); this is the beyond-reference
  * stream surface, built so that EVERY transform is a pure function
  * `DataFrame => DataFrame` applicable to either a batch frame or a
  * `readStream` frame — the Spark-idiomatic way to keep streaming logic
  * testable (batch equivalence) and oracle-checkable (the batch form of
  * each query lives in [[graft.ops.Events]] / the `stream_*` queries
  * below).
  *
  * Scale design: watermarks bound all state. Windowed aggs keep one row
  * of state per (window, key) and drop it `delay` past the watermark;
  * session windows merge in-state; dedup state is one key per
  * (user, type) inside the watermark horizon. With ~1e9 active keys per
  * hour at 100 TB/day, state lives in the HDFS/RocksDB state store,
  * partitioned by groupBy key — the same shuffle partitioning as the
  * batch plan, so nothing here changes shape between modes.
  */
object Streams {

  val WatermarkDelay = "30 minutes"
  val SessionGap = "30 minutes"

  /** File-source stream over the events table: `readStream` with a
    * declared schema (required for file streams) + the same
    * nanos→micros conversion as the batch loader. In production the
    * directory accretes files and `maxFilesPerTrigger` paces ingestion;
    * `Trigger.AvailableNow` drains the backlog and stops — the pattern
    * for incremental batch over a growing 100 TB lake.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // readStream requires a declared schema (no inference pass), but the
    // testdata has shipped ts as both TIMESTAMP(NANOS)-as-long and native
    // TIMESTAMP(MICROS) — one driver-side footer read picks the vintage,
    // then the stream normalizes exactly like graft.sources.Tables.t.
    val rawTs = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", rawTs),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // table dir layout: one file per table
      .parquet(dir)
    rawTs match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  // ---- transform builders (mode-agnostic: batch or streaming input) ----

  /** Tumbling 10-minute per-type counts+totals (streaming twin of
    * `events_tumbling`).
    */
  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), XF.dsum(col("value")).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("bucket"),
        col("event_type"), col("n"), col("total"))

  /** Sliding 10-minute windows every 5 (twin of `events_sliding`). */
  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("bucket"),
        col("n"))

  /** Gap-based sessions via the native session_window operator: a session
    * closes after [[SessionGap]] of per-user inactivity. State merges
    * in-place in the state store; emits on watermark close.
    */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .groupBy(session_window(col("ts"), SessionGap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), XF.dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"), col("total_value"))

  /** Streaming dedup: first event per (user_id, event_type) within the
    * watermark horizon — state is dropped once the watermark passes, so
    * memory is bounded (twin of `events_dedup_first` when all data is in
    * horizon).
    */
  def dedupFirst(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** Stream-stream interval join: purchases matched to the same user's
    * views from the preceding 30 minutes. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * evict view state older than (watermark - 30 min) — the required
    * shape for an unbounded-input join to hold bounded state.
    * Mode-agnostic: works on batch frames too (plain interval join).
    */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", WatermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", WatermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Watermarked streaming dedup: `dropDuplicatesWithinWatermark` keeps
    * one row per event_id and holds each key's state ONLY until the
    * watermark passes its event time + delay — bounded state on an
    * unbounded stream, the at-least-once-ingest repair pass (plain
    * `dropDuplicates` on a stream would keep every key forever). Not a
    * driver oracle query: in batch mode the kept row per key is
    * partition-order-dependent; the contract is pinned by the
    * MemoryStream replay test in StreamsSpec instead.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))

  /** Stream-static enrichment join: the unbounded event stream joins a
    * static (batch) dimension — no state at all on the static side, the
    * dim is broadcast to every task and re-read per micro-batch if it
    * changes. The 100 TB pattern for attaching slowly-changing reference
    * data to a firehose; append-mode safe (inner join, no watermark
    * needed on the static side).
    */
  def enrichWithSegment(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
      col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"))

  // ---- sinks -----------------------------------------------------------

  /** One micro-batch of the idempotent sink: write under a batch_id
    * partition with DYNAMIC partition overwrite, so re-running the same
    * (batchId, data) replaces its own directory byte-identically instead
    * of appending duplicates. Factored out of the stream wiring so the
    * replay path is directly testable.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, path: String): Unit =
    // writer-scoped dynamic overwrite: only this batch's partition is
    // replaced. (The session-conf form would leak dynamic semantics to
    // any concurrent partitioned overwrite in the same session.)
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(path)

  /** Exactly-once parquet sink via `foreachBatch`: foreachBatch is
    * AT-LEAST-once (a crash between the sink write and the offset commit
    * replays the batch), so the write itself must be idempotent — here by
    * overwriting a batch_id partition ([[writeBatchIdempotent]]). This is
    * the 100 TB file-sink pattern when downstream readers are external
    * and the built-in parquet sink's _spark_metadata commit log can't be
    * honored; readers see whole batch directories, never partial files
    * (parquet job commit is atomic per directory).
    */
  def idempotentParquetSink(df: DataFrame, path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => writeBatchIdempotent(b, id, path))
      .start()

  // ---- custom state: flatMapGroupsWithState ---------------------------

  case class KeyState(user_id: Long, event_type: String,
    last_event_id: Long, last_us: Long, last_value: Double)

  /** STREAMING CDC UPSERT — the stateful-stream twin of the batch
    * `events_cdc_upsert`: state per (user, type) key is the current
    * latest row; each micro-batch folds its events in (µs, event_id)
    * order and emits the key's new state — an Update-mode changelog of
    * the latest-state table the batch query computes at rest. State is
    * one small row per live key (the store the batch compaction would
    * bootstrap); StreamsSpec pins final-state equality with the batch
    * query after an out-of-order two-batch replay.
    */
  def cdcLatestState(events: Dataset[Ev]): Dataset[KeyState] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), evs: Iterator[Ev],
         state: GroupState[KeyState]) =>
          // µs-exact event time (getTime alone is ms and would merge
          // same-millisecond versions the batch query distinguishes)
          def us(e: Ev): Long =
            e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
          val incoming = evs.toSeq.sortBy(e => (us(e), e.event_id))
          val next = incoming.foldLeft(state.getOption) { (cur, e) =>
            cur match {
              case Some(st) if st.last_us > us(e) ||
                (st.last_us == us(e) && st.last_event_id >= e.event_id) =>
                cur
              case _ => Some(KeyState(key._1, key._2, e.event_id, us(e),
                e.value))
            }
          }
          next match {
            case Some(st) if !state.getOption.contains(st) =>
              state.update(st); Iterator(st)
            case _ => Iterator.empty
          }
      }
  }

  case class TypeDay(event_type: String, day: String, n: Long)
  case class DayScore(event_type: String, day: String, n: Long,
    trailing_mean: Double, zscore: Double)

  /** STREAMING ANOMALY SCORER — the stateful-stream twin of the batch
    * `events_anomaly_zscore`: keyed by event_type, state is the last 7
    * finalized (day, count) rows (a few hundred bytes per key, bounded
    * by |types| keys — no timeout needed), and each incoming day is
    * scored against the trailing window BEFORE being appended to it, so
    * a day never contaminates its own baseline, exactly like the batch
    * frame's `ROWS -7 .. -1`.
    *
    * Input contract: finalized daily counts in day order per key — what
    * a watermarked tumbling-day aggregation in Append mode emits
    * upstream. Within a micro-batch, rows are sorted by day before
    * folding (a batch can carry several finalized days). StreamsSpec
    * drives it through MemoryStream and pins equality with the batch
    * query's scores.
    */
  def anomalyScores(daily: Dataset[TypeDay]): Dataset[DayScore] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState[Seq[(String, Long)], DayScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ty: String, rows: Iterator[TypeDay],
         state: GroupState[Seq[(String, Long)]]) =>
          var hist = state.getOption.getOrElse(Seq.empty)
          val out = rows.toSeq.sortBy(_.day).flatMap { r =>
            val scored =
              if (hist.length == 7) {
                val s1 = hist.map(_._2).sum.toDouble
                val s2 = hist.map(c => c._2.toDouble * c._2).sum
                val mean = s1 / 7.0
                val variance = (s2 - s1 * s1 / 7.0) / 6.0
                if (variance > 0)
                  Some(DayScore(ty, r.day, r.n,
                    BigDecimal(mean).setScale(6,
                      BigDecimal.RoundingMode.HALF_UP).toDouble,
                    BigDecimal((r.n - mean) / math.sqrt(variance)).setScale(6,
                      BigDecimal.RoundingMode.HALF_UP).toDouble))
                else None
              } else None
            hist = (hist :+ (r.day, r.n)).takeRight(7)
            scored
          }
          state.update(hist)
          out.iterator
      }
  }

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Idle gap after which a user's running-total state expires. */
  val RunningIdleMs: Long = 30L * 60 * 1000

  /** Per-user running totals with explicit state — the
    * `flatMapGroupsWithState` shape for semantics windows can't express
    * (here: emit an updated running total on every micro-batch).
    *
    * State is BOUNDED: EventTimeTimeout keyed off the watermark — each
    * update re-arms a timeout at (last event time + [[RunningIdleMs]]),
    * clamped above the current watermark as the API requires; once the
    * watermark passes it, the group fires with `hasTimedOut` and its
    * state is removed. Idle users therefore cost nothing beyond the
    * idle horizon — the contract an unbounded key space needs. A user
    * returning after expiry restarts from zero (by design: "running
    * total within the active horizon"); StreamsSpec pins both the
    * expiry and the restart.
    */
  def runningTotals(events: Dataset[Ev]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
            var n = prev.n
            var tot = prev.total
            var maxTs = Long.MinValue
            evs.foreach { e =>
              n += 1; tot += e.value
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            val next = UserRunning(uid, n, tot)
            state.update(next)
            state.setTimeoutTimestamp(
              math.max(maxTs + RunningIdleMs, state.getCurrentWatermarkMs + 1))
            Iterator(next)
          }
      }
  }

  case class AsOfMatch(purchase_id: Long, user_id: Long,
    view_id: Option[Long], gap_us: Option[Long])
  case class LatestView(view_id: Long, us: Long)

  /** STREAMING AS-OF ENRICHMENT — the stateful-stream twin of the
    * [[graft.plans.AsOfJoin]] batch operator: one event stream carries
    * both sides (views = the state-building side, purchases = the
    * enriched side), keyed by user; state is ONE latest-view row per
    * user (O(1) per key — the smallest possible as-of state), and each
    * purchase emits with the most recent view at-or-before its event
    * time. Within a micro-batch rows sort by event time, so intra-batch
    * order is exact; a view arriving in a LATER batch than a purchase
    * it precedes is missed — the documented arrival-order bound every
    * latest-state stream join has (the batch operator is the
    * replay-exact form; StreamsSpec pins equality when batches respect
    * event order, the same contract cdcLatestState tests).
    */
  def asOfEnrich(events: Dataset[Ev]): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    events.filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestView, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[LatestView]) =>
          def us(e: Ev): Long =
            e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
          val out = Seq.newBuilder[AsOfMatch]
          evs.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
            if (e.event_type == "view") {
              val better = state.getOption.forall(lv =>
                lv.us < us(e) || (lv.us == us(e) && lv.view_id < e.event_id))
              if (better) state.update(LatestView(e.event_id, us(e)))
            } else {
              val m = state.getOption.filter(_.us <= us(e))
              out += AsOfMatch(e.event_id, uid, m.map(_.view_id),
                m.map(us(e) - _.us))
            }
          }
          out.result().iterator
      }
  }

  case class UserSpend(user_id: Long, n: Long, total_cents: Long)

  /** TRANSFORM-WITH-STATE (Spark 4's arbitrary-state v2 API,
    * SPARK-46815): the successor to flatMapGroupsWithState — typed
    * state HANDLES (value/list/map) acquired by name in `init`, each
    * independently TTL-able and schema-evolvable, running only on the
    * RocksDB state-store provider (state lives off-heap/on-disk — the
    * 100 TB posture; StreamsSpec runs this under
    * RocksDBStateStoreProvider, which also pins that the bundled
    * RocksDB store actually works in this build). The processor keeps
    * one ValueState of exact (count, cents) per user and emits the
    * updated pair per batch — `runningTotals`' semantics on the new
    * API, with exact integer cents instead of float accumulation.
    */
  class SpendProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, UserSpend] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("spend",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserSpend] = {
      val prev = if (st.exists()) st.get() else (0L, 0L)
      var n = prev._1
      var cents = prev._2
      rows.foreach { e => n += 1; cents += math.round(e.value * 100) }
      st.update((n, cents))
      Iterator(UserSpend(key, n, cents))
    }
  }

  def spendTotals(events: Dataset[Ev]): Dataset[UserSpend] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SpendProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  case class DaySketch(day: String, users: Seq[Long], counts: Seq[Long])

  /** Counter budget for the heavy-hitter sketch — a genuine top-N
    * budget again (round 10). Rounds ≤9 escalated k to keep the per-day
    * key universe inside the exact regime (256→2048→16384 across three
    * scale-ups, each found the hard way by a sweep), which degenerated
    * the sketch into an exact counter whose state and per-partial merge
    * cost grew with data. The reshape retires that treadmill: a
    * per-(day, user) pre-aggregation bounds insert volume to distinct
    * keys, the sketch folds WEIGHTED items through the PODS'12 merge
    * path ([[graft.functions.MisraGriesWeightedAgg]]), and the verified
    * outputs are the two-sided guarantee booleans — deterministic in
    * BOTH regimes — plus the sketch's own `spills == 0` regime flag.
    * A further 10× cannot break the contract by construction.
    */
  val HittersK = 64

  /** STREAMING HEAVY HITTERS — the mergeable-sketch-as-stream-state
    * pattern: keyed by event day, state is ONE Misra-Gries counter set;
    * each micro-batch PRE-AGGREGATES its rows to per-user counts (the
    * same insert-volume bound the batch reshape applies corpus-wide:
    * the sketch folds each distinct key once, weighted), folds them
    * through the weighted PODS'12 path
    * ([[graft.functions.MisraGriesWeightedAgg]] — the same reduce/merge
    * the batch Aggregator runs) into a fresh partial, and MERGES it
    * into the held sketch, emitting the day's updated summary
    * (Update-mode changelog). State is k counters per day key
    * REGARDLESS of traffic — the reason a sketch, not a per-user count
    * map, is the right state shape for an unbounded key space. While
    * the day's distinct users fit k the sketch is in its exact regime
    * (no decrement ever fires), so the final emission per day holds the
    * exact per-user counts bit for bit — what StreamsSpec pins; past k
    * the PODS'12 two-sided bound takes over (the deterministic
    * guarantee booleans the batch `stream_heavy_hitters` emits), and
    * the sketch self-reports the regime via `spills == 0`.
    */
  def heavyHittersStream(events: Dataset[Ev], k: Int = HittersK)
      : Dataset[DaySketch] = {
    import events.sparkSession.implicits._
    val agg = new graft.functions.MisraGriesWeightedAgg(k)
    events
      .groupByKey(e => java.time.Instant.ofEpochMilli(e.ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
      .flatMapGroupsWithState[graft.functions.MgBuf, DaySketch](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (day: String, evs: Iterator[Ev],
         state: GroupState[graft.functions.MgBuf]) =>
          // micro-batch pre-aggregation: distinct users per (day, batch)
          // — the streaming form of the corpus-wide keyed pre-agg
          val counts = collection.mutable.LongMap.empty[Long]
          evs.foreach(e =>
            counts(e.user_id) = counts.getOrElse(e.user_id, 0L) + 1L)
          val batch = counts.iterator
            .foldLeft(agg.zero)((b, kv) => agg.reduce(b, kv))
          val merged = agg.merge(state.getOption.getOrElse(agg.zero), batch)
          state.update(merged)
          Iterator(DaySketch(day, merged.keys.toSeq, merged.counts.toSeq))
      }
  }

  /** Streaming twin of `dedup_span_incremental` — the continuous-crawl
    * form of substring dedup: a stream of newly crawled documents
    * probes the STATIC corpus K-gram index. Per micro-batch: a narrow
    * per-row pass builds each document's positional K-grams
    * ([[graft.ops.Dedup.kgramsOf]] — the SAME builder as the batch
    * family, so stream and batch cannot drift), a stream-static LEFT
    * SEMI join keeps the K-grams already present in the corpus
    * (stateless — the static side is a stored index at 100 TB,
    * Bloom-prunable, re-read per micro-batch if it changes), and one
    * per-doc aggregation collects the matched start positions
    * (update-mode state: one document-length-bounded row per doc).
    * The covered-token count is then ROW-LOCAL interval-union
    * arithmetic over the sorted starts — union([sᵢ, sᵢ+K-1]) =
    * K + Σ min(K, sᵢ₊₁ − sᵢ) — no distinct over exploded coverage
    * positions (a stateful dedup on an unbounded stream), no window.
    * Docs with zero corpus overlap emit nothing (a crawl gate acts on
    * flagged docs; silence means clean).
    */
  def spanProbe(newDocs: DataFrame, corpusIdx: DataFrame): DataFrame = {
    val k = graft.ops.Dedup.SpanK
    val ss = array_sort(col("starts"))
    val gaps = zip_with(
      slice(ss, lit(1), size(ss) - 1), slice(ss, lit(2), size(ss) - 1),
      (a, b) => least(lit(k.toLong), b - a))
    val covered = aggregate(gaps, lit(0L), (acc, x) => acc + x) + k
    val frac = col("corpus_dup_tokens").cast(DoubleType) /
      col("n_tokens").cast(DoubleType)
    graft.ops.Dedup.kgramsOf(newDocs)
      .join(corpusIdx, Seq("kh"), "left_semi")
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(collect_list(col("pos")).as("starts"))
      .select(col("doc_id"), col("n_tokens"),
        covered.as("corpus_dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("corpus_dup_tokens"),
        XF.r6(frac).as("dup_fraction"),
        (frac >= 0.5).as("flag_near_dup"))
  }

  // ---- URL curation twins (round 9) -----------------------------------

  case class UrlDoc(doc_id: Long, canonical: String, domain: String)
  case class CapOut(domain: String, doc_id: Long, rk: Long)

  /** Streaming canonical-URL dedup — the crawl-frontier filter: drop a
    * URL whose canonical form was already seen inside the watermark
    * horizon (`dropDuplicatesWithinWatermark` holds ONE state row per
    * canonical, evicted `delay` past its event time — bounded state on
    * an unbounded crawl). Input contract: (doc_id, canonical, ts)
    * (graft.ops.Curation.canonicalFrame). Keep-FIRST semantics: with
    * the frame's ts == arrival order == doc_id order, the survivor per
    * canonical is min(doc_id) — the batch `stream_url_dedup` query and
    * its oracle compute exactly that, and StreamsSpec pins the
    * two-batch MemoryStream run against it (cross-batch duplicates
    * die to STATE, not to in-batch grouping).
    */
  def urlDedupStream(docs: DataFrame): DataFrame =
    docs.withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark("canonical")
      .select(col("canonical"), col("doc_id"))

  /** Stateful per-domain document cap — curate_domain_caps' streaming
    * twin: admit a domain's documents in ARRIVAL order until the cap,
    * then drop (the batch form ranks by deterministic hash; a stream
    * cannot rank what it has not seen, so arrival order IS the
    * streaming keeper rule). One GroupState[Long] per domain — the
    * emitted-so-far count — lives forever but is bounded by |domains|,
    * a dimension-sized catalog, not the corpus. Within a micro-batch
    * the group sorts by doc_id (micro-batch iterator order is not an
    * event order; doc_id is this frame's arrival key), so replays are
    * deterministic. Runs in BATCH mode too (state starts empty, one
    * invocation per group) — which is exactly the oracle-checked
    * `stream_domain_cap` query.
    */
  def domainCapStream(docs: Dataset[UrlDoc], cap: Int): Dataset[CapOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.domain)
      .flatMapGroupsWithState[Long, CapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain, rows, state: GroupState[Long]) =>
          val emitted = state.getOption.getOrElse(0L)
          val take = (cap - emitted).max(0L).toInt
          val emit = rows.toSeq.sortBy(_.doc_id).take(take)
          if (emit.nonEmpty) state.update(emitted + emit.size)
          emit.iterator.zipWithIndex.map { case (u, i) =>
            CapOut(domain, u.doc_id, emitted + i + 1)
          }
      }
  }

  // ---- driver-contract batch-runnable queries -------------------------

  /** `session_window` also runs in batch mode — the same operator the
    * stream uses, hash-checkable against a DuckDB gaps-and-islands CTE.
    */
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "stream_session_window" -> ((s: SparkSession, d: String) =>
      sessions(t(s, d, "events"))
        .orderBy(col("user_id"), col("session_start_us"))),

    "stream_tumbling_batch" -> ((s: SparkSession, d: String) =>
      tumbling(t(s, d, "events"))
        .orderBy(col("bucket"), col("event_type"))),

    // stream-static enrichment in its batch form: purchase volume per
    // market segment via the broadcast dim join.
    "stream_static_join" -> ((s: SparkSession, d: String) =>
      enrichWithSegment(
        t(s, d, "events").filter(col("event_type") === "purchase"),
        t(s, d, "customer"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_purchases"),
          XF.dsum(col("value")).as("total_value"))
        .orderBy(col("c_mktsegment"))),

    // the stream-stream interval join in its batch form.
    "stream_interval_join" -> ((s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      viewPurchaseJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
        .orderBy(col("purchase_id"), col("view_id"))
    }),

    // the heavy-hitter sketch in its batch form, ROUND-10 RESHAPE: a
    // per-(day, user) pre-aggregation (map-side combinable — the raw
    // event mass collapses to distinct keys before any sketch sees it)
    // feeds BOTH the exact top-5 ranking and the weighted MG sketch
    // (k=64, a genuine top-N budget — see [[HittersK]]); the output is
    // the exact top-5 per day PLUS the sketch's deterministic
    // guarantee booleans evaluated at those probe keys:
    //   est_le_true:  est(user) ≤ true count        (never overcounts)
    //   within_bound: (true − est)·(k+1) ≤ N − S    (PODS'12, integer)
    //   exact_regime: the sketch's spills == 0 self-report, which is
    //     deterministically (distinct users/day ≤ k) — the flag a
    //     consumer reads to know whether estimates ARE counts
    // All three hold under EVERY merge tree, so the oracle computes the
    // exact ranking + the regime predicate and constant-TRUE bounds —
    // no k escalation can ever be needed again, at any scale.
    "stream_heavy_hitters" -> ((s: SparkSession, d: String) => {
      val mgw = udaf(
        new graft.functions.MisraGriesWeightedAgg(HittersK),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day"))
        .orderBy(col("n_events").desc, col("user_id"))
      val pre = t(s, d, "events")
        .select(XF.dateS(col("ts")).as("day"), col("user_id"))
        .groupBy(col("day"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val sk = pre.groupBy(col("day"))
        .agg(mgw(col("user_id"), col("n_events")).as("sk"),
          sum(col("n_events")).as("n_day"))
      val est = graft.functions.MisraGries.estimateCol(
        col("sk.keys"), col("sk.counts"), col("user_id"))
      val mass = graft.functions.MisraGries.massCol(col("sk.counts"))
      pre.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .join(broadcast(sk), Seq("day"))
        .select(col("day"), col("rank"), col("user_id"), col("n_events"),
          (est <= col("n_events")).as("est_le_true"),
          ((col("n_events") - est) * lit((HittersK + 1).toLong) <=
            col("n_day") - mass).as("within_bound"),
          (col("sk.spills") === 0L).as("exact_regime"))
        .orderBy(col("day"), col("rank"))
    }),

    // the crawl-probe in its batch form: the doc_id % 5 == 4 batch
    // probes the distinct corpus index — same split as
    // dedup_span_incremental, but hit-docs-only (stream semantics:
    // silence means clean) and interval-union coverage arithmetic.
    "stream_span_probe" -> ((s: SparkSession, d: String) =>
      spanProbe(
        t(s, d, "documents")
          .filter(pmod(col("doc_id"), lit(5)) === 4)
          .select(col("doc_id"), col("text")),
        graft.ops.Dedup.corpusKgramIndex(s, d))
        .orderBy(col("doc_id"))),

    // the URL dedup stream's steady-state view in batch form: with
    // ts == doc_id order, keep-first == min(doc_id) per canonical —
    // deterministic, so oracle-checkable (the stream operator itself
    // is pinned by the MemoryStream two-batch replay in StreamsSpec,
    // the house rule for order-dependent streaming state).
    "stream_url_dedup" -> ((s: SparkSession, d: String) =>
      graft.ops.Curation.canonicalFrame(t(s, d, "documents"))
        .groupBy(col("canonical"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_seen"))
        .orderBy(col("canonical"))),

    // the stateful domain cap run THROUGH the streaming operator in
    // batch mode (flatMapGroupsWithState with empty initial state) —
    // the plan really contains the stateful operator, and its output
    // equals the SQL window oracle because arrival order == doc_id.
    "stream_domain_cap" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val docs = graft.ops.Curation
        .canonicalFrame(t(s, d, "documents"))
        .select(col("doc_id"), col("canonical"), col("domain"))
        .as[UrlDoc]
      domainCapStream(docs, graft.ops.Curation.DomainCap).toDF()
        .orderBy(col("domain"), col("rk"))
    })
  )

  private val gapUs = 30L * 60 * 1000000

  val oracles: Seq[(String, String)] = Seq(
    // session_window semantics: a new session starts when the gap since
    // the previous event is >= the session gap (session_window intervals
    // are half-open [t, t+gap), so an exactly-gap-length pause closes).
    "stream_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, value, epoch_us(ts) AS us,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
         |           OVER (PARTITION BY user_id ORDER BY ts) >= $gapUs
         |           OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |s AS (
         |  SELECT user_id, value, us,
         |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM e)
         |SELECT user_id, MIN(us) AS session_start_us,
         |  COUNT(*) AS n_events, ${XF.dsumSql("value")} AS total_value
         |FROM s GROUP BY user_id, sess
         |ORDER BY user_id, session_start_us""".stripMargin,

    "stream_tumbling_batch" ->
      s"""SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M') AS bucket,
         |  event_type, COUNT(*) AS n, ${XF.dsumSql("value")} AS total
         |FROM events
         |GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "stream_static_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_purchases,
         |  ${XF.dsumSql("value")} AS total_value
         |FROM events JOIN customer ON user_id = c_custkey
         |WHERE event_type = 'purchase'
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "stream_interval_join" ->
      s"""SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
         |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
         |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         |JOIN (SELECT * FROM events WHERE event_type = 'view') v
         |  ON p.user_id = v.user_id
         | AND v.ts <= p.ts
         | AND v.ts >= p.ts - INTERVAL 30 MINUTE
         |ORDER BY purchase_id, view_id""".stripMargin,

    // exact per-day top-5; the sketch's guarantee booleans are
    // mathematically TRUE under every merge tree (PODS'12 two-sided
    // bound — est never overcounts, undercount ≤ (N−S)/(k+1)), and the
    // spills==0 regime flag is deterministically the
    // distinct-users-per-day ≤ k predicate, which the oracle computes
    // from the data (no k escalation needed at any scale).
    "stream_heavy_hitters" ->
      s"""WITH c AS (
         |  SELECT ${XF.dateSSql("ts")} AS day, user_id, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2),
         |nd AS (SELECT day, COUNT(*) AS n_users FROM c GROUP BY day),
         |r AS (
         |  SELECT day, user_id, n, row_number() OVER (
         |    PARTITION BY day ORDER BY n DESC, user_id) AS rank
         |  FROM c)
         |SELECT r.day, CAST(rank AS INTEGER) AS rank, user_id,
         |  n AS n_events, TRUE AS est_le_true, TRUE AS within_bound,
         |  (n_users <= $HittersK) AS exact_regime
         |FROM r JOIN nd ON nd.day = r.day
         |WHERE rank <= 5 ORDER BY r.day, rank""".stripMargin,

    // independent coverage derivation: the oracle unions the exploded
    // coverage POSITIONS (distinct + count) where the stream does
    // interval-union arithmetic over sorted starts — two different
    // computations of the same quantity.
    "stream_span_probe" -> {
      val k = graft.ops.Dedup.SpanK
      s"""WITH ${graft.ops.Dedup.dupStartsCteSql},
         |corpus AS (SELECT DISTINCT kh FROM kg WHERE doc_id % 5 <> 4),
         |hits AS (SELECT kg.doc_id, kg.pos FROM kg
         |         JOIN corpus USING (kh) WHERE kg.doc_id % 5 = 4),
         |cov AS (SELECT DISTINCT doc_id, pos + i AS cpos
         |        FROM hits, unnest(range(0, $k)) t(i)),
         |n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens
         |      FROM tkk WHERE doc_id % 5 = 4),
         |cv AS (SELECT doc_id, COUNT(*) AS covered FROM cov GROUP BY 1)
         |SELECT n.doc_id, n.n_tokens, cv.covered AS corpus_dup_tokens,
         |  ROUND(CAST(cv.covered AS DOUBLE) /
         |    CAST(n.n_tokens AS DOUBLE), 6) AS dup_fraction,
         |  (CAST(cv.covered AS DOUBLE) / CAST(n.n_tokens AS DOUBLE))
         |    >= 0.5 AS flag_near_dup
         |FROM cv JOIN n USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    // canonical rebuilt independently (lowercased host, query/fragment
    // dropped) — same independent-derivation rule as the curate_url_*
    // oracles, so a parse_url bug cannot self-cancel
    "stream_url_dedup" ->
      """WITH u AS (SELECT doc_id,
        |  lang || '.' || source || '.example.com/docs/' ||
        |    CAST(doc_id % 40 AS VARCHAR) AS canonical FROM documents)
        |SELECT canonical, MIN(doc_id) AS doc_id, COUNT(*) AS n_seen
        |FROM u GROUP BY canonical
        |ORDER BY canonical""".stripMargin,

    // arrival-order (doc_id) cap — the window twin of the stateful
    // operator; registered domain rebuilt independently
    "stream_domain_cap" -> {
      val cap = graft.ops.Curation.DomainCap
      s"""WITH u AS (SELECT doc_id, source || '.example.com' AS domain
         |  FROM documents),
         |r AS (SELECT domain, doc_id,
         |  CAST(row_number() OVER (PARTITION BY domain
         |    ORDER BY doc_id) AS BIGINT) AS rk FROM u)
         |SELECT domain, doc_id, rk FROM r WHERE rk <= $cap
         |ORDER BY domain, rk""".stripMargin
    }
  )
}

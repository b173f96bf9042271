package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.XF
import graft.sources.Tables.t

/** Training-data curation operators over `documents` — the corpus-hygiene
  * passes a large-scale pipeline runs between raw ingest and training:
  * benchmark-contamination detection, duplicated-passage discovery, and
  * within-document repetition scoring. (Beyond-reference surface per
  * SURVEY.md §2.8; the reference has no text processing at all.)
  *
  * Scale design:
  *   - Contamination: the benchmark side (held-out eval set) is tiny
  *     relative to the corpus, so its distinct shingle set is broadcast —
  *     the corpus-side scan streams against a hash set, no shuffle of
  *     corpus shingles. At 100 TB the corpus side stays embarrassingly
  *     parallel; only per-doc hit counts (≪ corpus size) shuffle.
  *   - Passage dedup: NON-overlapping fixed-width chunks (stride = width)
  *     instead of stride-1 shingles — k× less explode volume, the
  *     standard passage-granularity trade; one groupBy on the 8-byte
  *     chunk hash with map-side partial aggregation.
  *   - Repetition: explode → two-level aggregation; the (doc, token)
  *     key space is bounded by per-doc vocabulary, and the second
  *     aggregation reuses the first shuffle's partitioning (doc_id is a
  *     prefix of (doc_id, token)), so no second exchange.
  *   - Sampling (round 4): deterministic HASH-bucket sampling, never
  *     rand() — reproducible under task retry/speculation at any
  *     parallelism, re-runnable to the identical corpus (the property a
  *     training-data pipeline needs for ablations). Stratified rates are
  *     a narrow map-side filter (zero shuffle); the eval holdout is one
  *     window per stratum whose partitions are bounded by stratum size.
  *   - Mixture stats: aggregate first (groups = |lang|×|source|, tiny),
  *     THEN the corpus-share window over the aggregated frame — the
  *     single-partition window touches ~10² group rows, never the corpus.
  */
object Curation {

  /** Benchmark slice: one source partition plays the held-out eval set. */
  private val BenchSource = "src0"

  /** Contamination n-gram width: long enough that a hit means copied
    * text, not coincidence (5 works for the testdata's ~30-word vocab;
    * real corpora use 8-13).
    */
  private val ContamK = 5

  /** Passage width in tokens (non-overlapping). */
  private val ChunkW = 4

  /** A chunk present in this many distinct docs is boilerplate. */
  private val BoilerDocs = 2

  /** Sequence packing: shard fan-out and per-sequence token budget. */
  private val PackShards = 8
  private val PackBudget = 64

  /** Curation gate thresholds (tuned to split the testdata non-trivially:
    * ~9% too-short, ~48% low-diversity at sf0.01). */
  private val GateMinTokens = 20
  private val GateMinDiversity = 0.45

  /** Distinct k-token shingle hashes per doc via the
    * [[graft.functions.ShingleHashes]] generator (one JVM loop per doc,
    * longs downstream).
    */
  private def shingles(s: SparkSession, d: String, k: Int): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.ShingleHashes(col("text"), k))

  /** DuckDB twin of [[shingles]] for width `k` (same md5-slice hash). */
  private def shinglesSql(k: Int): String = {
    val cat = (0 until k).map(i => s"ws[i+$i]").mkString("||' '||")
    s"""SELECT DISTINCT doc_id, source,
       |       CAST(('0x' || substr(md5($cat), 1, 8)) AS BIGINT) AS s
       |  FROM (SELECT doc_id, source, string_split(text,' ') ws FROM documents) tk,
       |       unnest(range(1, len(ws)-${k - 2})) t(i)""".stripMargin
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // benchmark contamination: corpus docs sharing ≥1 distinct 5-gram
    // with the benchmark slice, with hit count and contaminated fraction.
    "text_contamination" -> ((s: SparkSession, d: String) => {
      val sh = shingles(s, d, ContamK)
      val bench = sh.filter(col("source") === BenchSource)
        .select(col("s")).distinct()
      val corpus = sh.filter(col("source") =!= BenchSource)
      val perDoc = corpus.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"))
      corpus.join(broadcast(bench), Seq("s"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .join(perDoc, Seq("doc_id"))
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          XF.r6(col("n_hits").cast(DoubleType) /
            col("n_shingles").cast(DoubleType)).as("contam_ratio"))
        .orderBy(col("doc_id"))
    }),

    // duplicated passages: non-overlapping 4-token chunk hashes occurring
    // more than once corpus-wide (the passage-granularity complement of
    // document-level dedup — catches boilerplate shared across otherwise
    // distinct docs).
    "text_chunk_dedup" -> ((s: SparkSession, d: String) => {
      // tokenize once per row behind a projection boundary — slice(ws)
      // inside the chunk lambda would re-run split() per chunk (the
      // same O(len²) pitfall text_surprisal hit; see that query's note)
      val ws = col("ws")
      // guard: sequence(0, -1) would DESCEND for a sub-width doc; emit an
      // empty chunk list instead.
      val chunkHashes = when(size(ws) >= ChunkW,
        transform(
          sequence(lit(0), (size(ws) / ChunkW).cast(IntegerType) - 1),
          i => XF.h32(concat_ws(" ", slice(ws, i * ChunkW + 1, lit(ChunkW))))))
        .otherwise(array().cast(ArrayType(LongType)))
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(chunkHashes).as("chunk_hash"))
        .groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occurrences") > 1)
        .orderBy(col("chunk_hash"))
    }),

    // C4-style boilerplate REMOVAL: chunks shared by >= BoilerDocs
    // distinct docs are cut from every document and the survivors are
    // reassembled in position order — the span-level EDIT whose
    // discovery half is text_chunk_dedup. Scale: the boilerplate set is
    // by construction small (high-frequency chunks), so it broadcasts;
    // the corpus side never shuffles its chunk strings — only the 8-byte
    // chunk hashes shuffle once to find the set, and the reassembly
    // groupBy shuffles (doc_id, pos, chunk) exactly once.
    "curate_boilerplate" -> ((s: SparkSession, d: String) => {
      val ws = col("ws")
      // CEIL-chunking, unlike text_chunk_dedup's floor: the EDIT must
      // cover every token, so the trailing sub-width remainder rides as
      // a short final chunk (slice clamps) and sub-width docs are one
      // whole-doc chunk — nothing outside the boilerplate set is lost.
      val nChunks = ((size(ws) + ChunkW - 1) / ChunkW).cast(IntegerType)
      val chunks = transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(ws, i * ChunkW + 1, lit(ChunkW))))
      val ch = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), posexplode(chunks).as(Seq("pos", "chunk")))
        .withColumn("chunk_hash", XF.h32(col("chunk")))
      val boiler = ch.groupBy(col("chunk_hash"))
        .agg(count_distinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= BoilerDocs)
        .select(col("chunk_hash"), lit(1).as("bp"))
      // collect_list drops the nulls the `when` leaves for removed
      // chunks; array_sort on (pos, chunk) structs restores doc order.
      ch.join(broadcast(boiler), Seq("chunk_hash"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("bp").isNotNull, 1L).otherwise(0L)).as("n_removed"),
          concat_ws(" ", transform(
            array_sort(collect_list(when(col("bp").isNull,
              struct(col("pos"), col("chunk"))))),
            c => c.getField("chunk"))).as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // within-document repetition: top-token frequency share per doc (the
    // cheap "is this doc a degenerate repeat loop" curation signal).
    "text_repetition" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"), max(col("tf")).as("top_freq"))
        .select(col("doc_id"), col("n_tokens"), col("top_freq"),
          XF.r6(col("top_freq").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("rep_ratio"))
        .orderBy(col("doc_id"))),

    // stratified mixture rebalancing: deterministic hash-bucket sampling
    // with a per-stratum keep rate (downsample the majority language to
    // 25%, keep the rest) — the reproducible way to reshape a training
    // mixture. Pure map-side filter: no rand(), no shuffle, identical
    // output under retry/speculation and across engines.
    "sample_stratified" -> ((s: SparkSession, d: String) => {
      val bucket = pmod(XF.h32(concat(lit("strat:"),
        col("doc_id").cast(StringType))), lit(100))
      val rate = when(col("lang") === "en", lit(25)).otherwise(lit(100))
      t(s, d, "documents")
        .withColumn("bucket", bucket)
        .filter(col("bucket") < rate)
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // eval-holdout carve: the k hash-smallest docs per language become
    // the held-out set — deterministic (salted hash order, doc_id
    // tie-break), stratum-balanced, and stable as the corpus grows at
    // the tail. One window per stratum; partitions bounded by stratum
    // size (use a hash-bucket pre-filter before the window at 100 TB so
    // the sort sees candidates, not the full corpus).
    "sample_eval_holdout" -> ((s: SparkSession, d: String) => {
      val hv = XF.h32(concat(lit("holdout:"), col("doc_id").cast(StringType)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("hv"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), hv.as("hv"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk").cast(LongType).as("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    }),

    // sequence PACKING — the concat-then-chunk step that turns a curated
    // corpus into fixed-budget training sequences: docs are hash-assigned
    // to shards, laid out in deterministic (doc_id) order within each
    // shard, and each doc is tagged with the sequence it starts in and
    // its token offset there. One window per shard: shard count scales
    // with the corpus (8 here; ~10^5 at 100 TB) so no partition ever
    // holds more than corpus/shards tokens — never a global window.
    "pack_sequences" -> ((s: SparkSession, d: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      t(s, d, "documents")
        .select(col("doc_id"),
          pmod(XF.h32(concat(lit("pack:"), col("doc_id").cast(StringType))),
            lit(PackShards)).as("shard"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          floor(col("start_tok").cast(DoubleType) / PackBudget)
            .cast(LongType).as("seq_id"),
          (col("start_tok") % PackBudget).as("tok_offset"))
        .orderBy(col("doc_id"))
    }),

    // WEIGHTED SYSTEMATIC (PPS) SAMPLE — probability-proportional-to-
    // size selection with INTEGER-EXACT arithmetic end to end: orders
    // weighted by exact long cents, laid on a deterministic
    // hash-shuffled global order (reproducible "randomness" — the same
    // no-rand() discipline as every sampler here), cumulative weight by
    // the DISTRIBUTED two-level scan (Scan.runningOver — never a global
    // single-task window), and a row is selected exactly when its
    // cumulative interval crosses a multiple of step = ⌊total/n⌋ (the
    // classic systematic PPS rule: inclusion probability w/step, the
    // Horvitz-Thompson readout ships as ht_weight). Every comparison is
    // TRUE long-integer floor division (Catalyst's IntegralDivide via
    // the SQL `div` function — not the double-division idiom, which is
    // only exact for operands ≤ 2^53 and would silently mis-place grid
    // boundaries once cumulative cents exceed that at corpus scale) —
    // no float, no transcendental, no cross-engine tie hazard. The
    // textbook alternative (Efraimidis-Spirakis u^(1/w) keys) needs
    // pow(); this form is the one that hash-compares bit-for-bit
    // across engines AND parallelism.
    "sample_weighted" -> ((s: SparkSession, d: String) => {
      def idiv(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =
        call_function("div", a, b)
      // no checkpoint on the input: its lineage is a 2-column pushed
      // scan + one md5 — cheaper to recompute for the scan's three
      // reads than to materialize
      val ob = t(s, d, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("w"),
          XF.h32(concat(lit("pps:"), col("o_orderkey").cast(StringType)))
            .as("hv"))
      // NO checkpoint on cum (round 17): the prefix-sum frame now has
      // exactly ONE consumer (the selection filter), so the former
      // eager localCheckpoint was a corpus-sized materialization job
      // paid inside every timed run only so the step derivation could
      // read max(cum) off blocks. sum(w) over the 2-column pushed scan
      // IS the same grand total (w ≥ 0 and cum is its prefix sum, so
      // max(cum) = Σw), at the cost of one map-side-combined scan
      // instead of a full window-pipeline materialization.
      val cum = Scan.runningOver(ob, v = col("hv"), desc = false,
        order = Seq(col("hv"), col("o_orderkey")),
        outs = Seq(("cum", col("w"))))
      // Degenerate-input guard: a
      // grand total under 1000 cents floors step to 0 — Spark's
      // comparisons against a null/zero step would silently return
      // ZERO rows while the DuckDB oracle errors on // 0; fail loudly
      // instead (the same discipline as Scan.withQuantileBucket's
      // null-key guard).
      val step = ob.agg(sum(col("w")).as("tw"))
        .select(when(col("tw") < 1000L, raise_error(lit(
            "sample_weighted: grand total weight under 1000 cents — " +
            "step = total div 1000 would be 0; the PPS grid needs " +
            "total ≥ target sample size")))
          .otherwise(idiv(col("tw"), lit(1000L)))
          .cast(LongType).as("s"))
      // ht_weight clamps at 1: a unit with w > step is a CERTAINTY
      // unit (inclusion probability 1) — selected once even though its
      // interval crosses several grid cells, so step/w < 1 would
      // understate its Horvitz-Thompson mass. (Not reachable in the
      // testdata, where max order ≪ step; the clamp makes the readout
      // correct if a heavy unit ever appears.)
      cum.crossJoin(broadcast(step))
        .filter(idiv(col("cum"), col("s")) >
          idiv(col("cum") - col("w"), col("s")))
        .select(col("o_orderkey"), col("w").as("weight_cents"),
          col("cum").as("cum_cents"),
          idiv(col("cum"), col("s")).as("grid_cell"),
          XF.r6(greatest(lit(1.0),
            col("s").cast(DoubleType) / col("w").cast(DoubleType)))
            .as("ht_weight"))
        .orderBy(col("o_orderkey"))
    }),

    // composite curation GATE: the single-scan keep/drop decision with
    // per-reason flags (length floor, token-diversity floor) — the final
    // filter step of a quality pipeline, kept embarrassingly parallel:
    // narrow codegen'd expressions, zero shuffles before the output sort.
    "curate_gate" -> ((s: SparkSession, d: String) => {
      val ws = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(ws).cast(LongType).as("n_tokens"),
          size(array_distinct(ws)).cast(LongType).as("n_distinct"))
        .withColumn("distinct_ratio",
          XF.r6(col("n_distinct").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)))
        .withColumn("too_short", col("n_tokens") < GateMinTokens)
        .withColumn("low_diversity", col("distinct_ratio") < GateMinDiversity)
        .withColumn("keep", !col("too_short") && !col("low_diversity"))
        .orderBy(col("doc_id"))
    }),

    // TEMPERATURE-flattened mixture weights: w_i ∝ p_i^α (α = 0.7) over
    // the per-(lang, source) char shares — the multinomial resampling
    // that upweights low-resource strata when balancing a training
    // mixture (the standard α-sampling knob of multilingual pretraining).
    // Same aggregate-first shape as doc_mixture_stats: everything after
    // the one corpus groupBy runs over ~|lang|×|source| rows. pow is
    // transcendental → rounded at 1e-6 before the normalization, whose
    // denominator is an exact decimal sum of the rounded values.
    "sample_temperature" -> ((s: SparkSession, d: String) => {
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_chars")).as("chars"))
        .withColumn("share", col("chars").cast(DoubleType) /
          sum(col("chars")).over(wAll).cast(DoubleType))
        .withColumn("praw", XF.r6(pow(col("share"), lit(0.7))))
        .withColumn("sample_weight", XF.r6(col("praw") /
          sum(col("praw").cast(DecimalType(28, 6))).over(wAll)
            .cast(DoubleType)))
        .select(col("lang"), col("source"),
          XF.r6(col("share")).as("char_share"),
          col("sample_weight"),
          XF.r6(col("sample_weight") / col("share")).as("upsample_factor"))
        .orderBy(col("lang"), col("source"))
    }),

    // mixture table: per-(lang, source) doc/char mass and corpus share —
    // the input to sampling-weight decisions. Char sums are exact longs;
    // the share window runs over the ~|lang|×|source| aggregated rows
    // (single tiny partition), never the corpus.
    "doc_mixture_stats" -> ((s: SparkSession, d: String) => {
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_sum"))
        .select(col("lang"), col("source"), col("n_docs"), col("n_chars_sum"),
          XF.r6(col("n_chars_sum").cast(DoubleType) /
            sum(col("n_chars_sum")).over(wAll).cast(DoubleType)).as("char_share"))
        .orderBy(col("lang"), col("source"))
    }),

    // END-TO-END CURATION PASS — the composed pipeline a pretraining
    // corpus actually runs, as ONE lazy DAG: quality gate (curate_gate
    // thresholds) → exact dedup among survivors (min doc_id per text
    // hash) → temperature mixture weights over the SURVIVING mass
    // (sample_temperature's α = 0.7) → deterministic hash sampling at
    // rate min(1, 2·w) per stratum. Per-stage counts per (lang, source)
    // are the output — the audit table a curation run reports. Shape:
    // two corpus shuffles (text-hash dedup, stratum agg); the weight
    // windows run over the ~|lang|×|source| frame; the sampling join
    // broadcasts the tiny weighted-strata table back onto survivors.
    // Every stage is deterministic (hash sampling, not rand()), so the
    // whole pipeline is reproducible under retry — and hash-checkable.
    "curate_pipeline_e2e" -> ((s: SparkSession, d: String) => {
      val ws = split(col("text"), " ")
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      // text is reduced to (hash, token counts) in the FIRST projection
      // and never shuffled; the reduced frame is materialized once —
      // four branches (stage counts, dedup, survivor mass, sampling)
      // consume it, and plan-level reuse does not cross branches, so
      // without the checkpoint the tokenize+md5 scan runs four times.
      val base = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("th"),
          size(ws).cast(LongType).as("n_tokens"),
          size(array_distinct(ws)).cast(LongType).as("n_distinct"))
        .withColumn("gated",
          col("n_tokens") >= GateMinTokens &&
            XF.r6(col("n_distinct").cast(DoubleType) /
              col("n_tokens").cast(DoubleType)) >= GateMinDiversity)
        .localCheckpoint()
      val kept = base.filter(col("gated"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("th")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      val aggAll = base.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("gated"), 1L).otherwise(0L)).as("n_gated"))
      val aggKept = kept.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_deduped"), sum(col("n_chars")).as("chars"))
      val strata = aggAll
        .join(aggKept, Seq("lang", "source"), "left")
        .na.fill(0L, Seq("n_deduped", "chars"))
        .withColumn("share", col("chars").cast(DoubleType) /
          sum(col("chars")).over(wAll).cast(DoubleType))
        .withColumn("praw", XF.r6(pow(col("share"), lit(0.7))))
        .withColumn("sample_weight", XF.r6(col("praw") /
          sum(col("praw").cast(DecimalType(28, 6))).over(wAll)
            .cast(DoubleType)))
        .withColumn("thr", least(
          round(col("sample_weight") * lit(2000000.0)).cast(LongType),
          lit(1000000L)))
      val sampled = kept
        .join(broadcast(strata.select(col("lang"), col("source"),
          col("thr"))), Seq("lang", "source"))
        .filter(pmod(XF.h32(concat(lit("e2e:"),
          col("doc_id").cast(StringType))), lit(1000000L)) < col("thr"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_sampled"))
      strata.join(sampled, Seq("lang", "source"), "left")
        .na.fill(0L, Seq("n_sampled"))
        .select(col("lang"), col("source"), col("n_raw"), col("n_gated"),
          col("n_deduped"), col("sample_weight"), col("n_sampled"))
        .orderBy(col("lang"), col("source"))
    }),

    // DSIR — data selection via importance resampling (Xie et al.,
    // NeurIPS'23): score every raw document by how much more likely its
    // hashed-unigram profile is under a TARGET distribution (the 'en'
    // slice, standing in for a trusted high-quality corpus) than under
    // the RAW corpus distribution. Features are the hashing trick's 64
    // dims (text_hash_features' device), so both distributions are
    // 64-row Laplace-smoothed tables; the per-doc log importance weight
    // is Σ_tokens [ln p_t(dim) − ln p_r(dim)]. Each ln is transcendental
    // → rounded at 1e-6 per dim (XF contract); the difference of two
    // rounded doubles is one IEEE subtraction, and the per-doc sum
    // accumulates as exact DECIMAL — engine- and order-stable. Scale
    // shape: the token frame is materialized ONCE (three consumers:
    // both count tables and the scoring join); the distributions
    // aggregate map-side to 64 cells and BROADCAST back, so scoring is
    // one explode + one broadcast join + one doc-keyed shuffle — no
    // corpus-sized state. At 100 TB the target table comes from a
    // sample of the trusted corpus (same 64 rows either way); the keep
    // flag (logw > 0) is the resampling gate — real DSIR samples
    // ∝ exp(logw), identical plan with the gate swapped for the
    // deterministic-hash sampler above.
    "curate_dsir" -> ((s: SparkSession, d: String) => {
      val w64 = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      // spread before the tokenize explode: the checkpointed frame
      // otherwise inherits the single-row-group scan's ONE partition
      // (the codec-stage rule, Multimodal.pngMedia); the doc-keyed
      // sum downstream is decimal (XF.dsum), so partial-sum grouping
      // is order-independent at any parallelism
      val tk = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          explode(Text.toks(col("text"))).as("token"))
        .select(col("doc_id"), col("lang"),
          (XF.h32(col("token")) % 64).as("dim"))
        .localCheckpoint()
      // BOTH distributions in ONE aggregation pass (round 17): the raw
      // and target counts formerly aggregated the token frame twice and
      // left-joined; a conditional count inside the same groupBy is
      // row-equivalent (count(when(en)) = 0 exactly where the left join
      // filled 0, and target dims are a subset of raw dims by
      // construction) and halves the reads of the checkpointed frame —
      // guide §2.3, aggregate before you shuffle / fewer passes.
      val lw = tk.groupBy(col("dim"))
        .agg(count(lit(1)).as("nr"),
          count(when(col("lang") === "en", 1)).as("nt"))
        .withColumn("tr", sum(col("nr")).over(w64))
        .withColumn("tt", sum(col("nt")).over(w64))
        .select(col("dim"),
          (XF.r6(log((col("nt") + 1).cast(DoubleType) /
              (col("tt") + 64).cast(DoubleType))) -
            XF.r6(log((col("nr") + 1).cast(DoubleType) /
              (col("tr") + 64).cast(DoubleType)))).as("lw"))
      tk.join(broadcast(lw), Seq("dim"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          XF.r6(XF.dsum(col("lw"))).as("logw"))
        .select(col("doc_id"), col("n_tokens"), col("logw"),
          (col("logw") > 0.0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ---- URL / domain curation (round 8) ------------------------------
    // The standard provenance knobs of a web-scale corpus: URL
    // canonicalization, exact URL dedup, per-domain document caps.
    // The testdata has no URL column, so a deterministic synthetic URL
    // derives from (doc_id, source, lang) — the geocode-mock device:
    // both engines CONSTRUCT the identical string; what's under test is
    // Spark's parse_url-based canonicalization recovering exactly the
    // parts the oracle rebuilds from the raw columns. Deliberate dirt:
    // an UPPERCASED subdomain on every third doc, a per-doc utm query +
    // fragment (stripped by canonicalization), and a path that collides
    // across docs of one source (doc_id % 40) so URL dedup has real
    // duplicates to find.

    // per-doc canonical form: lowercase host + path, scheme/query/
    // fragment stripped — a narrow map-only pass (parse_url is a
    // codegen'd Catalyst expression), zero shuffles before the sort.
    "curate_url_canonical" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("url", urlCol)
        .select(col("doc_id"), col("url"),
          lower(parse_url(col("url"), lit("HOST"))).as("domain"),
          concat(lower(parse_url(col("url"), lit("HOST"))),
            parse_url(col("url"), lit("PATH"))).as("canonical"))
        .orderBy(col("doc_id"))),

    // exact URL dedup after canonicalization: one hash-groupBy on the
    // canonical string (map-side partials collapse the unique mass —
    // the same shape as dedup_exact), keeper = min doc_id. At 100 TB
    // this is a single keyed shuffle of (canonical, doc_id) pairs.
    "curate_url_dedup" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("url", urlCol)
        .select(col("doc_id"),
          concat(lower(parse_url(col("url"), lit("HOST"))),
            parse_url(col("url"), lit("PATH"))).as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_urls"),
          min(col("doc_id")).as("keep_doc_id"))
        .filter(col("n_urls") > 1)
        .orderBy(col("canonical"))),

    // per-REGISTERED-domain document cap — the crawl-diversity knob
    // (no single site dominates the corpus): registered domain = last
    // three labels of the parsed host (subdomains collapse), keeper
    // rank by deterministic per-doc hash (never rand() — reproducible
    // under retry/speculation, same discipline as sample_cluster_cap),
    // cap at DomainCap. The window is bounded by per-domain document
    // count; a domain that outgrows a partition at 100 TB gets the
    // documented salt-shard treatment.
    "curate_domain_caps" -> ((s: SparkSession, d: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain")).orderBy(col("hb"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("url", urlCol)
        .select(col("doc_id"),
          substring_index(lower(parse_url(col("url"), lit("HOST"))),
            ".", -3).as("domain"),
          XF.h32(concat(lit("domcap:"), col("doc_id").cast(StringType)))
            .as("hb"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= DomainCap)
        .select(col("domain"), col("doc_id"),
          col("rk").cast(LongType).as("rk"))
        .orderBy(col("domain"), col("rk"))
    })
  )

  /** Per-domain keeper cap for `curate_domain_caps` (tuned so the cap
    * binds at sf0.01 — 25 docs per source-domain there — while every
    * domain still passes rows at sf0.001). Shared with the streaming
    * twin (graft.streaming.Streams `stream_domain_cap`).
    */
  private[graft] val DomainCap = 10

  /** Shared canonical-URL frame for the batch family above and the
    * round-9 streaming twins: (doc_id, canonical, domain, ts). The
    * synthetic event time `ts` = 2024-01-01 + doc_id seconds makes
    * arrival order == doc_id order, which is exactly what lets the
    * stream's keep-FIRST dedup semantics coincide with the
    * batch/oracle `min(doc_id)` form.
    */
  private[graft] def canonicalFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("lang"), col("source"))
      .withColumn("url", urlCol)
      .select(col("doc_id"),
        concat(lower(parse_url(col("url"), lit("HOST"))),
          parse_url(col("url"), lit("PATH"))).as("canonical"),
        substring_index(lower(parse_url(col("url"), lit("HOST"))),
          ".", -3).as("domain"),
        timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))

  /** The deterministic synthetic URL (see family comment above). */
  private def urlCol: org.apache.spark.sql.Column = concat(
    lit("https://"),
    when(pmod(col("doc_id"), lit(3)) === 0, upper(col("lang")))
      .otherwise(col("lang")),
    lit("."), col("source"), lit(".example.com/docs/"),
    pmod(col("doc_id"), lit(40)).cast(StringType),
    lit("?utm_source=feed&id="), col("doc_id").cast(StringType),
    lit("#top"))

  /** DuckDB twin of [[urlCol]] — the identical string, character for
    * character.
    */
  private val urlSql: String =
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN upper(lang) ELSE lang " +
    "END || '.' || source || '.example.com/docs/' || " +
    "CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&id=' || " +
    "CAST(doc_id AS VARCHAR) || '#top'"

  val oracles: Seq[(String, String)] = Seq(
    // the oracle's window runs the same (hv, key) global order; DuckDB's
    // // is floor division on positive longs = the Spark idiv form.
    "sample_weighted" ->
      s"""WITH ob AS (
         |  SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS w,
         |    ${XF.h32Sql("'pps:' || CAST(o_orderkey AS VARCHAR)")} AS hv
         |  FROM orders),
         |cw AS (SELECT o_orderkey, w,
         |         CAST(SUM(w) OVER (ORDER BY hv, o_orderkey) AS BIGINT)
         |           AS cum
         |       FROM ob),
         |tt AS (SELECT CAST(SUM(w) AS BIGINT) // 1000 AS s FROM ob)
         |SELECT o_orderkey, w AS weight_cents, cum AS cum_cents,
         |  cum // s AS grid_cell,
         |  ROUND(GREATEST(1.0, CAST(s AS DOUBLE) / CAST(w AS DOUBLE)), 6)
         |    AS ht_weight
         |FROM cw, tt
         |WHERE cum // s > (cum - w) // s
         |ORDER BY o_orderkey""".stripMargin,

    "text_contamination" ->
      s"""WITH sh AS (${shinglesSql(ContamK)}),
         |bench AS (SELECT DISTINCT s FROM sh WHERE source = '$BenchSource'),
         |corpus AS (SELECT doc_id, s FROM sh WHERE source <> '$BenchSource'),
         |per_doc AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS n_hits
         |  FROM corpus JOIN bench USING (s) GROUP BY doc_id)
         |SELECT doc_id, n_shingles, n_hits,
         |  ${XF.r6Sql("CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE)")} AS contam_ratio
         |FROM hits JOIN per_doc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "text_chunk_dedup" -> {
      val cat = (0 until ChunkW).map(i => s"ws[i*$ChunkW+${i + 1}]").mkString("||' '||")
      s"""WITH ch AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5($cat), 1, 8)) AS BIGINT) AS chunk_hash
         |  FROM (SELECT doc_id, string_split(text,' ') ws FROM documents) tk,
         |       unnest(range(0, CAST(floor(len(ws) / $ChunkW) AS BIGINT))) t(i))
         |SELECT chunk_hash, COUNT(*) AS n_occurrences,
         |  COUNT(DISTINCT doc_id) AS n_docs
         |FROM ch GROUP BY chunk_hash HAVING COUNT(*) > 1
         |ORDER BY chunk_hash""".stripMargin
    },

    "curate_boilerplate" -> {
      // list slicing clamps at the end exactly like Spark's slice, so
      // the ceil-range tail chunk carries the sub-width remainder
      val cat = s"array_to_string(ws[i*$ChunkW+1 : i*$ChunkW+$ChunkW], ' ')"
      s"""WITH ch AS (
         |  SELECT doc_id, pos, chunk,
         |    ${graft.functions.XF.h32Sql("chunk")} AS chunk_hash
         |  FROM (SELECT doc_id, i AS pos, $cat AS chunk
         |        FROM (SELECT doc_id, string_split(text,' ') ws FROM documents) tk,
         |             unnest(range(0, CAST(ceil(len(ws) / CAST($ChunkW AS DOUBLE)) AS BIGINT))) t(i))),
         |b AS (SELECT chunk_hash FROM ch GROUP BY chunk_hash
         |      HAVING COUNT(DISTINCT doc_id) >= $BoilerDocs)
         |SELECT ch.doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN b.chunk_hash IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |  COALESCE(string_agg(CASE WHEN b.chunk_hash IS NULL THEN ch.chunk END,
         |                      ' ' ORDER BY ch.pos), '') AS clean_text
         |FROM ch LEFT JOIN b ON ch.chunk_hash = b.chunk_hash
         |GROUP BY ch.doc_id ORDER BY doc_id""".stripMargin
    },

    "text_repetition" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token
        |        FROM documents)
        |  GROUP BY doc_id, token)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, MAX(tf) AS top_freq,
        |  ROUND((CAST(MAX(tf) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)), 6) AS rep_ratio
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang, source, bucket
         |FROM (SELECT doc_id, lang, source,
         |        ${XF.h32Sql("'strat:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |      FROM documents)
         |WHERE bucket < (CASE WHEN lang = 'en' THEN 25 ELSE 100 END)
         |ORDER BY doc_id""".stripMargin,

    "sample_eval_holdout" ->
      s"""SELECT lang, rk, doc_id FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
         |  FROM (SELECT lang, doc_id,
         |          ${XF.h32Sql("'holdout:' || CAST(doc_id AS VARCHAR)")} AS hv
         |        FROM documents))
         |WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin,

    // window SUM over BIGINT is HUGEINT in DuckDB (renders float64 via
    // pandas) — cast back to BIGINT before the arithmetic.
    "pack_sequences" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    ${XF.h32Sql("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cum AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - n_tokens AS start_tok
         |  FROM base)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(FLOOR(CAST(start_tok AS DOUBLE) / CAST($PackBudget AS DOUBLE)) AS BIGINT) AS seq_id,
         |  start_tok % $PackBudget AS tok_offset
         |FROM cum ORDER BY doc_id""".stripMargin,

    "curate_gate" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, n_tokens, n_distinct,
         |    ROUND(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS distinct_ratio
         |  FROM g)
         |SELECT doc_id, lang, n_tokens, n_distinct, distinct_ratio,
         |  n_tokens < $GateMinTokens AS too_short,
         |  distinct_ratio < CAST($GateMinDiversity AS DOUBLE) AS low_diversity,
         |  (NOT (n_tokens < $GateMinTokens))
         |    AND (NOT (distinct_ratio < CAST($GateMinDiversity AS DOUBLE))) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "sample_temperature" ->
      """WITH g AS (
        |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY lang, source),
        |sh AS (
        |  SELECT lang, source,
        |    CAST(chars AS DOUBLE) / CAST(SUM(chars) OVER () AS DOUBLE) AS share
        |  FROM g),
        |pr AS (
        |  SELECT lang, source, share,
        |    ROUND(pow(share, CAST(0.7 AS DOUBLE)), 6) AS praw FROM sh),
        |w AS (
        |  SELECT lang, source, share, praw,
        |    ROUND(praw / CAST(SUM(CAST(praw AS DECIMAL(28,6))) OVER ()
        |      AS DOUBLE), 6) AS sample_weight
        |  FROM pr)
        |SELECT lang, source, ROUND(share, 6) AS char_share, sample_weight,
        |  ROUND(sample_weight / share, 6) AS upsample_factor
        |FROM w ORDER BY lang, source""".stripMargin,

    "doc_mixture_stats" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, source, n_docs, n_chars_sum,
        |  ROUND(CAST(n_chars_sum AS DOUBLE) /
        |    CAST(SUM(n_chars_sum) OVER () AS DOUBLE), 6) AS char_share
        |FROM g ORDER BY lang, source""".stripMargin,

    "curate_pipeline_e2e" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang, source, n_chars, text,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text,' '))) AS BIGINT)
         |      AS n_distinct
         |  FROM documents),
         |f AS (
         |  SELECT *, (n_tokens >= $GateMinTokens AND
         |    ROUND(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         |      >= CAST($GateMinDiversity AS DOUBLE)) AS gated
         |  FROM g),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT doc_id, lang, source, n_chars,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
         |        AS rn
         |    FROM f WHERE gated) WHERE rn = 1),
         |aa AS (
         |  SELECT lang, source, COUNT(*) AS n_raw,
         |    CAST(SUM(CASE WHEN gated THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_gated
         |  FROM f GROUP BY 1, 2),
         |ak AS (
         |  SELECT lang, source, COUNT(*) AS n_deduped,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars
         |  FROM kept GROUP BY 1, 2),
         |st AS (
         |  SELECT aa.lang, aa.source, n_raw, n_gated,
         |    COALESCE(n_deduped, 0) AS n_deduped,
         |    COALESCE(chars, 0) AS chars
         |  FROM aa LEFT JOIN ak ON aa.lang = ak.lang
         |    AND aa.source = ak.source),
         |w1 AS (
         |  SELECT *, CAST(chars AS DOUBLE) /
         |    CAST(SUM(chars) OVER () AS DOUBLE) AS share FROM st),
         |w2 AS (
         |  SELECT *, ROUND(pow(share, CAST(0.7 AS DOUBLE)), 6) AS praw
         |  FROM w1),
         |w3 AS (
         |  SELECT *, ROUND(praw / CAST(SUM(CAST(praw AS DECIMAL(28,6)))
         |    OVER () AS DOUBLE), 6) AS sample_weight FROM w2),
         |w4 AS (
         |  SELECT *, LEAST(CAST(round(sample_weight *
         |    CAST(2000000 AS DOUBLE)) AS BIGINT), 1000000) AS thr FROM w3),
         |sm AS (
         |  SELECT kept.lang, kept.source, COUNT(*) AS n_sampled
         |  FROM kept JOIN w4 ON kept.lang = w4.lang
         |    AND kept.source = w4.source
         |  WHERE ${XF.h32Sql("'e2e:' || CAST(kept.doc_id AS VARCHAR)")}
         |    % 1000000 < thr
         |  GROUP BY 1, 2)
         |SELECT w4.lang, w4.source, n_raw, n_gated, n_deduped,
         |  sample_weight, COALESCE(sm.n_sampled, 0) AS n_sampled
         |FROM w4 LEFT JOIN sm ON w4.lang = sm.lang AND w4.source = sm.source
         |ORDER BY w4.lang, w4.source""".stripMargin,

    // same 64-dim hashed-unigram distributions, same per-dim 1e-6 ln
    // rounding, exact-decimal per-doc sum
    "curate_dsir" -> {
      val logw = s"ROUND(CAST(SUM(CAST(lw AS DECIMAL(28,6))) AS DOUBLE), 6)"
      s"""WITH tk AS (
         |  SELECT doc_id, lang, ${XF.h32Sql("token")} % 64 AS dim
         |  FROM (SELECT doc_id, lang, unnest(string_split(text,' ')) AS token
         |        FROM documents)),
         |raw AS (SELECT dim, COUNT(*) AS nr FROM tk GROUP BY 1),
         |tgt AS (SELECT dim, COUNT(*) AS nt
         |        FROM tk WHERE lang = 'en' GROUP BY 1),
         |dims AS (
         |  SELECT dim, nr, COALESCE(nt, 0) AS nt,
         |    SUM(nr) OVER () AS tr, SUM(COALESCE(nt, 0)) OVER () AS tt
         |  FROM raw LEFT JOIN tgt USING (dim)),
         |lwt AS (
         |  SELECT dim,
         |    ROUND(ln(CAST(nt + 1 AS DOUBLE) / CAST(tt + 64 AS DOUBLE)), 6) -
         |    ROUND(ln(CAST(nr + 1 AS DOUBLE) / CAST(tr + 64 AS DOUBLE)), 6)
         |      AS lw
         |  FROM dims)
         |SELECT doc_id, COUNT(*) AS n_tokens, $logw AS logw,
         |  $logw > CAST(0 AS DOUBLE) AS keep
         |FROM tk JOIN lwt USING (dim)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // URL family oracles: the oracle REBUILDS the canonical parts
    // straight from the raw columns (lower(upper(lang)) = lang, the
    // path is doc_id % 40 by construction) — an independent derivation,
    // so a Spark-side parse_url mistake cannot cancel out.
    "curate_url_canonical" ->
      s"""SELECT doc_id, $urlSql AS url,
         |  lang || '.' || source || '.example.com' AS domain,
         |  lang || '.' || source || '.example.com/docs/' ||
         |    CAST(doc_id % 40 AS VARCHAR) AS canonical
         |FROM documents ORDER BY doc_id""".stripMargin,

    "curate_url_dedup" ->
      s"""WITH u AS (SELECT doc_id,
         |  lang || '.' || source || '.example.com/docs/' ||
         |    CAST(doc_id % 40 AS VARCHAR) AS canonical FROM documents)
         |SELECT canonical, COUNT(*) AS n_urls, MIN(doc_id) AS keep_doc_id
         |FROM u GROUP BY canonical HAVING COUNT(*) > 1
         |ORDER BY canonical""".stripMargin,

    "curate_domain_caps" ->
      s"""WITH u AS (SELECT doc_id, source || '.example.com' AS domain,
         |    ${XF.h32Sql("'domcap:' || CAST(doc_id AS VARCHAR)")} AS hb
         |  FROM documents),
         |r AS (SELECT domain, doc_id,
         |  CAST(row_number() OVER (PARTITION BY domain ORDER BY hb,
         |    doc_id) AS BIGINT) AS rk FROM u)
         |SELECT domain, doc_id, rk FROM r WHERE rk <= $DomainCap
         |ORDER BY domain, rk""".stripMargin
  )
}

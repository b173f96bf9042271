package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.XF
import graft.sources.Tables.t

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language-ID, quality scoring, token
  * counting, document fingerprinting) mandated beyond the reference's own
  * operators (reference has no text ops at all; its only string work is
  * the address concat at Lab2ETL.py:69).
  *
  * Scale design: everything here is a single scan + narrow per-row
  * expressions (codegen'd `functions._`, no UDFs) or one explode+groupBy
  * (token frequency — partial aggregation map-side, one shuffle on the
  * token key). At 100 TB the explode output is bounded by total token
  * count; the groupBy key space (vocab) is small, so partial aggs collapse
  * almost everything before the shuffle.
  */
object Text {

  /** Tokens of `text` (single-space separated in the testdata). */
  def toks(c: Column): Column = split(c, " ")
  def toksSql(e: String): String = s"string_split($e, ' ')"

  /** Occurrence count of exactly-equal token `w`. */
  private def tokCount(c: Column, w: String): Column =
    size(filter(toks(c), x => x === lit(w)))
  private def tokCountSql(e: String, w: String): String =
    s"len(list_filter(${toksSql(e)}, x -> x = '$w'))"

  // Stopword-profile language-ID: score = stopword hits per token.
  // (Deterministic n-gram-free heuristic; real corpora would use char
  // n-gram profiles — same plan shape, more markers.)
  private val markers = Seq("the", "a", "data", "spark")

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // token counting: whitespace tokenization + distinct counts, pure
    // per-row array expressions (single scan, no shuffle until sort).
    "text_token_stats" -> ((s: SparkSession, d: String) => {
      val ws = toks(col("text"))
      t(s, d, "documents")
        .select(
          col("doc_id"),
          col("n_chars"),
          size(ws).as("n_tokens"),
          size(array_distinct(ws)).as("n_distinct"),
          ((col("n_chars") - (size(ws) - lit(1))).cast(DoubleType) /
            size(ws).cast(DoubleType)).as("avg_token_len"))
        .orderBy(col("doc_id"))
    }),

    // corpus token frequency: explode → hash agg (map-side partial
    // collapses to vocab size before the single shuffle).
    "text_token_freq" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(explode(toks(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))),

    // FEATURE HASHING (the hashing trick): each token folds into one of
    // 64 fixed dimensions by hash — a vocabulary-independent sparse
    // bag-of-words embedding, the classic featurization when the vocab
    // is unbounded (no dictionary broadcast, no OOV handling, fixed
    // width at any corpus size). One explode + one (doc, dim) groupBy
    // with map-side partials; key space = docs × 64, never docs × vocab.
    "text_hash_features" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("doc_id"), (XF.h32(col("token")) % 64).as("dim"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("dim"))),

    // POSITIONAL CO-OCCURRENCE LIFT — the skip-gram-window statistic
    // behind embedding training and collocation mining: ordered token
    // pairs within a 3-token window, scored by lift
    // n_co·N / (n_w1·n_w2) (the integer-exact association measure —
    // market-basket's device; no transcendental ln, so no cross-libm
    // PMI hazard). The window join is the EQUI form: each token
    // explodes to its 3 forward offsets and joins on (doc, position) —
    // 3N rows a side, never the per-doc len² self-join (the oracle
    // keeps the theta form, fine at oracle scale). Margins are
    // vocab-bounded and join back onto the floor-filtered pair set.
    "text_cooc_lift" -> ((s: SparkSession, d: String) => {
      // Round 17 (guide §2.4, remove shuffles outright): the (doc, pos)
      // window pairs are generated PER DOCUMENT from the token array —
      // for k = 1..3, zip the array against itself shifted by k — the
      // identical (w[i], w[i+k]) multiset the former positional
      // self-join produced, with NO equi-join on (doc_id, p2) (which
      // shuffled 3N probe + N index rows), NO checkpointed positional
      // frame (an eager corpus-sized materialization inside every timed
      // run), and map-side partial aggregation collapsing the pair
      // stream to the vocab²-bounded count table before its single
      // exchange. The tokenized array sits behind a projection boundary
      // (non-cheap alias, multiply referenced — CollapseProject keeps
      // it) so split() runs once per row, not once per slice.
      val n = size(col("ws"))
      def pairsAt(k: Int) = zip_with(
        slice(col("ws"), lit(1), greatest(n - k, lit(0))),
        slice(col("ws"), lit(k + 1), greatest(n - k, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val pairs = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(toks(col("text")).as("ws"))
        .select(explode(concat(pairsAt(1), pairsAt(2), pairsAt(3)))
          .as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 10L)
      // margins from ONE more corpus pass, materialized once (the
      // vocab-bounded count table — same tiny-table rule as
      // text_surprisal's cBi): both margin joins and the total read it
      // as blocks, so the corpus is scanned exactly twice end to end.
      val nw = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(toks(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("nw"))
        .localCheckpoint()
      // Σ nw IS the total token count — no third corpus pass.
      val total = nw.agg(sum(col("nw")).as("n_total"))
      pairs
        .join(broadcast(nw.select(col("w").as("w1"), col("nw").as("nw1"))),
          Seq("w1"))
        .join(broadcast(nw.select(col("w").as("w2"), col("nw").as("nw2"))),
          Seq("w2"))
        .crossJoin(broadcast(total))
        .select(col("w1"), col("w2"), col("n_co"),
          XF.r6((col("n_co").cast(DoubleType) *
              col("n_total").cast(DoubleType)) /
            (col("nw1").cast(DoubleType) * col("nw2").cast(DoubleType)))
            .as("lift"))
        .orderBy(col("n_co").desc, col("w1"), col("w2"))
    }),

    // LINEAR QUALITY CLASSIFIER over hashed features — the fastText-shape
    // inference pass a curation pipeline runs per document: each token
    // folds into one of 64 hashed dimensions (same trick as
    // text_hash_features), a fixed 64-entry integer weight vector scores
    // it, and the sign of the exact integer score is the keep/drop
    // verdict. The weight "model" here is a deterministic pseudo-model
    // (w(dim) = h32("w:"+dim) % 2001 − 1000 ∈ [−1000, 1000]) so both
    // engines derive identical weights with no artifact file; a real
    // deployment broadcasts a trained w[64] — identical plan. Scale
    // shape: weights are a pure function of the token (no join), so
    // scoring is ONE explode + ONE doc_id groupBy with map-side partials
    // — a single shuffle keyed by doc, entirely codegen'd, and the
    // integer score is bit-identical at any parallelism.
    "text_classify" -> ((s: SparkSession, d: String) => {
      val dim = XF.h32(col("token")) % 64
      val w = (XF.h32(concat(lit("w:"), dim.cast(StringType))) % 2001) -
        lit(1000L)
      t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .select(col("doc_id"), w.as("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("w")).as("score_u"), count(lit(1)).as("n_tokens"))
        .select(col("doc_id"), col("score_u"),
          XF.r6(col("score_u").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("avg_token_w"),
          (col("score_u") > 0L).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // quality scoring: length / distinct-ratio / stopword-ratio buckets.
    "text_quality" -> ((s: SparkSession, d: String) => {
      val ws = toks(col("text"))
      val nTok = size(ws).cast(DoubleType)
      val stopRatio =
        (tokCount(col("text"), "the") + tokCount(col("text"), "a"))
          .cast(DoubleType) / nTok
      val distinctRatio = size(array_distinct(ws)).cast(DoubleType) / nTok
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          nTok.as("n_tokens"),
          round(stopRatio, 6).as("stopword_ratio"),
          round(distinctRatio, 6).as("distinct_ratio"),
          when(nTok < 32.0, "short")
            .when(distinctRatio < 0.35, "repetitive")
            .otherwise("ok").as("quality"))
        .orderBy(col("doc_id"))
    }),

    // language-ID: argmax over marker-word scores, compared to the label.
    "text_langid" -> ((s: SparkSession, d: String) => {
      val scores = markers.map(w => tokCount(col("text"), w))
      val best = greatest(scores: _*)
      // first marker attaining the max wins (deterministic tie-break)
      val pred = markers.zip(scores).foldRight(lit("unk")) {
        case ((w, sc), acc) => when(sc === best, lit(w)).otherwise(acc)
      }
      t(s, d, "documents")
        .select(col("lang"), pred.as("pred_marker"))
        .groupBy(col("lang"), col("pred_marker"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_marker"))
    }),

    // fingerprinting: raw content hash + order/dup-insensitive canonical
    // hash (sorted distinct token set).
    "text_fingerprint" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          XF.h32(col("text")).as("fp"),
          XF.h32(concat_ws(" ",
            array_sort(array_distinct(toks(col("text")))))).as("canon_fp"))
        .orderBy(col("doc_id"))),

    // BPE-ish regex tokenizer: letter-runs / digit-runs / punctuation-runs
    // (the pre-tokenization split every BPE vocabulary starts from).
    "text_bpe_tokens" -> ((s: SparkSession, d: String) => {
      val bpe = regexp_extract_all(col("text"),
        lit("[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]+"), lit(0))
      t(s, d, "documents")
        .select(col("doc_id"),
          size(bpe).as("n_bpe_tokens"),
          size(array_distinct(bpe)).as("n_bpe_distinct"))
        .orderBy(col("doc_id"))
    }),

    // rolling-hash fingerprint: order-SENSITIVE polynomial hash over the
    // token stream (complements canon_fp, which is order-insensitive) —
    // one fold over the token array, no shuffle.
    "text_rolling_fp" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          aggregate(transform(toks(col("text")), t => XF.h32(t)),
            lit(0L),
            (acc, h) => (acc * 31L + h) % 2147483647L).as("roll_fp"))
        .orderBy(col("doc_id"))),

    // TF-IDF top terms per document (round 4): tf from one explode +
    // groupBy (map-side partials), document frequency re-aggregated from
    // the SAME (doc, token) frame — (token) is a suffix-group of
    // (doc_id, token), so the df aggregation reuses the tf exchange's
    // data without rescanning the corpus; idf joins back on the token
    // key. N (corpus size) arrives as a broadcast 1-row cross join, never
    // a collect. idf's ln() is transcendental → rounded at 1e-6 on both
    // engines per the XF contract; ranking ties break on the token.
    "text_tfidf_top" -> ((s: SparkSession, d: String) => {
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfTok = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      val idf = dfTok.crossJoin(broadcast(nDocs))
        .select(col("token"),
          XF.r6(log(col("n_docs").cast(DoubleType) /
            col("df").cast(DoubleType))).as("idf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(idf, Seq("token"))
        .select(col("doc_id"), col("token"), col("tf"),
          XF.r6(col("tf").cast(DoubleType) * col("idf")).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast(LongType).as("rk"),
          col("token"), col("tf"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // bigram language-model SURPRISAL — the perplexity-proxy quality
    // score a curation pipeline uses to rank documents: train corpus
    // bigram counts, score each doc by -avg ln P(w'|w) with
    // P(w'|w) = c(w,w') / c(w,·). ONE bigram frame feeds everything:
    // conditional counts are a groupBy on (w1,w2); context totals
    // re-aggregate the SAME counts frame ((w1) is a suffix-group of
    // (w1,w2) — no second corpus pass); scoring joins back on the
    // vocab²-bounded bigram key. At 100 TB the count tables are
    // vocab-bounded (map-side partials collapse each partition to the
    // model size) and broadcastable, so scoring is a single broadcast
    // join over the corpus scan. ln is transcendental → rounded at 1e-6
    // per the XF contract; the per-doc mean is an exact decimal sum of
    // the rounded logs.
    "text_surprisal" -> ((s: SparkSession, d: String) => {
      // tokenize ONCE per row behind a projection boundary: referencing
      // the split() expression inside the position lambda would re-run
      // the tokenizer per element — O(len²) per document (measured 4×
      // this query's total time). CollapseProject keeps the boundary:
      // the alias is non-cheap and multiply-referenced.
      // The bigram frame deliberately stays UNmaterialized even though
      // two branches consume it: unlike the shingle index (8-byte
      // hashes), bg is one string-pair row per token — LARGER than the
      // corpus — so checkpointing it would demand >corpus-size executor
      // storage at 100 TB. Re-running the tokenize scan for the tiny
      // vocab²-bounded count table is the cheaper, bounded plan.
      val bg = t(s, d, "documents")
        .select(col("doc_id"), toks(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("ws")) - 1),
            i => struct(element_at(col("ws"), i).as("w1"),
              element_at(col("ws"), i + 1).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // materialize the (vocab²-bounded, tiny) conditional-count table
      // once: without it the context-total branch re-derives the whole
      // bigram aggregation from a THIRD corpus scan — plan-level reuse
      // does not cross the two consumer branches (verified in the
      // physical plan; same pitfall as Dedup's candidate-pair frames)
      val cBi = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        .localCheckpoint()
      val cCtx = cBi.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      bg.join(cBi, Seq("w1", "w2")).join(cCtx, Seq("w1"))
        .select(col("doc_id"),
          XF.r6(log(col("c2").cast(DoubleType) /
            col("c1").cast(DoubleType))).as("logp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          XF.r6(-XF.davg(col("logp"))).as("surprisal"))
        .orderBy(col("doc_id"))
    }),

    // BPE MERGE CANDIDATES — the vocabulary-induction step: corpus-wide
    // adjacent character-pair frequencies (each occurrence weighted,
    // i.e. by token frequency), ranked; the top pair is BPE's first
    // merge decision. A token's in-token pairs are identical across all
    // its occurrences, so the corpus collapses to (distinct token,
    // frequency) FIRST — the position explode then runs over the vocab,
    // not the corpus (Zipf: orders of magnitude fewer rows), and the
    // pair groupBy sums frequency weights for exactly the
    // per-occurrence counts. Both groupBy key spaces are bounded (vocab,
    // then char-bigram alphabet ~10³) with map-side partials; the top-k
    // is a TakeOrdered, never a full sort. Real BPE iterates
    // merge→recount; one round is the oracle-checkable unit (the loop is
    // driver-side, same shape each round).
    "text_bpe_merges" -> ((s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(explode(toks(col("text"))).as("token"))
        .filter(length(col("token")) >= 2)
        .groupBy(col("token")).agg(count(lit(1)).as("tn"))
        .select(col("tn"), explode(transform(
          sequence(lit(1), length(col("token")) - 1),
          i => col("token").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("tn")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    }),

    // CHARACTER-ENTROPY quality signal — low-entropy docs are repeated
    // filler / encoding junk, high-entropy docs are noise; the classic
    // cheap scorer between them. Char counts come from one explode +
    // (doc, char) groupBy (key space = docs × alphabet; map-side
    // partials collapse hard); each -p·ln p term is rounded at 1e-6
    // (transcendental) and the per-doc sum accumulates as exact decimal
    // — deterministic at any parallelism, same contract as surprisal.
    "text_entropy" -> ((s: SparkSession, d: String) => {
      val counts = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "") // guard: split-dialect empty edges
        .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      counts
        .withColumn("n", sum(col("cnt")).over(wd))
        .withColumn("p", col("cnt").cast(DoubleType) /
          col("n").cast(DoubleType))
        .withColumn("term", XF.r6(-col("p") * log(col("p"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct_chars"),
          XF.r6(XF.dsum(col("term"))).as("entropy"))
        .orderBy(col("doc_id"))
    }),

    // PII / DENYLIST SCRUB — the redaction pass a corpus runs before any
    // text ships to training: regex arms for structured PII (emails,
    // long digit runs — the real patterns; this synthetic corpus has no
    // digits so they count 0, exercised structurally) plus a term
    // denylist (two vocabulary words stand in for a sensitive-term
    // list), replaced whole-token via \b anchors. Counts are measured on
    // the ORIGINAL text; the fingerprint hashes the scrubbed text.
    // Single scan, narrow codegen'd regex exprs, zero shuffle until the
    // sort — at 100 TB this is a map-only pass writing scrubbed text
    // back out, and the denylist (10³-10⁴ terms) compiles into one
    // alternation per executor, never a join.
    "text_pii_scrub" -> ((s: SparkSession, d: String) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val num = "\\d{8,}"
      val deny = "\\b(key|hash)\\b"
      val scrub = regexp_replace(regexp_replace(regexp_replace(col("text"),
        email, "<EMAIL>"), num, "<NUM>"), deny, "<TERM>")
      // regex-heavy per-row stage: spread off the file-layout-bound
      // scan first (single-row-group parquet ⇒ one task otherwise —
      // the codec-stage rule, Multimodal.pngMedia; sf10 measured this
      // query 10× slower riding the 1-task scan)
      t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          col("doc_id"),
          regexp_count(col("text"), lit(email)).cast(LongType).as("n_email"),
          regexp_count(col("text"), lit(num)).cast(LongType).as("n_number"),
          regexp_count(col("text"), lit(deny)).cast(LongType)
            .as("n_denylist"),
          length(scrub).cast(LongType).as("n_chars_scrubbed"),
          XF.h32(scrub).as("scrubbed_fp"))
        .orderBy(col("doc_id"))
    }),

    // GOPHER-STYLE duplicate-n-gram mass (Rae et al. 2021, "Scaling
    // Language Models: ... Gopher" table A1 — the within-document
    // repetition filters): per document, the fraction of 2-gram and
    // 3-gram INSTANCES that are duplicated inside the document
    // (instances whose gram occurs ≥ 2×). Complements
    // `text_repetition`'s top-token share — a doc can loop a phrase
    // without any single dominant token. ZERO-SHUFFLE design:
    // within-document repetition is a per-ROW property, so the whole
    // computation is array arithmetic inside the row — build the
    // gram-hash array (xxhash64: codegen'd, 64-bit, so within-doc
    // collisions are ~m²/2⁶⁴ — vanishing at any document length),
    // sort it, and count the instances sitting in a ≥2 run as
    // m − |isolated elements| (an element is isolated iff it differs
    // from both neighbors in the sorted order). No explode, no gram
    // shuffle — the plan is one scan of narrow expressions + the
    // output sort, at any corpus size. The DuckDB oracle derives the
    // same fractions the OPPOSITE way (explode + GROUP BY the RAW
    // gram string — no hash at all), so a hash-collision or
    // window-arithmetic mistake on either side cannot cancel out.
    "text_dup_ngram_mass" -> ((s: SparkSession, d: String) => {
      val ws = toks(col("text"))
      // The statistic runs as a NATIVE codegen Expression
      // (functions.DupGramFrac — hash, sort, run-length in one fused
      // JVM loop; the §2.7 tier choice with the measured rationale).
      // The built-in HOF formulations are semantically identical but
      // interpreted, and two hazards make them slow: (1) an outer
      // expression referenced INSIDE a lambda body re-evaluates PER
      // ELEMENT (a slice(ws, i+1, n) windowing lambda re-split the
      // text m times per row — timeout at sf0.1), and (2) every tree
      // OCCURRENCE of an expression re-evaluates its chain (no
      // subexpression elimination across HOFs, and projection
      // collapsing re-inlines aliases, so withColumn is no barrier) —
      // the best lambda-safe form (zip_with over shifted slices + one
      // run-length aggregate()) still measured ~2 s at sf0.1 where
      // this kernel runs the identical answer at a ~10× lower
      // constant.
      def fracFor(n: Int): org.apache.spark.sql.Column =
        XF.r6(graft.functions.ArrayExprs.dupGramFrac(ws, n))
      // kernel-heavy per-row stage: spread off the file-layout-bound
      // scan (the codec-stage rule, Multimodal.pngMedia)
      t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(size(ws) >= 3) // every testdata doc; guards the widths
        .select(col("doc_id"),
          size(ws).cast(LongType).as("n_tokens"),
          fracFor(2).as("dup2_frac"), fracFor(3).as("dup3_frac"))
        .select(col("doc_id"), col("n_tokens"), col("dup2_frac"),
          col("dup3_frac"),
          (col("dup2_frac") > 0.2 || col("dup3_frac") > 0.18)
            .as("flag_repetitive"))
        .orderBy(col("doc_id"))
    })
  )

  private val avgLenSql =
    "(CAST(n_chars - (len(string_split(text,' ')) - 1) AS DOUBLE) / " +
      "CAST(len(string_split(text,' ')) AS DOUBLE))"

  val oracles: Seq[(String, String)] = Seq(
    "text_token_stats" ->
      s"""SELECT doc_id, n_chars,
         |  len(string_split(text,' ')) AS n_tokens,
         |  len(list_distinct(string_split(text,' '))) AS n_distinct,
         |  $avgLenSql AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_token_freq" ->
      s"""SELECT token, COUNT(*) AS n
         |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token""".stripMargin,

    "text_hash_features" ->
      s"""SELECT doc_id, ${XF.h32Sql("token")} % 64 AS dim, COUNT(*) AS n
         |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token
         |      FROM documents)
         |GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin,

    "text_cooc_lift" ->
      s"""WITH tk AS (
         |  SELECT doc_id, i AS pos, ws[i] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents) d0,
         |       unnest(range(1, len(ws) + 1)) t(i)),
         |pr AS (SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_co
         |       FROM tk a JOIN tk b ON a.doc_id = b.doc_id
         |         AND b.pos - a.pos IN (1, 2, 3)
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 10),
         |nw AS (SELECT w, COUNT(*) AS nw FROM tk GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_total FROM tk)
         |SELECT w1, w2, CAST(n_co AS BIGINT) AS n_co,
         |  ROUND((CAST(n_co AS DOUBLE) * CAST(n_total AS DOUBLE)) /
         |    (CAST(x.nw AS DOUBLE) * CAST(y.nw AS DOUBLE)), 6) AS lift
         |FROM pr JOIN nw x ON x.w = pr.w1 JOIN nw y ON y.w = pr.w2, tot
         |ORDER BY n_co DESC, w1, w2""".stripMargin,

    "text_classify" -> {
      val dim = s"${XF.h32Sql("token")} % 64"
      val w = s"(${XF.h32Sql(s"'w:' || CAST($dim AS VARCHAR)")} % 2001) - 1000"
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
         |            FROM documents),
         |sc AS (SELECT doc_id, CAST(SUM($w) AS BIGINT) AS score_u,
         |              COUNT(*) AS n_tokens
         |       FROM tk GROUP BY 1)
         |SELECT doc_id, score_u,
         |  ROUND(CAST(score_u AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         |    AS avg_token_w,
         |  score_u > 0 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "text_quality" -> {
      val nTok = "CAST(len(string_split(text,' ')) AS DOUBLE)"
      val stop = s"CAST(${tokCountSql("text", "the")} + ${tokCountSql("text", "a")} AS DOUBLE) / $nTok"
      val dr = s"CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / $nTok"
      s"""SELECT doc_id, lang, $nTok AS n_tokens,
         |  round($stop, 6) AS stopword_ratio,
         |  round($dr, 6) AS distinct_ratio,
         |  CASE WHEN $nTok < CAST(32 AS DOUBLE) THEN 'short'
         |       WHEN $dr < CAST(0.35 AS DOUBLE) THEN 'repetitive'
         |       ELSE 'ok' END AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "text_langid" -> {
      val scores = markers.map(w => s"${tokCountSql("text", w)}")
      val best = s"greatest(${scores.mkString(", ")})"
      val pred = markers.zip(scores).reverse
        .foldLeft("'unk'") { case (acc, (w, sc)) =>
          s"CASE WHEN $sc = $best THEN '$w' ELSE $acc END"
        }
      s"""SELECT lang, pred_marker, COUNT(*) AS n FROM (
         |  SELECT lang, $pred AS pred_marker FROM documents)
         |GROUP BY lang, pred_marker ORDER BY lang, pred_marker""".stripMargin
    },

    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  ${XF.h32Sql("text")} AS fp,
         |  ${XF.h32Sql("array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')")} AS canon_fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_bpe_tokens" -> {
      val bpe = "regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]+')"
      s"""SELECT doc_id,
         |  len($bpe) AS n_bpe_tokens,
         |  len(list_distinct($bpe)) AS n_bpe_distinct
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "text_rolling_fp" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(text,' '), t -> ${XF.h32Sql("t")})),
         |    (acc, h) -> (acc * 31 + h) % 2147483647) AS roll_fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_tfidf_top" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token
        |        FROM documents)
        |  GROUP BY doc_id, token),
        |idf AS (
        |  SELECT token,
        |    ROUND(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) /
        |             CAST(COUNT(*) AS DOUBLE)), 6) AS idf
        |  FROM tf GROUP BY token),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |    ROUND(CAST(tf.tf AS DOUBLE) * idf.idf, 6) AS score
        |  FROM tf JOIN idf USING (token)),
        |ranked AS (
        |  SELECT doc_id, token, tf, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, token) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, token, tf, score FROM ranked
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "text_surprisal" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(text,' ') AS ws FROM documents
         |  WHERE len(string_split(text,' ')) >= 2),
         |bg AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
         |  FROM tk, unnest(range(1, len(ws))) t(i)),
         |cbi AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
         |cctx AS (SELECT w1, SUM(c2) AS c1 FROM cbi GROUP BY w1),
         |sc AS (
         |  SELECT doc_id,
         |    ${XF.r6Sql("ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))")} AS logp
         |  FROM bg JOIN cbi USING (w1, w2) JOIN cctx USING (w1))
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  ${XF.r6Sql(s"-${XF.davgSql("logp")}")} AS surprisal
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_bpe_merges" ->
      s"""WITH tk AS (
         |  SELECT unnest(string_split(text,' ')) AS token FROM documents),
         |pr AS (
         |  SELECT substr(token, i, 2) AS pair
         |  FROM (SELECT token FROM tk WHERE length(token) >= 2) t2,
         |       unnest(range(1, length(token))) t(i))
         |SELECT pair, COUNT(*) AS n FROM pr
         |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "text_entropy" ->
      s"""WITH counts AS (
         |  SELECT doc_id, c AS ch, COUNT(*) AS cnt
         |  FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
         |        FROM documents)
         |  WHERE c <> '' GROUP BY 1, 2),
         |wp AS (
         |  SELECT doc_id, cnt,
         |    CAST(cnt AS DOUBLE) /
         |      CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS p
         |  FROM counts)
         |SELECT doc_id, COUNT(*) AS n_distinct_chars,
         |  ${XF.r6Sql(XF.dsumSql(XF.r6Sql("-p * ln(p)")))} AS entropy
         |FROM wp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val num = "\\d{8,}"
      val deny = "\\b(key|hash)\\b"
      val scrub = s"regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'$email', '<EMAIL>', 'g'), '$num', '<NUM>', 'g'), " +
        s"'$deny', '<TERM>', 'g')"
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$num')) AS BIGINT) AS n_number,
         |  CAST(len(regexp_extract_all(text, '$deny')) AS BIGINT) AS n_denylist,
         |  CAST(length($scrub) AS BIGINT) AS n_chars_scrubbed,
         |  ${XF.h32Sql(scrub)} AS scrubbed_fp
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "text_dup_ngram_mass" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') ws
         |            FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, n,
         |    array_to_string(ws[i:i+n-1], ' ') AS g
         |  FROM tk, (VALUES (2), (3)) nn(n),
         |       unnest(range(1, len(ws) - n + 2)) t(i)
         |  WHERE len(ws) >= 3),
         |c AS (SELECT doc_id, n_tokens, n, g, COUNT(*) AS cnt
         |      FROM g GROUP BY ALL),
         |f AS (SELECT doc_id, n_tokens, n,
         |        ROUND(CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)
         |            AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS frac
         |      FROM c GROUP BY ALL)
         |SELECT doc_id, n_tokens,
         |  MAX(CASE WHEN n = 2 THEN frac END) AS dup2_frac,
         |  MAX(CASE WHEN n = 3 THEN frac END) AS dup3_frac,
         |  (MAX(CASE WHEN n = 2 THEN frac END) > CAST(0.2 AS DOUBLE) OR
         |   MAX(CASE WHEN n = 3 THEN frac END) > CAST(0.18 AS DOUBLE))
         |    AS flag_repetitive
         |FROM f GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin
  )
}

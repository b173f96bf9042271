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
      val ws = split(col("text"), " ")
      // guard: sequence(0, -1) would DESCEND for a sub-width doc; emit an
      // empty chunk list instead.
      val chunkHashes = when(size(ws) >= ChunkW,
        transform(
          sequence(lit(0), (size(ws) / ChunkW).cast(IntegerType) - 1),
          i => XF.h32(concat_ws(" ", slice(ws, i * ChunkW + 1, lit(ChunkW))))))
        .otherwise(array().cast(ArrayType(LongType)))
      t(s, d, "documents")
        .select(col("doc_id"), explode(chunkHashes).as("chunk_hash"))
        .groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occurrences") > 1)
        .orderBy(col("chunk_hash"))
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
        .orderBy(col("doc_id")))
  )

  val oracles: Seq[(String, String)] = Seq(
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

    "text_repetition" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token
        |        FROM documents)
        |  GROUP BY doc_id, token)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, MAX(tf) AS top_freq,
        |  ROUND((CAST(MAX(tf) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)), 6) AS rep_ratio
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}

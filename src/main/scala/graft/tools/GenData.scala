package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic scale-up generator for the driver testdata contract
  * (TESTDATA.md): TPC-H-ish star schema + `events` + `documents` +
  * `embeddings`, one parquet per table, same schemas/value
  * distributions as the shipped sf0.1 — extended to arbitrary scale
  * factors so the surface can be validated at 100× the correctness
  * gate (VERDICT r8 #1: both prior scale-ups caught real defects the
  * sf0.01 gate missed).
  *
  * The driver's own generator is not shipped, so this one re-derives
  * the distributions from the sf0.1 data (measured in-round and
  * documented per column below); it is NOT byte-identical to the
  * driver data at the driver's scale factors — it is the same
  * CONTRACT (schemas, ranges, skew shape, duplicate structure). The
  * oracle methodology is unaffected: correctness compares Spark vs
  * DuckDB over the SAME parquet, whoever generated it.
  *
  * Determinism: every value is a pure function of (table, row id) via
  * splitmix64 / per-row hash columns — no RNG state, no
  * `Date.now`-style seeds — so any parallelism, any retry, any
  * partition count yields bit-identical tables. That is the property
  * that matters at cluster scale: a task retry must not change data.
  *
  * Usage: `runMain graft.tools.GenData <sf> <outDir>`
  *   e.g. `runMain graft.tools.GenData 1.0 testdata-sf1/sf1`
  */
object GenData {

  // ---- deterministic scalar streams (splitmix64) --------------------
  private def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L // 0x9e3779b97f4a7c15
    z = (z ^ (z >>> 30)) * -4658895280553007687L // 0xbf58476d1ce4e5b9
    z = (z ^ (z >>> 27)) * -7723592293110705685L // 0x94d049bb133111eb
    z ^ (z >>> 31)
  }
  private def h(tag: Long, id: Long): Long = mix(mix(tag) ^ id)
  /** uniform double in [0, 1) */
  private def u(tag: Long, id: Long): Double =
    (h(tag, id) >>> 11).toDouble / (1L << 53).toDouble
  /** uniform int in [0, n) */
  private def ui(tag: Long, id: Long, n: Int): Int =
    ((h(tag, id) >>> 1) % n).toInt
  private def r2(v: Double): Double = math.rint(v * 100) / 100

  // column-level SQL versions for the range-based tables (codegen'd,
  // no closures — the big tables generate at scan speed)
  private def hc(tag: Long): org.apache.spark.sql.Column =
    xxhash64(lit(tag), col("id"))
  private def uc(tag: Long): org.apache.spark.sql.Column =
    shiftrightunsigned(hc(tag), 11).cast(DoubleType) / lit((1L << 53).toDouble)
  private def uic(tag: Long, n: Int): org.apache.spark.sql.Column =
    pmod(hc(tag), lit(n.toLong)).cast(IntegerType)

  private val Segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val Regions =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val PartAdjs = Seq(
    "large", "small", "hot", "cold", "blue", "red", "green", "shiny")
  private val PartNouns = Seq(
    "ring", "bolt", "gear", "cap", "pin", "rod", "plate", "valve")
  private val PartTypes = Seq(
    "STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
  private val EventTypes =
    Seq("view", "click", "purchase", "signup", "error")
  // the sf0.1 documents vocabulary: 30 uniform words (+ the "dup"
  // marker that near-dup copies insert)
  private val Vocab: IndexedSeq[String] = IndexedSeq(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  private def pick(xs: Seq[String], tag: Long): org.apache.spark.sql.Column =
    element_at(array(xs.map(lit): _*), (uic(tag, xs.size) + 1))

  private val EpochDay1995 = java.time.LocalDate.of(1995, 1, 1).toEpochDay

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val out = args.lift(1).getOrElse(s"testdata-gen/sf$sf")
    val flags = args.drop(2).toSet
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // same physical timestamp vintage as the current driver data
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    // --tables=a,b,c: write only the named tables (e.g. the sf30
    // PairCount instrument reads nothing but `customer`; generating
    // 180M lineitem rows for it would waste minutes and ~10 GB of the
    // host's bounded scratch). Determinism is per-(table, row id), so
    // a partial dir is bit-identical to the same tables in a full one.
    val tableFilter = args.drop(2).collectFirst {
      case a if a.startsWith("--tables=") =>
        a.stripPrefix("--tables=").split(",").toSet
    }
    generate(spark, sf, out, heapsVocab = flags("--heaps"),
      onlyDocuments = flags("--only-documents"), tables = tableFilter)
    spark.stop()
  }

  /** Row counts per table at scale factor `sf` — the driver's observed
    * scaling (TESTDATA.md + measured: documents/embeddings floor at
    * 500 below sf0.1).
    */
  def counts(sf: Double): Map[String, Long] = Map(
    "customer" -> math.round(150000 * sf),
    "supplier" -> math.round(10000 * sf),
    "part" -> math.round(200000 * sf),
    "orders" -> math.round(1500000 * sf),
    "events" -> math.round(1000000 * sf),
    "documents" -> math.max(500, math.round(50000 * sf)),
    "embeddings" -> math.max(500, math.round(20000 * sf)))

  /** @param heapsVocab false (default) = the driver contract's FIXED
    *        30-word vocabulary. true = a Heaps'-law vocabulary regime
    *        for the `documents` table only: the vocabulary grows with
    *        the corpus as V = K·N^β (K = 30, β = 0.5 — inside the
    *        classic English ranges K ≈ 10–100, β ≈ 0.4–0.6; Heaps
    *        1978), and per-token ranks are Zipf-distributed via the
    *        closed form rank = ⌊V^u⌋ for uniform u (density ∝ 1/rank —
    *        Zipf s = 1, so the head stays common: rank-1 frequency
    *        ln2/lnV ≈ 6%, about English "the"). This is the
    *        data-regime twin of the fixed-vocabulary adjudication in
    *        BASELINE.md: under the fixed 30 words every pair-key's
    *        joint df grows linearly with the corpus and candidate
    *        volume is ~n²/universe² for ANY candidate generator; under
    *        Heaps growth rare-shingle joint dfs stay O(1) and the
    *        near-dup plans should go ~linear — measured, not argued,
    *        in BASELINE.md round 13. All other structure (doc lengths,
    *        the 4.7% near-dup copies, the "dup" marker, langs/sources)
    *        is unchanged; base-vocab draws keep the same splitmix
    *        stream so mode differences are vocabulary-only.
    * @param onlyDocuments write just `documents.parquet` (the
    *        vocabulary-regime study reads nothing else).
    * @param tables if set, write only the named tables (scale
    *        instruments that read one table should not pay for the
    *        others — see the main's --tables flag). */
  def generate(spark: SparkSession, sf: Double, out: String,
      heapsVocab: Boolean = false, onlyDocuments: Boolean = false,
      tables: Option[Set[String]] = None): Unit = {
    val n = counts(sf)
    val nCust = n("customer"); val nSupp = n("supplier")
    val nPart = n("part"); val nOrd = n("orders")

    // Driver layout contract: each table is ONE parquet FILE named
    // `<table>.parquet` (TESTDATA.md; check.py's DuckDB views read the
    // same path). Compute stays parallel — only the final write rides
    // a single task — and 4 MB row groups keep the single file
    // splittable for every downstream scan: with the default 128 MB
    // block size a ≤128 MB table is ONE row group, so every scan of it
    // collapses to ONE task no matter how many byte-range splits the
    // planner makes (the r10 sf10 drive measured documents-scan
    // queries 10-15× instead of ~3× for exactly this reason — the
    // whole regex/JSON stage rode a single core). A real 100 TB lake
    // has thousands of row groups per table; small-block writes make
    // the single-file fixture behave like one.
    def write(name: String, df: DataFrame, files: Int): Unit = {
      val _ = files
      if (onlyDocuments && name != "documents") {
        println(s"[gendata] skip $name (--only-documents)"); return
      }
      if (tables.exists(!_.contains(name))) {
        println(s"[gendata] skip $name (--tables)"); return
      }
      val tmp = s"$out/.tmp_$name"
      df.repartition(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", 4L * 1024 * 1024)
        .parquet(tmp)
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet")).head.getPath
      val dst = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      if (fs.exists(dst)) fs.delete(dst, false)
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[gendata] wrote $name")
    }
    def filesFor(rows: Long): Int =
      math.max(1, math.min(64, (rows / 200000L).toInt))

    write("region", spark.range(5).select(
      col("id").cast(IntegerType).as("r_regionkey"),
      element_at(array(Regions.map(lit): _*), (col("id") + 1).cast(IntegerType))
        .as("r_name")), 1)

    write("nation", spark.range(25).select(
      col("id").cast(IntegerType).as("n_nationkey"),
      concat(lit("NATION_"), col("id").cast(StringType)).as("n_name"),
      (col("id") % 5).cast(IntegerType).as("n_regionkey")), 1)

    write("customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id").cast(StringType), 9, "0")).as("c_name"),
      uic(11L, 25).as("c_nationkey"),
      round(lit(-1000.0) + uc(12L) * 11000.0, 2).as("c_acctbal"),
      pick(Segments, 13L).as("c_mktsegment")), filesFor(nCust))

    write("supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id").cast(StringType), 9, "0")).as("s_name"),
      uic(21L, 25).as("s_nationkey"),
      round(lit(-1000.0) + uc(22L) * 11000.0, 2).as("s_acctbal")),
      filesFor(nSupp))

    write("part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick(PartAdjs, 31L), lit(" "), pick(PartNouns, 32L))
        .as("p_name"),
      concat(lit("Brand#"), (uic(33L, 5) + 1).cast(StringType),
        (uic(34L, 5) + 1).cast(StringType)).as("p_brand"),
      pick(PartTypes, 35L).as("p_type"),
      (uic(36L, 50) + 1).as("p_size"),
      round(uc(37L) * 1000.0, 2).as("p_retailprice")), filesFor(nPart))

    // orders: dates uniform 1995-01-01 .. 2001-08-01 (2404 days)
    write("orders", spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      pmod(hc(41L), lit(nCust)).as("o_custkey"),
      pick(Seq("F", "O", "P"), 42L).as("o_orderstatus"),
      round(lit(1000.0) + uc(43L) * 499000.0, 2).as("o_totalprice"),
      to_timestamp(date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        uic(44L, 2404))).cast(TimestampNTZType).as("o_orderdate"),
      pick(Priorities, 45L).as("o_orderpriority")), filesFor(nOrd))

    // lineitem: 1..7 lines per order (uniform, mean 4 — the TPC-H
    // shape; sf0.1 measures mean 4.07), line-level values hashed on
    // (orderkey, linenumber); shipdate independent of orderdate
    // (measured: the driver data's shipdate-orderdate deltas span
    // ±2400 days, i.e. unconditioned), uniform 1995-01-02..2001-11-04
    val lines = spark.range(nOrd)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1), (uic(51L, 7) + 1))).as("l_linenumber"))
      // re-key the per-line hash streams on a single line id
      .withColumn("id", col("l_orderkey") * 8 + col("l_linenumber"))
    write("lineitem", lines.select(
      col("l_orderkey"),
      pmod(hc(52L), lit(nPart)).as("l_partkey"),
      pmod(hc(53L), lit(nSupp)).as("l_suppkey"),
      col("l_linenumber").cast(IntegerType),
      (uic(54L, 50) + 1).cast(DoubleType).as("l_quantity"),
      round(lit(900.0) + uc(55L) * 104100.0, 2).as("l_extendedprice"),
      round(uc(56L) * 0.10, 2).as("l_discount"),
      round(uc(57L) * 0.08, 2).as("l_tax"),
      pick(Seq("A", "N", "R"), 58L).as("l_returnflag"),
      pick(Seq("F", "O"), 59L).as("l_linestatus"),
      to_timestamp(date_add(lit(java.sql.Date.valueOf("1995-01-02")),
        uic(60L, 2498))).cast(TimestampNTZType).as("l_shipdate")), filesFor(nOrd * 4))

    // events: ts ascending with id (the driver data is ts-sorted and
    // event_id-aligned), ~30 days span, value ~ Exp(mean 50) (sf0.1
    // median 34.7 ≈ 50·ln2), 15000·sf users, props = {"k": 0..99}
    val nEv = n("events"); val nUsers = math.max(1L, nCust / 10)
    val spanUs = 30L * 86400L * 1000000L
    val startUs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime * 1000L
    val slotUs = spanUs.toDouble / nEv.toDouble
    write("events", spark.range(nEv).select(
      col("id").as("event_id"),
      timestamp_micros((lit(startUs) +
        (col("id").cast(DoubleType) * slotUs +
          uc(61L) * slotUs).cast(LongType)))
        .cast(TimestampNTZType).as("ts"),
      pmod(hc(62L), lit(nUsers)).as("user_id"),
      pick(EventTypes, 63L).as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - uc(64L)), 2).as("value"),
      concat(lit("{\"k\": "), pmod(hc(65L), lit(100L)).cast(StringType),
        lit("}"))
        .as("props")), filesFor(nEv))

    // documents + embeddings carry per-row structure (word sequences,
    // unit-norm vectors) — generated through typed maps; deterministic
    // splitmix64 streams keyed on doc/vec id, so parallelism-invariant
    import spark.implicits._
    val nDoc = n("documents")
    // ~4.7% of docs are near-duplicate copies of an earlier doc with
    // one "dup" token inserted (the sf0.1 structure: 234 shared-prefix
    // groups / 5000 docs, pair Jaccard ≈ 0.95, 0.16% exact copies)
    // Heaps'-law vocabulary size for this corpus (see the generate
    // scaladoc): V = 30·√(total tokens), tokens ≈ nDoc · E[words/doc]
    // (= 10 + 90/2 = 55)
    val heapsV: Int = math.max(Vocab.size,
      math.round(30.0 * math.sqrt(nDoc * 55.0)).toInt)
    val useHeaps = heapsVocab // avoid capturing the method param name twice
    val docs = spark.range(nDoc).as[Long].map { id =>
      def words(of: Long): IndexedSeq[String] = {
        val nW = 10 + ui(71L, of, 91)
        if (!useHeaps)
          (0 until nW).map(j => Vocab(ui(72L + j, of, Vocab.size)))
        else (0 until nW).map { j =>
          // Zipf s=1 via the closed form rank = ⌊V^u⌋ ∈ [1, V]
          val rank = math.min(heapsV.toLong,
            math.max(1L, math.pow(heapsV.toDouble, u(72L + j, of)).toLong))
          if (rank <= Vocab.size) Vocab(rank.toInt - 1)
          else "w" + rank
        }
      }
      val isDup = id >= 20 && u(73L, id) < 0.047
      val ws =
        if (!isDup) words(id)
        else {
          val src = (h(74L, id) >>> 1) % (id min (nDoc - 1))
          val base = words(src)
          // 1-in-30 copies insert nothing → exact duplicates exist
          if (ui(75L, id, 30) == 0) base
          else {
            val at = ui(76L, id, base.size + 1)
            (base.take(at) :+ "dup") ++ base.drop(at)
          }
        }
      val text = ws.mkString(" ")
      val lang = {
        val v = u(77L, id)
        if (v < 0.41) "en" else if (v < 0.56) "de"
        else if (v < 0.71) "es" else if (v < 0.86) "fr" else "zh"
      }
      (id, text, lang, s"src${ui(78L, id, 20)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    write("documents", docs, filesFor(nDoc * 12))

    // embeddings: 64-dim unit-norm isotropic gaussian, label purely
    // random. The sf0.1 data's apparent per-label structure (mean
    // cos-to-own-empirical-centroid ≈ 0.07 at 200 vecs/label) is
    // EXACTLY the 1/sqrt(200) sampling noise floor of an empirical
    // centroid of random unit vectors, and the cross-label centroid
    // cos ≈ 0.007 confirms it — the driver embeddings carry no label
    // signal, so neither do these.
    val nEmb = n("embeddings"); val dim = 64
    // (one deliberate schema delta: the typed-map output is
    // list<float NOT NULL> where the driver file says nullable —
    // strictly more precise, same Spark/DuckDB read type)
    val emb = spark.range(nEmb).as[Long].map { id =>
      def gauss(tag: Long, j: Int): Double = {
        val u1 = math.max(u(tag + 2L * j, id), 1e-12)
        val u2 = u(tag + 2L * j + 1, id)
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
      val g = Array.tabulate(dim)(j => gauss(8300L, j))
      val gn = math.sqrt(g.map(x => x * x).sum)
      (id, g.map(x => (x / gn).toFloat), ui(81L, id, 10))
    }.toDF("vec_id", "embedding", "label")
    write("embeddings", emb, filesFor(nEmb * 30))
  }
}

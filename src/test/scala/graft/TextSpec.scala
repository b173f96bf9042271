package graft

import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  private def docs: Map[Long, String] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("token stats match a JVM-side tokenizer") {
    val got = graft.SparkEntry.queries("text_token_stats")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      assert(got(id) === ((toks.length, toks.distinct.length)), s"doc $id")
    }
  }

  test("corpus token frequencies sum to total token count") {
    val freqTotal = graft.SparkEntry.queries("text_token_freq")(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    val expected = docs.values.map(_.split(" ").length.toLong).sum
    assert(freqTotal === expected)
  }

  test("hash features match a JVM-side hashing-trick replay") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    val expected = docs.toSeq.flatMap { case (id, text) =>
      text.split(" ", -1).map(t => (id, h32(t) % 64))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = graft.SparkEntry.queries("text_hash_features")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // fixed-width: every dim in [0, 64)
    assert(got.keys.forall { case (_, d) => d >= 0 && d < 64 })
  }

  test("rolling fingerprint is order-sensitive, canonical fp is not") {
    import spark.implicits._
    val pair = Seq((1L, "alpha beta gamma delta"), (2L, "delta gamma beta alpha"))
      .toDF("doc_id", "text")
    pair.createOrReplaceTempView("perm_docs")
    val roll = pair.select(
      aggregate(transform(split(col("text"), " "),
        t => graft.functions.XF.h32(t)),
        lit(0L), (acc, h) => (acc * 31L + h) % 2147483647L).as("fp"))
      .collect().map(_.getLong(0))
    assert(roll(0) !== roll(1))
    val canon = pair.select(graft.functions.XF.h32(concat_ws(" ",
      array_sort(array_distinct(split(col("text"), " "))))).as("fp"))
      .collect().map(_.getLong(0))
    assert(canon(0) === canon(1))
  }

  test("quality buckets are exhaustive and deterministic") {
    val q = graft.SparkEntry.queries("text_quality")(spark, sf)
      .select("quality").distinct().collect().map(_.getString(0)).toSet
    assert(q.subsetOf(Set("short", "repetitive", "ok")))
  }

  test("langid confusion counts cover every document") {
    val n = graft.SparkEntry.queries("text_langid")(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(n === docs.size)
  }

  test("tfidf top terms: 3 ranked rows per doc, scores non-increasing") {
    val rows = graft.SparkEntry.queries("text_tfidf_top")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L), s"doc $doc")
      val byRank = rs.sortBy(_._2).map(_._3)
      assert(byRank.sliding(2).forall(p => p(0) >= p(1)), s"doc $doc: $byRank")
    }
    // a corpus-universal token has idf 0 → never outranks a rarer token
    // with equal tf unless everything ties; spot-check idf sanity instead:
    // every score is >= 0 (df <= N ⇒ ln(N/df) >= 0).
    assert(rows.forall(_._3 >= 0.0))
  }

  test("surprisal matches a JVM-side bigram model replay") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bigrams = docs.toSeq.flatMap { case (id, text) =>
      text.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (id, p(0), p(1))).toSeq
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val want = bigrams.groupBy(_._1).view.mapValues { bs =>
      val logps = bs.map(b =>
        BigDecimal(r6(math.log(c2((b._2, b._3)).toDouble / c1(b._2)))))
      // exact decimal sum → double, THEN one IEEE division (same
      // operation order as XF.davg, so the match is bit-exact pre-r6)
      (bs.size.toLong, r6(-(logps.sum.toDouble / bs.size)))
    }.toMap
    val got = graft.SparkEntry.queries("text_surprisal")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, (n, s)) =>
      assert(got(id)._1 === n, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - s) < 1e-9, s"doc $id surprisal")
    }
    // higher conditional predictability ⇒ lower surprisal: every score is
    // positive (no bigram is certain corpus-wide at this corpus size)
    assert(got.values.forall(_._2 > 0.0))
  }

  test("bpe merge candidates match a JVM-side pair count") {
    val counts = docs.values.toSeq
      .flatMap(_.split(" "))
      .filter(_.length >= 2)
      .flatMap(tok => tok.sliding(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = graft.SparkEntry.queries("text_bpe_merges")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("char entropy matches a JVM recompute") {
    val got = graft.SparkEntry.queries("text_entropy")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val counts = text.groupBy(identity).view.mapValues(_.length).toMap
      val n = text.length.toDouble
      val terms = counts.values.map { c =>
        val p = c / n
        BigDecimal(r6(-p * math.log(p)))
      }
      val want = (counts.size.toLong, r6(terms.sum.toDouble))
      assert(got(id) === want, s"doc $id")
    }
  }

  test("pii scrub counts and length delta match the denylist hits") {
    val got = graft.SparkEntry.queries("text_pii_scrub")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    got.foreach { case (id, (em, num, deny, len)) =>
      val toks = docs(id).split(" ")
      val keys = toks.count(_ == "key")
      val hashes = toks.count(_ == "hash")
      // this corpus carries no structured PII; the regex arms count 0
      assert(em === 0L && num === 0L, s"doc $id")
      assert(deny === keys + hashes, s"doc $id")
      // '<TERM>' (6 chars) replaces 'key' (3) and 'hash' (4)
      assert(len === docs(id).length + 3L * keys + 2L * hashes, s"doc $id")
    }
  }

  test("duplicate-n-gram mass matches a JVM-side replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def frac(ws: Array[String], n: Int): Double = {
      val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
      val cnt = grams.groupBy(identity).view.mapValues(_.size)
      val dup = cnt.values.filter(_ >= 2).sum
      BigDecimal(dup.toDouble / grams.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = graft.SparkEntry.queries("text_dup_ngram_mass")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.keySet === docs.keySet)
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val (nTok, d2, d3, flag) = got(id)
      assert(nTok === ws.length.toLong, s"doc $id")
      assert(math.abs(d2 - frac(ws, 2)) < 1e-9, s"doc $id 2-gram")
      assert(math.abs(d3 - frac(ws, 3)) < 1e-9, s"doc $id 3-gram")
      assert(flag === (frac(ws, 2) > 0.2 || frac(ws, 3) > 0.18), s"doc $id")
    }
    // the testdata's repeated phrasing makes the filter non-vacuous
    assert(got.values.exists(_._2 > 0.0))
  }
}

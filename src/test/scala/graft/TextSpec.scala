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
}

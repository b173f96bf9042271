package graft

import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def grams(text: String, k: Int): Set[String] =
    text.split(" ", -1).sliding(k).filter(_.length == k)
      .map(_.mkString(" ")).toSet

  test("contamination finds exactly the docs sharing a 5-gram with src0") {
    val bench = docs.filter(_._2 == "src0")
      .flatMap(d => grams(d._3, 5)).toSet
    val expected = docs.filter(_._2 != "src0")
      .map(d => d._1 -> grams(d._3, 5).count(bench.contains))
      .filter(_._2 > 0).toMap
    val got = q("text_contamination").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === expected.keySet)
    // hit counts match up to hash collisions (none expected at this scale)
    expected.foreach { case (id, n) => assert(got(id) === n.toLong, s"doc $id") }
  }

  test("chunk dedup reports only chunks occurring more than once") {
    val rows = q("text_chunk_dedup").collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 1, s"chunk ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(1))
    }
    // brute-force recount of duplicated 4-token aligned chunks
    val all = docs.flatMap { case (_, _, text) =>
      val ws = text.split(" ", -1)
      (0 until ws.length / 4).map(i => ws.slice(i * 4, i * 4 + 4).mkString(" "))
    }
    val dups = all.groupBy(identity).count(_._2.size > 1)
    assert(rows.length === dups)
  }

  test("boilerplate removal cuts exactly the cross-doc chunks, in order") {
    // brute-force twin: aligned 4-token chunks INCLUDING the short tail
    // (ceil-chunking — the edit must cover every token), boilerplate =
    // present in >= 2 distinct docs, survivors rejoined in position order
    val chunked = docs.map { case (id, _, text) =>
      id -> text.split(" ", -1).grouped(4).map(_.mkString(" ")).toSeq
    }.toMap
    val boiler = chunked.toSeq.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.size >= 2).keySet
    val got = q("curate_boilerplate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === chunked.keySet)
    chunked.foreach { case (id, cs) =>
      val kept = cs.filterNot(boiler.contains)
      assert(got(id) === ((cs.size.toLong, (cs.size - kept.size).toLong,
        kept.mkString(" "))), s"doc $id")
    }
    // the edit must actually fire at this scale: some chunk removed,
    // some doc left intact
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 == 0))
  }

  test("repetition ratio is (top token freq) / (token count)") {
    val got = q("text_repetition").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, _, text) =>
      val toks = text.split(" ", -1)
      val top = toks.groupBy(identity).values.map(_.size).max
      assert(got(id) === ((toks.length.toLong, top.toLong)), s"doc $id")
    }
  }

  test("stratified sample is deterministic, a subset, and rate-shaped") {
    val once = q("sample_stratified").collect().map(_.getLong(0)).toSeq
    val again = q("sample_stratified").collect().map(_.getLong(0)).toSeq
    assert(once === again) // hash sampling: identical on re-run
    val byLang = q("sample_stratified").groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en strata are kept whole; en is downsampled strictly
    total.keys.filter(_ != "en").foreach(l => assert(byLang(l) === total(l)))
    assert(byLang("en") < total("en"))
  }

  test("eval holdout carves exactly 5 docs per language, disjoint ranks") {
    val rows = q("sample_eval_holdout").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    perLang.foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L), lang)
      assert(rs.map(_._3).distinct.length === 5, lang)
    }
  }

  test("mixture char shares sum to 1") {
    val s = q("doc_mixture_stats").agg(sum(col("char_share"))).head().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-3)
  }

  test("sequence packing lays every shard out contiguously") {
    // (seq_id, tok_offset) reconstruct each doc's start token; within a
    // shard (doc_id order) starts must advance by exactly n_tokens.
    val rows = q("pack_sequences").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2),
        r.getLong(3) * 64 + r.getLong(4)))
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      var expectedStart = 0L
      rs.sortBy(_._2).foreach { case (_, docId, nTok, start) =>
        assert(start === expectedStart, s"shard $shard doc $docId")
        expectedStart += nTok
      }
    }
    assert(rows.forall(r => r._4 % 64 >= 0 && (r._4 % 64) < 64))
  }

  test("curation gate verdict is exactly the conjunction of its reasons") {
    val rows = q("curate_gate").collect()
    rows.foreach { r =>
      val (tooShort, lowDiv, keep) =
        (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))
      assert(keep === (!tooShort && !lowDiv), s"doc ${r.getLong(0)}")
    }
    // thresholds must split the corpus non-trivially or the gate tests nothing
    assert(rows.exists(_.getBoolean(7)) && rows.exists(!_.getBoolean(7)))
  }

  test("temperature weights normalize and flatten the mixture") {
    val rows = q("sample_temperature").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    // α < 1 flattens: the smallest stratum is upweighted, the largest
    // downweighted (strict as long as shares differ, which they do here)
    val smallest = rows.minBy(_._1)
    val largest = rows.maxBy(_._1)
    assert(smallest._3 > 1.0, s"smallest stratum $smallest")
    assert(largest._3 < 1.0, s"largest stratum $largest")
    // flattening preserves order without inverting it
    assert(rows.sortBy(_._1).map(_._2).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1) + 1e-9))
  }

  test("e2e curation stage counts are a consistent funnel") {
    val rows = graft.SparkEntry.queries("curate_pipeline_e2e")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // monotone funnel per stratum
    rows.foreach { case (l, s, raw, gated, deduped, _, sampled) =>
      assert(raw >= gated && gated >= deduped && deduped >= sampled,
        s"($l,$s)")
    }
    // raw mass covers the corpus; weights normalize
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum === nDocs)
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-4)
    // gate stage agrees with the standalone curate_gate operator
    val gateKeep = graft.SparkEntry.queries("curate_gate")(spark, sf)
      .filter(col("keep"))
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_._1).view
      .mapValues(_.map(_._4).sum).toMap
    assert(byLang === gateKeep)
    // something survives sampling somewhere
    assert(rows.map(_._7).sum > 0L)
  }

  test("dsir weights replay brute-force and separate target from raw") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dims = rows.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(tok => (id, lang, h32(tok) % 64))
    }
    val nr = dims.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nt = dims.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap
    val (tr, tt) = (dims.size.toLong, dims.count(_._2 == "en").toLong)
    val lw = nr.map { case (dim, r) =>
      dim -> (r6(math.log((nt.getOrElse(dim, 0L) + 1).toDouble /
        (tt + 64).toDouble)) -
        r6(math.log((r + 1).toDouble / (tr + 64).toDouble)))
    }
    val want = dims.groupBy(_._1).map { case (id, ds) =>
      val logw = r6(ds.map(d => BigDecimal(lw(d._3)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      id -> ((ds.size.toLong, logw, logw > 0.0))
    }
    val got = graft.SparkEntry.queries("curate_dsir")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got === want)
    // the importance weight is discriminative: target-language docs
    // score higher on average than the rest of the corpus
    val byLang = rows.map(r => r._2 -> got(r._1)._2).groupBy(_._1).view
      .mapValues(v => v.map(_._2).sum / v.size).toMap
    assert(byLang("en") > (byLang - "en").values.max)
  }

  test("weighted systematic sample matches the brute-force PPS selection") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 100)))
      .map { case (k, w) => (k, w, h32(s"pps:$k")) }
      .sortBy(t => (t._3, t._1))
    val total = ord.map(_._2).sum
    val step = total / 1000L
    // brute-force systematic scan: selected iff the row's cumulative
    // interval crosses a grid multiple
    var cum = 0L
    val expected = ord.flatMap { case (k, w, _) =>
      val before = cum; cum += w
      // ht_weight clamps at 1: w > step (common at this tiny SF, where
      // step ≈ the largest order) is a certainty unit — inclusion
      // probability 1, never 1/(step/w) < 1
      if (cum / step > before / step)
        Some((k, w, cum, cum / step,
          BigDecimal(math.max(1.0, step.toDouble / w)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("sample_weighted")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected.toSeq)
    // PPS mass property: the sample hits every occupied grid cell once
    assert(got.map(_._4).distinct.size === got.size)
    assert(got.nonEmpty && got.size <= (total / step).toInt)
  }

  test("url canonicalization strips scheme/query/fragment and lowercases") {
    val rows = graft.SparkEntry.queries("curate_url_canonical")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, url, domain, canonical) =>
      assert(url.startsWith("https://") && url.contains("?utm_source=") &&
        url.endsWith("#top"), s"doc $id synthetic url shape: $url")
      // canonical = lowercase(host)+path, parsed back out of the url
      val hostPath = url.stripPrefix("https://").takeWhile(_ != '?')
      assert(canonical === hostPath.toLowerCase, s"doc $id")
      assert(domain === hostPath.takeWhile(_ != '/').toLowerCase)
      assert(!canonical.exists(_.isUpper) && !canonical.contains("?") &&
        !canonical.contains("#"))
    }
    // the uppercase-subdomain dirt is real on every third doc
    assert(rows.filter(_._1 % 3 == 0)
      .forall(r => r._2.stripPrefix("https://").takeWhile(_ != '.')
        .forall(c => !c.isLower)))
  }

  test("domain caps are bounded, deterministic, and hash-ranked") {
    val q = graft.SparkEntry.queries("curate_domain_caps")
    val a = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq) // no rand() anywhere: identical reruns
    assert(a.nonEmpty)
    val perDomain = a.groupBy(_._1)
    perDomain.foreach { case (dom, rows) =>
      assert(rows.length <= 10, s"$dom over cap")
      assert(rows.map(_._3).sorted.toSeq ===
        (1L to rows.length.toLong).toSeq, s"$dom ranks not dense")
      assert(dom.endsWith(".example.com") && dom.count(_ == '.') == 2,
        s"registered domain shape: $dom")
    }
  }
}

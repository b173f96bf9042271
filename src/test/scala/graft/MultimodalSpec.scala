package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  test("stubDecode is deterministic and unit-ranged") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val a = Multimodal.stubDecode(payload)
    val b = Multimodal.stubDecode(payload)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
    assert(a.forall(f => f >= 0f && f < 1f))
  }

  test("decodeFeatures preserves rows and emits the declared schema") {
    val media = Multimodal.media(spark, sf)
    val out = Multimodal.decodeFeatures(media)
    assert(out.schema === StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false)))))
    assert(out.count() === media.count())
    val row = out.orderBy(col("doc_id")).head()
    assert(row.getSeq[Float](1).length === 8)
  }

  test("mm_features equals the flattened stubDecode output") {
    // the oracle-checked flat query and the mapPartitions decoder must
    // compute the SAME features (both are h32(md5, j*3+1) % 1000 / 1000)
    val viaQuery = graft.SparkEntry.queries("mm_features")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(j => math.round(r.getDouble(j) * 1000).toInt)).toMap
    val viaDecode = Multimodal.decodeFeatures(Multimodal.media(spark, sf))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => math.round(f * 1000)).toSeq).toMap
    assert(viaQuery.keySet === viaDecode.keySet)
    viaQuery.foreach { case (id, feats) =>
      assert(feats === viaDecode(id), s"doc $id")
    }
  }

  test("frame sampling never materializes skipped frames") {
    val out = graft.SparkEntry.queries("mm_frame_sample")(spark, sf)
    val frames = out.select(col("frame_no")).distinct()
      .collect().map(_.getLong(0))
    assert(frames.forall(_ % 4 === 0))
  }

  test("media metadata mime partition is total") {
    val counts = Multimodal.media(spark, sf)
      .groupBy(col("mime")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("image/png", "audio/wav", "video/mp4")))
    assert(counts.values.sum ===
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("resize fits the 128-box, preserves aspect, and bounds the sample") {
    val dims = Multimodal.media(spark, sf)
      .select(col("doc_id"), col("width"), col("height")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val out = graft.SparkEntry.queries("mm_resize")(spark, sf).collect()
    assert(out.length === dims.size)
    out.foreach { r =>
      val (w, h) = dims(r.getLong(0))
      val (ow, oh) = (r.getLong(1), r.getLong(2))
      assert(math.max(ow, oh) === 128L, s"doc ${r.getLong(0)} long side")
      assert(ow <= 128 && oh <= 128)
      // aspect preserved to integer truncation: ow/oh within 1 unit of
      // the exact scaled value
      val scale = 128.0 / math.max(w, h)
      assert(math.abs(ow - w * scale) <= 1 && math.abs(oh - h * scale) <= 1)
      assert(r.getLong(4) <= 256, "sampled payload exceeds the stub budget")
    }
  }

  test("frame dedup reports exactly the cross-doc repeated frames") {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val frames = docs.flatMap { case (id, text, nChars) =>
      (0L to nChars / 64).filter(_ * 64 < nChars).map { f =>
        val start = (f * 64).toInt
        val fp = h32(text.slice(start, start + 64))
        (fp, id)
      }
    }
    val want = frames.groupBy(_._1).collect {
      case (fp, occ) if occ.map(_._2).distinct.length >= 2 =>
        fp -> (occ.map(_._2).distinct.length.toLong, occ.length.toLong,
          occ.map(_._2).min)
    }
    val got = graft.SparkEntry.queries("mm_frame_dedup")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === want.toMap)
    assert(got.nonEmpty)
  }

  test("shard manifest replays the sequential packing fold exactly") {
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length.toLong)
      .sortBy(_._1)
    // the sequential reference: running byte total in doc order,
    // shard = start byte / target, offset = start byte - shard start
    var cum = 0L
    val want = sizes.map { case (id, n) =>
      val shard = cum / 4096L
      val row = (id, shard, cum, n)
      cum += n
      row
    }
    // rebase offsets to each shard's first asset
    val base = want.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    val wantRows = want.map { case (id, sh, cb, n) => (id, sh, cb - base(sh), n) }
    val got = graft.SparkEntry.queries("mm_shard_manifest")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === wantRows.toSeq)
    // shards are contiguous byte ranges: within a shard each offset is
    // the previous offset + previous size
    got.groupBy(_._2).values.foreach { rows =>
      rows.sortBy(_._1).sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4)
        case _ =>
      }
    }
    assert(got.map(_._2).distinct.length > 1, "packing produced one shard")
  }

  // ---- round 9: REAL PNG decode --------------------------------------

  test("png round trip: imageio decode reproduces the closed form") {
    import graft.ops.Multimodal
    // one image end-to-end without Spark: encode → real PNG bytes →
    // decode; PNG magic proves a real codec ran, values match closed form
    val bytes = Multimodal.pngBytes(7L)
    assert(bytes.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47),
      "payload is not a real PNG stream")
    val dec = new Multimodal.PngDecoder
    val (w, h, sum) = dec.decode(bytes)
    def h32(str: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    assert(w === (8 + h32("imw:7") % 9).toInt)
    assert(h === (8 + h32("imh:7") % 9).toInt)
    val want = (for (y <- 0 until h; x <- 0 until w)
      yield h32(s"px:7:$x:$y") % 16777216).sum
    assert(sum === want)
  }

  test("decodeImages instantiates ONE decoder per partition, not per row") {
    import graft.ops.Multimodal
    val media = Multimodal.pngMedia(spark, sf).repartition(3)
    val before = Multimodal.decoderInits.get()
    val n = Multimodal.decodeImages(media).count()
    val inits = Multimodal.decoderInits.get() - before
    assert(n > 100, s"need enough rows to make the claim meaningful: $n")
    // local mode shares the JVM, so the counter sees every partition's
    // construction; nonEmptyPartitions <= 3 by the repartition
    assert(inits <= 3,
      s"decoder built $inits times for 3 partitions / $n rows — " +
        "the amortization contract is broken")
    assert(inits >= 1)
  }
}

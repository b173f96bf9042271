package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.XF
import graft.sources.Tables.t

/** Multimodal-column operators (SURVEY.md §2.8): media treated as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (md5-derived features, clearly marked below); the
  * Spark-side plumbing — binary columns, metadata schema, per-batch
  * `mapPartitions` decode, frame explode — is real and is what matters
  * structurally: swap `stubDecode` for a codec call and nothing else
  * changes.
  *
  * Scale design: payloads stay opaque bytes until the decode stage;
  * metadata predicates (mime, size) push down to the parquet scan so
  * decode only ever sees selected rows. `mapPartitions` amortizes any
  * per-codec init across a whole partition (the reason it beats a per-row
  * UDF for real decoders), and frame sampling explodes AFTER the sample
  * filter is applied to the index sequence, never materializing skipped
  * frames.
  */
object Multimodal {

  val FrameBytes = 64

  /** Documents with a synthetic binary payload + typed media metadata.
    * (Payload = UTF-8 bytes of `text`; real pipelines read these bytes
    * from object storage — the column shape is identical.)
    */
  def media(spark: SparkSession, d: String): DataFrame =
    t(spark, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("source") === "src0", "image/png")
        .when(col("source") === "src1", "audio/wav")
        .otherwise("video/mp4").as("mime"),
      (lit(64) + XF.h32(col("text"), 1) % 192).cast(IntegerType).as("width"),
      (lit(64) + XF.h32(col("text"), 9) % 192).cast(IntegerType).as("height"),
      (floor(col("n_chars") / FrameBytes) + 1).cast(IntegerType).as("n_frames"),
      col("n_chars"), col("text"))

  private val mimeSql =
    """CASE WHEN source = 'src0' THEN 'image/png'
      |     WHEN source = 'src1' THEN 'audio/wav'
      |     ELSE 'video/mp4' END""".stripMargin

  /** DETERMINISTIC STUB for media decode → 8-dim feature vector.
    * A real implementation replaces the body with a codec call over
    * `payload`; signature and call sites stay as-is.
    *
    * Feature j = (h32(md5, offset j*3+1) % 1000) / 1000 — the exact
    * formula `mm_features` computes with [[XF.h32]] column expressions,
    * so the oracle-checked flat query validates THIS decoder's output
    * (asserted in MultimodalSpec). All 8-hex windows fit the 32-char
    * digest (last offset 22 + 8 = 30).
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    (0 until 8).map { j =>
      (java.lang.Long.parseLong(hex.substring(j * 3, j * 3 + 8), 16) % 1000)
        .toFloat / 1000f
    }.toArray
  }

  // ---- REAL image decode (round 9) ---------------------------------
  // The stub queries above keep the reference-era contract; this family
  // exercises an ACTUAL codec: javax.imageio's PNG reader/writer (part
  // of the JDK — the one real image codec this container has). The
  // image content is a closed-form function of doc_id, so the oracle
  // recomputes (width, height, pixel sum) in pure SQL and the
  // hash-compare verifies the full encode→bytes→decode round trip
  // through the real codec, not a fixture.

  /** Thread-local MessageDigest for the JVM twin of [[XF.h32]] (8 hex
    * chars of md5, parsed base 16): the sf1 sweep measured
    * `getInstance("MD5")` per call as a real cost at 13M pixel hashes
    * (MessageDigest is not thread-safe, so the reuse is per task
    * thread, reset by `digest()` itself).
    */
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  // ---- allocation-free h32 for the per-pixel hot path ---------------
  // The sf10 decode drive (BENCH_TAILS 64 s line) is dominated by GC:
  // the string form of the closed-form key costs ~3 allocations per
  // pixel (interpolated String, UTF-8 byte[], 16-byte digest) — ~440
  // per image, 220M across the 500k-image corpus. The hot path below
  // writes ASCII digits into a reusable per-thread buffer and digests
  // in place; the bytes fed to MD5 are identical to
  // `s"px:$id:$x:$y".getBytes("UTF-8")`, so the closed form (and the
  // SQL oracle that recomputes it) is unchanged.
  private val PxPrefix = "px:".getBytes("UTF-8")
  private val ImwPrefix = "imw:".getBytes("UTF-8")
  private val ImhPrefix = "imh:".getBytes("UTF-8")
  private val keyBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](48)
  }
  private val digBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }
  /** ASCII digits of v (>= 0) into buf at off; returns the end offset.
    * Matches Long.toString for the non-negative ids/coords used here. */
  private def putDigits(buf: Array[Byte], off: Int, v: Long): Int = {
    if (v == 0) { buf(off) = '0'; return off + 1 }
    var n = 0; var d = v
    while (d > 0) { n += 1; d /= 10 }
    var i = off + n - 1; var r = v
    while (r > 0) { buf(i) = ('0' + (r % 10).toInt).toByte; r /= 10; i -= 1 }
    off + n
  }
  /** h32 of "<prefix><id>" (x < 0) or "<prefix><id>:<x>:<y>". */
  private def h32fast(prefix: Array[Byte], id: Long, x: Int, y: Int): Long = {
    val buf = keyBuf.get()
    System.arraycopy(prefix, 0, buf, 0, prefix.length)
    var off = putDigits(buf, prefix.length, id)
    if (x >= 0) {
      buf(off) = ':'; off = putDigits(buf, off + 1, x.toLong)
      buf(off) = ':'; off = putDigits(buf, off + 1, y.toLong)
    }
    val md = md5Local.get()
    md.update(buf, 0, off)
    val d = digBuf.get()
    md.digest(d, 0, 16)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Deterministic REAL PNG payload per document: dims
    * 8 + h32("imw:<id>") % 9 by 8 + h32("imh:<id>") % 9 (8..16 px),
    * pixel (x,y) = the 24-bit value h32("px:<id>:<x>:<y>") % 2^24,
    * encoded through javax.imageio. PNG is lossless, so the decoded
    * RGB values equal the closed form exactly.
    */
  def pngBytes(id: Long): Array[Byte] = {
    val w = (8 + h32fast(ImwPrefix, id, -1, -1) % 9).toInt
    val h = (8 + h32fast(ImhPrefix, id, -1, -1) % 9).toInt
    // reuse one BufferedImage per (w, h) per thread (dims span 8..16,
    // 81 shapes) and write pixels straight into the INT_RGB backing
    // array — setRGB per pixel routes through the ColorModel. Every
    // pixel is overwritten, so reuse cannot bleed between images.
    val cache = encImgCache.get()
    val key = Integer.valueOf(w * 32 + h)
    var img = cache.get(key)
    if (img == null) {
      img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      cache.put(key, img)
    }
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(i) = (h32fast(PxPrefix, id, x, y) % 16777216).toInt
        i += 1; x += 1
      }
      y += 1
    }
    val baos = baosLocal.get()
    baos.reset()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private val encImgCache = new ThreadLocal[
      java.util.HashMap[Integer, java.awt.image.BufferedImage]] {
    override def initialValue() =
      new java.util.HashMap[Integer, java.awt.image.BufferedImage]()
  }
  private val baosLocal = new ThreadLocal[java.io.ByteArrayOutputStream] {
    override def initialValue() = new java.io.ByteArrayOutputStream(2048)
  }

  /** Real-PNG media frame: (doc_id, payload) with payload = actual PNG
    * bytes. Typed map (codegen irrelevant for a codec stage); the
    * closed-form content makes it deterministic at any parallelism.
    *
    * Repartitioned to the session parallelism BEFORE the map: the
    * documents table is one small parquet file, so the scan is a
    * single partition — and a codec stage inheriting it runs the
    * whole corpus on ONE core (the sf1 sweep measured exactly that:
    * 202 s single-threaded, ~8 s spread across 32). Parquet bytes are
    * splittable by ROW GROUP, not arbitrarily, so a compute-heavy
    * stage downstream of a small-file scan must rebalance explicitly
    * — the general 100 TB rule when a scan's partitioning reflects
    * FILE layout, not downstream compute cost.
    */
  def pngMedia(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    t(spark, d, "documents").select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => (id, pngBytes(id)))
      .toDF("doc_id", "payload")
  }

  /** Observability hook for the amortization contract: incremented once
    * per [[PngDecoder]] construction. In local mode the spec reads it
    * to assert instantiations == #partitions (NOT #rows); on a real
    * cluster it counts per-executor constructions the same way a codec
    * handle pool would.
    */
  val decoderInits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** JVM codec first-touch: one tiny encode + decode forces ImageIO's
    * plugin-registry scan, the PNG reader/writer class-init, and the
    * first compilation of the codec path — once per JVM. Bench calls
    * this in the UNTIMED warmup: otherwise the cost lands inside
    * whichever mm query a sweep happens to run first (the r14 sf1
    * watch: `mm_decode_image` read 3.36 s in the full sweep vs its
    * 1.64 s filtered record purely from this first-touch). Milliseconds
    * of work; in local mode one JVM covers every task thread, and on a
    * real cluster the same call belongs in an executor-startup hook.
    */
  def warmCodec(): Unit = {
    val dec = new PngDecoder
    dec.decode(pngBytes(0L))
    ()
  }

  /** The per-partition decoder handle — the thing whose construction
    * cost `mapPartitions` exists to amortize (for javax.imageio the
    * analogue of reusing reader instances instead of the static
    * convenience path per row).
    */
  final class PngDecoder {
    Multimodal.decoderInits.incrementAndGet()
    private val readers = javax.imageio.ImageIO
      .getImageReadersByFormatName("png")
    private val reader = if (readers.hasNext) readers.next() else null
    // Reused per-decoder state (one decoder per partition): destination
    // images per (w, h) so the reader fills an existing raster instead
    // of allocating one per row (full-frame reads overwrite every
    // pixel, so reuse cannot bleed), plus a samples buffer for the bulk
    // raster read — getRGB per pixel routes each sample through the
    // ColorModel. The sf10 line (64 s / 500k images) was adjudicated
    // allocator/GC-bound, so the shave is allocation count, not math.
    private val dest =
      new java.util.HashMap[Integer, java.awt.image.BufferedImage]()
    private val param = if (reader != null) reader.getDefaultReadParam else null
    private var samples = new Array[Int](16 * 16 * 3)
    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img = try {
        if (reader != null) {
          reader.setInput(iis)
          try {
            val w = reader.getWidth(0); val h = reader.getHeight(0)
            val key = Integer.valueOf(w * 1024 + h)
            var d = dest.get(key)
            if (d == null) {
              d = reader.getImageTypes(0).next().createBufferedImage(w, h)
              dest.put(key, d)
            }
            param.setDestination(d)
            reader.read(0, param)
          } finally reader.setInput(null)
        } else javax.imageio.ImageIO.read(iis)
      } finally iis.close()
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L
      if (raster.getNumBands == 3) {
        // bulk read: samples in band order R,G,B per pixel — for the
        // 8-bit sRGB rasters the PNG reader produces this equals
        // getRGB & 0xffffff with no per-pixel ColorModel hop (the
        // round-trip spec pins the equality against the closed form)
        val n = w * h * 3
        if (samples.length < n) samples = new Array[Int](n)
        raster.getPixels(0, 0, w, h, samples)
        var i = 0
        while (i < n) {
          sum += (samples(i).toLong << 16) | (samples(i + 1) << 8) |
            samples(i + 2)
          i += 3
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += (img.getRGB(x, y) & 0xffffff).toLong
            x += 1
          }
          y += 1
        }
      }
      (w, h, sum)
    }
  }

  /** Per-partition REAL image decode: one [[PngDecoder]] per partition
    * (the amortization the stub stage only asserted), emitting integer
    * (width, height, pixel sum) the oracle recomputes in closed form.
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("img_w", LongType),
      StructField("img_h", LongType),
      StructField("pixel_sum", LongType)))
    df.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        val dec = new PngDecoder
        rows.map { r =>
          val (w, h, s) = dec.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), w.toLong, h.toLong, s)
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  /** Per-partition batch decode: the real multimodal plumbing (schema in,
    * schema out, one decoder instance per partition).
    */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    df.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, model)
        rows.map { r =>
          Row(r.getLong(0), stubDecode(r.getAs[Array[Byte]](1)))
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // metadata extraction over binary payloads (pushdown-friendly: only
    // metadata columns are touched, payload bytes never deserialize).
    "mm_meta" -> ((s: SparkSession, d: String) =>
      media(s, d)
        .select(col("doc_id"), col("mime"), col("width"), col("height"),
          octet_length(col("payload")).as("payload_bytes"), col("n_frames"))
        .orderBy(col("doc_id"))),

    // frame sampling: every 4th frame index, fingerprint of frame bytes.
    // The sample filter runs on the index sequence BEFORE substring
    // extraction — skipped frames are never materialized.
    "mm_frame_sample" -> ((s: SparkSession, d: String) =>
      media(s, d)
        .select(col("doc_id"), col("text"),
          explode(filter(sequence(lit(0), col("n_frames") - 1),
            i => i % 4 === 0)).as("frame_no"))
        .select(col("doc_id"), col("frame_no").cast(LongType).as("frame_no"),
          XF.h32(col("text")
            .substr(col("frame_no") * FrameBytes + lit(1), lit(FrameBytes)))
            .as("frame_fp"))
        .orderBy(col("doc_id"), col("frame_no"))),

    // feature extraction via the stub decoder, flattened to scalar
    // columns so the oracle can hash-compare — SAME formula as
    // stubDecode (payload is the UTF-8 of text, so md5 digests match).
    "mm_features" -> ((s: SparkSession, d: String) => {
      val feats = (0 until 8).map(j =>
        ((XF.h32(col("text"), j * 3 + 1) % 1000).cast(DoubleType) / 1000.0)
          .as(s"feat_$j"))
      media(s, d).select(col("doc_id") +: feats: _*).orderBy(col("doc_id"))
    }),

    // mapPartitions decode plumbing, flattened to (doc_id, feat_no, value)
    // rows so the output is scalar-only (array columns crash the driver's
    // pandas sort) AND oracle-checkable: the stub decoder's formula is
    // expressible in SQL. Float->double repr error is ~1e-8 on the k/1000
    // values, so round(6) is exact on both sides.
    "mm_decode_batch" -> ((s: SparkSession, d: String) =>
      decodeFeatures(media(s, d))
        .select(col("doc_id"), posexplode(col("features")))
        .select(col("doc_id"), col("pos").cast(LongType).as("feat_no"),
          XF.r6(col("col").cast(DoubleType)).as("feat_val"))
        .orderBy(col("doc_id"), col("feat_no")))
  ,

    // REAL codec round trip (round 9): encode closed-form pixels to
    // actual PNG bytes, decode them with javax.imageio inside the
    // one-decoder-per-partition mapPartitions stage, emit integer
    // (dims, pixel sum). The oracle recomputes the closed form in pure
    // SQL — a hash match proves the real encode→decode round trip,
    // which the stub family could only assert structurally.
    "mm_decode_image" -> ((s: SparkSession, d: String) =>
      decodeImages(pngMedia(s, d))
        // barrier before the global sort: the range exchange SAMPLES by
        // re-executing its child, and the child here is the whole
        // encode→decode codec stage — without the barrier the PNG work
        // runs twice (the general rule in BASELINE.md's round-11 notes)
        .repartition(col("doc_id"))
        .orderBy(col("doc_id")))
  ,

    // RESIZE plumbing: aspect-preserving fit into a 128×128 box (integer
    // arithmetic — exact in both engines) plus a DETERMINISTIC STUB for
    // the pixel work: stride-sample the payload down to ≤256 bytes and
    // fingerprint the result (a real pipeline swaps the sampler for a
    // codec resize; dims, stride, batch shape and output schema are the
    // real contract — same stub discipline as [[stubDecode]]). Narrow
    // per-row expressions, embarrassingly parallel, no shuffle before
    // the output sort; the payload is touched ONCE, after metadata-only
    // arithmetic decides the target shape.
    "mm_resize" -> ((s: SparkSession, d: String) => {
      val longSide = greatest(col("width"), col("height")).cast(LongType)
      // empty payload guard: n_chars = 0 would make the stride 0 and
      // the sample count 0/0 — an ANSI divide-by-zero. stride floors
      // at 1; n_sampled is then 0 and the empty sequence produces the
      // empty-string fingerprint, which is the right degenerate answer.
      val stride = greatest(
        ceil(col("n_chars").cast(DoubleType) / 256.0).cast(LongType),
        lit(1L))
      val nS = ceil(col("n_chars").cast(DoubleType) /
        col("stride").cast(DoubleType)).cast(LongType)
      // sampling-loop-heavy per-row stage: spread off the file-layout-
      // bound scan (the codec-stage rule, pngMedia above)
      media(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("out_w",
          floor(col("width") * 128 / longSide).cast(LongType))
        .withColumn("out_h",
          floor(col("height") * 128 / longSide).cast(LongType))
        .withColumn("stride", stride)
        .withColumn("n_sampled", nS)
        // gather the stride-sampled chars from ONE split pass: substr at
        // each sampled index rescans the UTF-8 string from the start
        // (O(n_sampled · n_chars) per row — measured ~5× the whole query
        // at sf0.1), while element_at on the pre-split array is O(1).
        // The split is hoisted to its own column — inside the transform
        // lambda it would re-evaluate per element.
        .withColumn("chars", split(col("text"), ""))
        // sequence(0, -1) DESCENDS in Spark, so an empty doc
        // (n_sampled = 0) takes the empty-array branch explicitly
        .withColumn("resized_fp", XF.h32(array_join(
          transform(
            when(col("n_sampled") > 0,
              sequence(lit(0L), col("n_sampled") - 1))
              .otherwise(array().cast("array<bigint>")),
            i => element_at(col("chars"),
              (i * col("stride") + 1).cast(IntegerType))), "")))
        .select(col("doc_id"), col("out_w"), col("out_h"),
          col("stride"), col("n_sampled"), col("resized_fp"))
        .orderBy(col("doc_id"))
    }),

    // FRAME-LEVEL DEDUP — near-dup detection at the frame granularity
    // (intros, logos, and freeze frames repeat across videos): every
    // frame's fingerprint groups corpus-wide, and fingerprints seen in
    // more than one document are reported with their occurrence count
    // and keeper (min doc). One explode + one fp-keyed groupBy with
    // map-side partials — frame volume is payload/FrameBytes, and the
    // group key space collapses to the distinct-frame count.
    "mm_frame_dedup" -> ((s: SparkSession, d: String) =>
      media(s, d)
        .select(col("doc_id"), col("text"),
          // exclude frames starting past the payload end: a doc whose
          // length is an exact multiple of FrameBytes gets a trailing
          // EMPTY frame from the n_frames formula, and the constant
          // empty-string fingerprint would link every such doc into one
          // bogus "repeated frame" cluster
          explode(filter(sequence(lit(0), col("n_frames") - 1),
            i => i * FrameBytes < col("n_chars"))).as("frame_no"))
        .select(col("doc_id"),
          XF.h32(col("text")
            .substr(col("frame_no") * FrameBytes + lit(1), lit(FrameBytes)))
            .as("frame_fp"))
        // two-level (the agg_count_distinct pattern): grouping by
        // (frame_fp, doc_id) first avoids the Expand a mixed
        // distinct/plain aggregate plans, and every output aggregate
        // recovers exactly from the pair rows — n_docs = count of pair
        // rows, n_frames = sum of pair counts, kept_doc_id = min over
        // pair keys
        .groupBy(col("frame_fp"), col("doc_id"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("frame_fp"))
        .agg(count(col("doc_id")).as("n_docs"),
          sum(col("cnt")).as("n_frames"),
          min(col("doc_id")).as("kept_doc_id"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("frame_fp"))),

    // exact payload dedup on the BYTES (round 4): the asset-level
    // counterpart of dedup_exact — identical media shipped under
    // different doc ids collapses on a binary md5, without ever decoding.
    // One hash-groupBy shuffle of (16-byte digest, id), map-side
    // partials; the first dedup pass a multimodal lake runs, before any
    // decode cost is spent.
    "mm_payload_dedup" -> ((s: SparkSession, d: String) =>
      media(s, d)
        .groupBy(md5(col("payload")).as("payload_md5"))
        .agg(min(col("doc_id")).as("kept_doc_id"),
          count(lit(1)).as("n_copies"),
          min(col("mime")).as("mime"))
        .select(col("kept_doc_id"), col("n_copies"), col("mime"))
        .orderBy(col("kept_doc_id")))
  ) ++ Seq(

    // TRAINING-SHARD MANIFEST (the WebDataset/tar-shard layout op): pack
    // assets in one global id order into byte-budgeted shards and emit
    // each asset's (shard, byte offset) — the manifest a dataloader
    // seeks by. Assignment rule is the distributed-friendly START-BYTE
    // form: shard = floor(bytes_before / target) on the global running
    // byte total — an asset straddling a boundary belongs wholly to its
    // start shard (shards overflow by at most one asset, the documented
    // trade that makes packing a PREFIX SUM instead of a sequential
    // first-fit loop). The running total is `Scan.runningOver` — the
    // round-7 two-level scan, so no data-sized global window; the
    // offset-within-shard window partitions by shard (assets-per-shard
    // bounded by target/min-asset-size). One artifact consumer chain,
    // corpus scanned once.
    "mm_shard_manifest" -> ((s: SparkSession, d: String) => {
      val target = 4096L
      val assets = media(s, d).select(col("doc_id"),
        length(col("payload")).cast(LongType).as("n_bytes"))
      val run = graft.ops.Scan.runningOver(assets, col("doc_id"),
        desc = false, Seq(col("doc_id")), Seq(("cum", col("n_bytes"))))
      val wShard = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard_id"))
      run.withColumn("cb", col("cum") - col("n_bytes"))
        .withColumn("shard_id", expr(s"cb DIV $target"))
        .withColumn("offset_bytes", col("cb") - min(col("cb")).over(wShard))
        .select(col("doc_id"), col("shard_id"), col("offset_bytes"),
          col("n_bytes"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "mm_meta" ->
      s"""SELECT doc_id, $mimeSql AS mime,
         |  CAST(64 + ${XF.h32Sql("text", 1)} % 192 AS INTEGER) AS width,
         |  CAST(64 + ${XF.h32Sql("text", 9)} % 192 AS INTEGER) AS height,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes,
         |  CAST(floor(n_chars / $FrameBytes) + 1 AS INTEGER) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      s"""SELECT doc_id, frame_no,
         |  ${XF.h32Sql(s"substr(text, frame_no * $FrameBytes + 1, $FrameBytes)")} AS frame_fp
         |FROM (
         |  SELECT doc_id, text, unnest(range(0, CAST(floor(n_chars / $FrameBytes) + 1 AS BIGINT))) AS frame_no
         |  FROM documents)
         |WHERE frame_no % 4 = 0
         |ORDER BY doc_id, frame_no""".stripMargin,

    "mm_frame_dedup" ->
      s"""WITH fr AS (
         |  SELECT doc_id,
         |    ${XF.h32Sql(s"substr(text, frame_no * $FrameBytes + 1, $FrameBytes)")}
         |      AS frame_fp
         |  FROM (
         |    SELECT doc_id, text, n_chars,
         |      unnest(range(0, CAST(floor(n_chars / $FrameBytes) + 1 AS BIGINT)))
         |        AS frame_no
         |    FROM documents)
         |  WHERE frame_no * $FrameBytes < n_chars)
         |SELECT frame_fp, COUNT(DISTINCT doc_id) AS n_docs,
         |  COUNT(*) AS n_frames, MIN(doc_id) AS kept_doc_id
         |FROM fr GROUP BY frame_fp HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY frame_fp""".stripMargin,

    "mm_features" -> {
      val feats = (0 until 8).map(j =>
        s"CAST(${XF.h32Sql("text", j * 3 + 1)} % 1000 AS DOUBLE) / CAST(1000 AS DOUBLE) AS feat_$j")
        .mkString(",\n  ")
      s"""SELECT doc_id,
         |  $feats
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // same formula as stubDecode, row-per-feature; the float cast on the
    // Spark side is absorbed by round(6) (see query comment).
    "mm_decode_batch" ->
      s"""SELECT doc_id, j AS feat_no,
         |  ROUND(CAST(CAST(('0x' || substr(md5(text), CAST(j * 3 + 1 AS INTEGER), 8)) AS BIGINT) % 1000 AS DOUBLE)
         |        / CAST(1000 AS DOUBLE), 6) AS feat_val
         |FROM documents, (SELECT unnest(range(8)) AS j)
         |ORDER BY doc_id, feat_no""".stripMargin,

    // the decoded dims and pixel sum in closed form — a match proves
    // the Spark side's REAL PNG encode→decode round trip (lossless
    // codec, md5-derived content; same h32 both engines)
    "mm_decode_image" ->
      s"""WITH dims AS (
         |  SELECT doc_id,
         |    CAST(8 + ${XF.h32Sql("'imw:' || doc_id")} % 9 AS BIGINT)
         |      AS img_w,
         |    CAST(8 + ${XF.h32Sql("'imh:' || doc_id")} % 9 AS BIGINT)
         |      AS img_h
         |  FROM documents)
         |SELECT doc_id, img_w, img_h,
         |  CAST(SUM(${XF.h32Sql("'px:' || doc_id || ':' || x || ':' || y")}
         |    % 16777216) AS BIGINT) AS pixel_sum
         |FROM dims, unnest(range(0, img_w)) tx(x),
         |     unnest(range(0, img_h)) ty(y)
         |GROUP BY doc_id, img_w, img_h
         |ORDER BY doc_id""".stripMargin,

    // same stride-sample formula; string_agg(... ORDER BY i) rebuilds the
    // sampled string deterministically.
    "mm_resize" ->
      s"""WITH m AS (
         |  SELECT doc_id, text, n_chars,
         |    CAST(64 + ${XF.h32Sql("text", 1)} % 192 AS BIGINT) AS width,
         |    CAST(64 + ${XF.h32Sql("text", 9)} % 192 AS BIGINT) AS height,
         |    GREATEST(CAST(ceil(CAST(n_chars AS DOUBLE) /
         |      CAST(256 AS DOUBLE)) AS BIGINT), 1) AS stride
         |  FROM documents),
         |m2 AS (
         |  SELECT *,
         |    CAST(floor(width * 128 / CAST(greatest(width, height) AS DOUBLE)) AS BIGINT) AS out_w,
         |    CAST(floor(height * 128 / CAST(greatest(width, height) AS DOUBLE)) AS BIGINT) AS out_h,
         |    CAST(ceil(CAST(n_chars AS DOUBLE) / CAST(stride AS DOUBLE)) AS BIGINT) AS n_sampled
         |  FROM m),
         |samp AS (
         |  SELECT doc_id,
         |    string_agg(substr(text, CAST(1 + i * stride AS INTEGER), 1), '' ORDER BY i) AS rs
         |  FROM m2, unnest(range(0, n_sampled)) t(i)
         |  GROUP BY doc_id)
         |SELECT m2.doc_id, out_w, out_h, stride, n_sampled,
         |  ${XF.h32Sql("COALESCE(rs, '')")} AS resized_fp
         |FROM m2 LEFT JOIN samp ON m2.doc_id = samp.doc_id
         |ORDER BY m2.doc_id""".stripMargin,

    // DuckDB's md5 takes VARCHAR only; payload IS the UTF-8 encoding of
    // text, so md5(text) digests the same bytes the Spark side hashes.
    "mm_payload_dedup" ->
      s"""SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies,
         |  MIN(mime) AS mime
         |FROM (SELECT doc_id, md5(text) AS pm, $mimeSql AS mime
         |      FROM documents)
         |GROUP BY pm ORDER BY kept_doc_id""".stripMargin,

    // oracle: the plain global running sum (fine at oracle scale); the
    // Spark side's two-level scan must place every byte identically
    "mm_shard_manifest" ->
      s"""WITH a AS (
         |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT)
         |    AS n_bytes
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_bytes,
         |    CAST(COALESCE(SUM(n_bytes) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb
         |  FROM a),
         |sh AS (SELECT *, CAST(cb // 4096 AS BIGINT) AS shard_id FROM c)
         |SELECT doc_id, shard_id,
         |  CAST(cb - MIN(cb) OVER (PARTITION BY shard_id) AS BIGINT)
         |    AS offset_bytes,
         |  n_bytes
         |FROM sh ORDER BY doc_id""".stripMargin
  )
}

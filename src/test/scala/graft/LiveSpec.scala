package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.api.Live

/** Live-mode plumbing (S1/P2/P5): the full partition loop driven by a
  * fake transport — rate limiting, miss handling (the Nonewnv.log:10
  * empty-result case), URL shape, and the driver-side sheet download.
  */
/** Deterministic fake Nominatim: address "q=MISS..." returns the empty
  * array the reference trace shows for its unmatched address
  * (Nonewnv.log:10); "q=BOOM..." throws; anything else returns one
  * result whose coords derive from the query length. Top-level so the
  * mapPartitions closure serializes it without dragging the suite along.
  */
private class FakeTransport extends Live.Transport {
  override def get(url: String): String = {
    val q = url.substring(url.indexOf("?q=") + 3).takeWhile(_ != '&')
    if (q.startsWith("MISS")) "[]"
    else if (q.startsWith("BOOM")) throw new RuntimeException("transport down")
    else s"""[{"place_id":1,"lon":"-105.${q.length}","lat":"40.${q.length}"}]"""
  }
}

class LiveSpec extends SparkSpec {

  test("geocodeLive appends coords; empty results and errors yield nulls") {
    import spark.implicits._
    val df = Seq("100 Main St", "MISS 1 Elm St", "BOOM 2 Oak St", "7 Pine Ave")
      .toDF("addr")
    val out = Live.geocodeLive(df, "addr", new FakeTransport,
      endpoint = "http://fake/search", ratePerSec = 1e6)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else (r.getDouble(1), r.getDouble(2)))).toMap
    assert(out("MISS 1 Elm St") == null)   // empty result → miss
    assert(out("BOOM 2 Oak St") == null)   // transport error → miss
    // hits parse data[0].lon/lat as doubles (query is URL-encoded,
    // "100 Main St" → "100+Main+St" = 11 chars)
    assert(out("100 Main St") == ((-105.11, 40.11)))
    assert(out("7 Pine Ave") == ((-105.10, 40.10)))
    // miss-drop parity with the mock path's P4 null filter
    val kept = Live.geocodeLive(df, "addr", new FakeTransport,
      endpoint = "http://fake/search", ratePerSec = 1e6)
      .filter(col("lon").isNotNull && col("lat").isNotNull).count()
    assert(kept === 2)
  }

  test("token bucket enforces strict request spacing (injected clock)") {
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bucket = new Live.TokenBucket(2.0, // 500 ms interval
      nanoTime = () => now,
      sleepNs = ns => { sleeps += ns; now += ns }) // sleeping advances time
    bucket.acquire()                 // first call: no wait
    bucket.acquire()                 // must wait the full 500 ms
    now += 200 * 1000000L            // 200 ms of work elapses
    bucket.acquire()                 // must wait the remaining 300 ms
    assert(sleeps.toSeq === Seq(500 * 1000000L, 300 * 1000000L))
  }

  test("geocodeLive wall-clock respects the per-partition rate") {
    import spark.implicits._
    val df = (1 to 5).map(i => s"$i Test Rd").toDF("addr")
    val t0 = System.nanoTime()
    Live.geocodeLive(df, "addr", new FakeTransport,
      endpoint = "http://fake/search", ratePerSec = 20.0).count()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // 5 rows in one partition at 20 req/s → at least 4 × 50 ms of spacing
    assert(elapsedMs >= 200, s"rate limiter not applied: ${elapsedMs}ms")
  }

  test("downloadSheet writes the response verbatim and spark.read parses it") {
    val dir = Files.createTempDirectory("live")
    val csv = "Street Address,City\n1 Main St,Boulder\n2 Elm St,Boulder\n"
    val transport = new Live.Transport {
      override def get(url: String): String = { assert(url.contains("sheet")); csv }
    }
    val dest = Live.downloadSheet("http://fake/sheet.csv",
      dir.resolve("opt_out.csv"), transport)
    assert(new String(Files.readAllBytes(dest), "UTF-8") === csv)
    val df = spark.read.option("header", "true").csv(dest.toString)
    assert(df.count() === 2)
    assert(df.columns.toSeq === Seq("Street Address", "City"))
  }

  test("live path via HTTP stub feeds the SAME DAG and matches the mock e2e") {
    import graft.geo.Geo
    import graft.ops.Wnv
    // JVM replica of the mock geocoder (Geo.geocode*: md5-slice hashes),
    // served over REAL HTTP so the live chain — downloadSheet +
    // HttpTransport + geocodeLive's partition loop — runs end to end
    // against a 127.0.0.1 stub, then hands its points to the IDENTICAL
    // downstream DAG (eraseSelectionFrom + zoneTargetCounts) the
    // oracle-checked wnv_pipeline_e2e uses. Result equality proves the
    // two acquisition paths share one pipeline.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String, off: Int): Long =
      java.lang.Long.parseLong(md5hex(s).substring(off - 1, off + 7), 16)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b); ex.close()
    }
    val sheetCsv = {
      val rows = spark.read.parquet(s"$sf/customer.parquet")
        .select(col("c_custkey"), col("c_name"))
        .collect().map(r => s"${r.getLong(0)},${r.getString(1)}")
      ("c_custkey,c_name" +: rows.toSeq).mkString("\n")
    }
    server.createContext("/sheet",
      (ex: com.sun.net.httpserver.HttpExchange) => respond(ex, sheetCsv))
    server.createContext("/search",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val q = ex.getRequestURI.getRawQuery.split("&")
          .collectFirst { case kv if kv.startsWith("q=") =>
            java.net.URLDecoder.decode(kv.substring(2), "UTF-8") }.get
        if (h32(q, 1) % 20 == 0) respond(ex, "[]") // deterministic miss
        else {
          val lon = -105.5 + (h32(q, 9) % 100000).toDouble / 200000.0
          val lat = 39.9 + (h32(q, 17) % 100000).toDouble / 333333.0
          respond(ex, s"""[{"place_id":1,"lon":"$lon","lat":"$lat"}]""")
        }
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val transport = new Live.HttpTransport
      val dest = Live.downloadSheet(s"$base/sheet",
        Files.createTempDirectory("live_e2e").resolve("sheet.csv"), transport)
      val sheet = spark.read.option("header", "true")
        .schema("c_custkey LONG, c_name STRING").csv(dest.toString)
      val livePts = Live.geocodeLive(
          sheet.select(col("c_custkey"),
            concat(col("c_name"), lit(" Boulder CO")).as("addr")),
          "addr", transport, endpoint = s"$base/search",
          ratePerSec = 1e6, partitions = 4)
        .filter(col("lon").isNotNull && col("lat").isNotNull)
        .select(col("c_custkey"), col("lon"), col("lat"),
          lit("Residential").as("addr_type"))
        .withColumn("x_ft", Geo.xFt(col("lon")))
        .withColumn("y_ft", Geo.yFt(col("lat")))
      val zn = Wnv.zones(spark, sf)
      val live = Wnv.zoneTargetCounts(
          Wnv.eraseSelectionFrom(livePts, zn,
            livePts.filter(col("c_custkey") % 10 === 0)), zn)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val mock = SparkEntry.queries("wnv_pipeline_e2e")(spark, sf)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(live.nonEmpty)
      assert(live === mock)
    } finally server.stop(0)
  }
}

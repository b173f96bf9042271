package graft.api

import java.net.{URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Live-mode plumbing for the S1/P2/P5 network surface of the reference
  * pipeline (reference Lab2ETL.py:12-19 sheet GET; Lab2ETL.py:22-45
  * per-row Nominatim lookup; Lab2ETL.py:72 1 s/row sleep).
  *
  * The CORRECTNESS surface deliberately uses the fixture snapshot and the
  * pure mock geocoder ([[graft.geo.Geo]]) — network calls are not
  * hash-checkable. This module is the production path those stand in for:
  *
  *   - [[Live.downloadSheet]] — the DRIVER-side acquisition step: fetch
  *     the published-sheet CSV once, write it verbatim to a local file,
  *     THEN `spark.read` it. One request total, never per-task; the
  *     data plane starts at the file.
  *   - [[Live.geocodeLive]] — the EXECUTOR-side enrichment: `mapPartitions`
  *     with one HTTP client and one [[Live.TokenBucket]] per partition.
  *     Global request rate is bounded by partitions × ratePerSec, so the
  *     OSM policy (1 req/s) is met by `partitions = 1, ratePerSec = 1` —
  *     the faithful reconstruction of the reference's sleep(1) loop —
  *     and a provider with a paid quota scales by raising either knob.
  *     An external service is a THROUGHPUT bound, not a compute bound:
  *     at 100 TB you geocode the deduplicated address dimension (tiny),
  *     never the fact stream.
  *
  * Transport is injected ([[Live.Transport]]) so specs drive the full
  * partition loop with a fake; [[Live.HttpTransport]] is the production
  * implementation (10 s timeout, identifying UA, per the API etiquette
  * the reference follows).
  */
object Live {

  /** Minimal injectable HTTP GET. Implementations must be serializable —
    * instances ship to executors inside the `mapPartitions` closure.
    * `get` returns the response body; it should throw on transport-level
    * failure (treated as a geocode miss, like the reference's
    * try/except → (None, None)).
    */
  trait Transport extends Serializable {
    def get(url: String): String
  }

  /** Production transport: java.net.http, 10 s timeout (reference
    * Lab2ETL.py:33), identifying User-Agent. The client is @transient
    * lazy — built once per executor after deserialization.
    */
  final class HttpTransport extends Transport {
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10))
        .build()
    override def get(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(URI.create(url))
        .timeout(java.time.Duration.ofSeconds(10))
        .header("User-Agent", "graft-spark-etl/0.1")
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      // a 429/5xx error body would otherwise parse as "no lon/lat" and
      // become a silent geocode miss, indistinguishable from a genuine
      // empty result — surface it as a transport failure instead (a
      // retrying caller can tell the two apart).
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()} from $url")
      resp.body()
    }
  }

  /** Strict-spacing rate limiter: `acquire()` blocks until at least
    * 1/ratePerSec has elapsed since the previous acquire — the
    * mapPartitions form of the reference's per-row sleep(1). Clock and
    * sleep are injectable for deterministic tests.
    */
  final class TokenBucket(
      ratePerSec: Double,
      nanoTime: () => Long = () => System.nanoTime(),
      sleepNs: Long => Unit = ns => Thread.sleep(ns / 1000000L, (ns % 1000000L).toInt))
    extends Serializable {
    require(ratePerSec > 0, "ratePerSec must be positive")
    private val intervalNs = (1e9 / ratePerSec).toLong
    private var nextFree = Long.MinValue
    def acquire(): Unit = {
      val now = nanoTime()
      if (nextFree == Long.MinValue) nextFree = now
      if (now < nextFree) sleepNs(nextFree - now)
      nextFree = math.max(now, nextFree) + intervalNs
    }
  }

  /** S1 live extract: GET `url` once on the driver, write the body
    * verbatim (UTF-8, reference Lab2ETL.py:16-18 forces utf-8) to
    * `dest`, return `dest` for `spark.read`. */
  def downloadSheet(url: String, dest: Path, transport: Transport): Path = {
    val body = transport.get(url)
    Files.createDirectories(dest.toAbsolutePath.getParent)
    Files.write(dest, body.getBytes(StandardCharsets.UTF_8))
    dest
  }

  private val LonRe = """"lon"\s*:\s*"?(-?[0-9.eE+-]+)"?""".r
  private val LatRe = """"lat"\s*:\s*"?(-?[0-9.eE+-]+)"?""".r

  /** Parse the first result's lon/lat from a Nominatim-shaped JSON array
    * (reference Lab2ETL.py:35-39: `data[0]['lon']` with float(); empty
    * array or unparsable → miss). Dependency-free by design — the only
    * fields consumed are the two string-encoded numerics.
    */
  private[api] def parseLonLat(body: String): (Option[Double], Option[Double]) = {
    val lon = LonRe.findFirstMatchIn(body).flatMap(m => m.group(1).toDoubleOption)
    val lat = LatRe.findFirstMatchIn(body).flatMap(m => m.group(1).toDoubleOption)
    (lon, lat)
  }

  /** P2+P5 live geocode: appends nullable `lon`/`lat` columns to `df` by
    * calling `endpoint` once per row from inside `mapPartitions`, rate
    * limited to `ratePerSec` per partition. Misses (empty result, parse
    * failure, transport error) yield nulls — filter with
    * `lon IS NOT NULL AND lat IS NOT NULL` exactly like the mock path's
    * P4 null filter.
    *
    * @param partitions number of concurrent client partitions; global
    *   request rate = partitions × ratePerSec. Default 1 — the
    *   reference-faithful single sequential client.
    */
  def geocodeLive(
      df: DataFrame,
      addrCol: String,
      transport: Transport,
      endpoint: String = "https://nominatim.openstreetmap.org/search",
      ratePerSec: Double = 1.0,
      partitions: Int = 1): DataFrame = {
    val schema: StructType = df.schema
      .add("lon", DoubleType, nullable = true)
      .add("lat", DoubleType, nullable = true)
    val addrIdx = df.schema.fieldIndex(addrCol)
    df.repartition(partitions).mapPartitions { rows =>
      val bucket = new TokenBucket(ratePerSec)
      rows.map { row =>
        val addr = row.getString(addrIdx)
        val (lon, lat) =
          try {
            bucket.acquire()
            val url = endpoint + "?q=" +
              URLEncoder.encode(addr, StandardCharsets.UTF_8) +
              "&format=json&limit=1"
            parseLonLat(transport.get(url))
          } catch { case _: Exception => (None, None) }
        Row.fromSeq(row.toSeq ++ Seq(lon.orNull, lat.orNull))
      }
    }(Encoders.row(schema))
  }
}

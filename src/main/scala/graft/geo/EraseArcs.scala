package graft.geo

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** TRUE-GEOMETRY slice of the reference's Erase
  * (arcpy.analysis.Erase, reference GSheetsETL_Lab2.py:133): the
  * reference subtracts the union of 1500-ft opt-out buffers from the
  * spray-zone polygons and hands the resulting geometry to the map.
  * The oracle-checked queries implement Erase's SELECTION semantics
  * (which points survive — `wnv_erase_selection`); this module adds
  * the GEOMETRIC boundary: for each zone circle, the exact arcs of its
  * boundary that survive erasure by the buffer disks, via closed-form
  * circle-circle intersection — no polygon library, no tessellation
  * error on the arc endpoints beyond IEEE rounding.
  *
  * Math (law of cosines): a buffer disk (center o, radius r) covers
  * the points p of the zone circle (center c, radius R) with |p−o|<r;
  * when |R−r| < d < R+r for d = |c−o|, that is the angular interval of
  * half-width α = acos((d² + R² − r²) / (2dR)) around the bearing
  * atan2(o−c). d ≥ R+r covers nothing; d ≤ r−R covers the whole
  * boundary; d ≤ R−r (buffer strictly interior) covers nothing.
  *
  * Scale shape: zones are a bounded catalog (25 rows; ~10⁵ nationwide
  * — SCALE.md), so they BROADCAST against the corpus-sized buffer
  * frame; one filtered join emits only (zone, intersecting-buffer)
  * pairs, and the per-zone angular-interval merge runs in
  * `mapGroups` over a frame bounded by zones × local buffer density —
  * never corpus-sized state. Transcendentals (atan2/acos) keep this
  * OUT of the hash-compared oracle surface by the same rule as
  * [[Lcc]]; GeoSpec pins the geometry against hand-built cases and
  * the 360°-conservation property.
  */
object EraseArcs {

  /** One surviving boundary arc of a zone circle, angles in RADIANS
    * counter-clockwise from +x in [0, 2π); `start == 0 && end == 2π`
    * encodes an untouched full circle.
    */
  case class Arc(zone_id: Int, start: Double, end: Double, len: Double)

  /** Merge-and-complement of covered angular intervals on one circle.
    * `covered` holds (center bearing θ0 ∈ (−π, π], half-width α ≤ π)
    * pairs; returns the UNCOVERED intervals in [0, 2π). Pure JVM —
    * unit-testable without Spark.
    */
  private[geo] def survivingIntervals(
      covered: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val tau = 2 * math.Pi
    if (covered.exists(_._2 >= math.Pi)) return Seq.empty // full cover
    // normalize to [0, 2π), split wrap-around intervals
    val flat = covered.flatMap { case (t0, a) =>
      val s = ((t0 - a) % tau + tau) % tau
      val e = s + 2 * a
      if (e <= tau) Seq((s, e)) else Seq((s, tau), (0.0, e - tau))
    }.sortBy(_._1)
    // merge overlapping covered intervals
    val merged = flat.foldLeft(List.empty[(Double, Double)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: tail if s <= pe => (ps, math.max(pe, e)) :: tail
        case _ => (s, e) :: acc
      }
    }.reverse
    // complement within [0, 2π)
    if (merged.isEmpty) Seq((0.0, tau))
    else {
      val gaps = merged.sliding(2).collect {
        case Seq((_, e1), (s2, _)) if s2 > e1 => (e1, s2)
      }.toSeq
      val head = if (merged.head._1 > 0) Seq((0.0, merged.head._1)) else Nil
      val tail = if (merged.last._2 < tau) Seq((merged.last._2, tau)) else Nil
      head ++ gaps ++ tail
    }
  }

  /** Surviving boundary arcs per zone after erasing `buffers`.
    *
    * @param zones   zone catalog: zone_id, cx_ft, cy_ft, radius_ft
    *                (bounded — broadcast side)
    * @param buffers buffer centers: x_ft, y_ft (corpus side)
    * @param bufferFt buffer radius (the reference's 1500 ft)
    */
  def eraseArcs(spark: SparkSession, zones: DataFrame, buffers: DataFrame,
      bufferFt: Double): Dataset[Arc] = {
    import spark.implicits._
    val pairs = buffers.select(col("x_ft"), col("y_ft"))
      .join(broadcast(zones.select(col("zone_id"), col("cx_ft"),
        col("cy_ft"), col("radius_ft"))),
        // only buffers that can touch the boundary: |R−r| < d < R+r.
        // d² bounds avoid any sqrt in the join predicate.
        Geo.dist2(col("x_ft"), col("y_ft"), col("cx_ft"), col("cy_ft"))
          < (col("radius_ft") + bufferFt) * (col("radius_ft") + bufferFt))
    val zoneIds = zones.select(col("zone_id").cast("int")).as[Int].collect()
    val coveredByZone = pairs.select(col("zone_id").cast("int"),
        col("x_ft"), col("y_ft"), col("cx_ft"), col("cy_ft"),
        col("radius_ft"))
      .as[(Int, Double, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (zid, rows) =>
        val covered = rows.flatMap { case (_, ox, oy, cx, cy, bigR) =>
          val dx = ox - cx; val dy = oy - cy
          val d = math.sqrt(dx * dx + dy * dy)
          val r = bufferFt
          if (d >= bigR + r) None                      // no touch
          else if (d <= r - bigR) Some((0.0, math.Pi)) // full cover
          else if (d <= bigR - r) None                 // strictly interior
          else {
            val cosA = (d * d + bigR * bigR - r * r) / (2 * d * bigR)
            Some((math.atan2(dy, dx),
              math.acos(math.max(-1.0, math.min(1.0, cosA)))))
          }
        }.toSeq
        zid -> survivingIntervals(covered)
      }
    // the result is zone-catalog-bounded (≤ |zones| rows of ≤ a few
    // arcs), so it assembles driver-side in ONE job — the same bounded
    // collect the S7 presentation sink performs; zones with no
    // intersecting buffer never reach mapGroups and survive whole
    val tau = 2 * math.Pi
    val perZone = coveredByZone.collect().toMap
    val all = zoneIds.toSeq.sorted.flatMap { z =>
      perZone.get(z) match {
        case None => Seq(Arc(z, 0.0, tau, tau))
        case Some(arcs) => arcs.map { case (s, e) => Arc(z, s, e, e - s) }
      }
    }
    spark.createDataset(all).orderBy("zone_id", "start")
  }
}

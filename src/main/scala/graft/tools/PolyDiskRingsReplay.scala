package graft.tools

import org.apache.spark.sql.functions._

/** At-scale correctness method for the round-15 mixed line+arc ring
  * query (`wnv_erase_poly_disk_rings` — DISK subtrahends on CONCAVE
  * star zones, the reference's literal Erase shape emitted as ordered
  * boundary rings). Same CORRECTNESS_TAILS-style one-JSON-line verdict
  * as [[PolySubReplay]] / [[ConcaveSubReplay]], with the checks GeoSpec
  * pins at sf0.001 run against the engine's Verify dump at sf1/sf10:
  *
  *   - conservation across two INDEPENDENT methods: Σ r6-rounded ring
  *     signed areas per zone == `wnv_erase_concave`'s r6 area (the
  *     rings come from the mixed line+arc stitcher; the area from the
  *     sub-triangle Green's-theorem kernel — no shared code past the
  *     interval algebra);
  *   - piece_seq dense per (zone, ring);
  *   - geometric closure: ordered piece endpoints chain, last → first
  *     (within the r6 output quantum) — every ring is a closed loop.
  *
  * Usage: runMain graft.tools.PolyDiskRingsReplay <sfDir> <verifyOutDir>
  * (reads the parquet dumps graft.Verify wrote; prints one JSON line;
  * exit 1 on any failed invariant). sfDir is unused (the check is
  * output-only) but kept positional for tool-invocation uniformity.
  */
object PolyDiskRingsReplay {
  def main(args: Array[String]): Unit = {
    val outDir = args(1)
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val gotArea = spark.read.parquet(s"$outDir/wnv_erase_concave")
      .select(col("zone_id"), col("area_sqft")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val ringRows = spark.read
      .parquet(s"$outDir/wnv_erase_poly_disk_rings")
      .select(col("zone_id"), col("ring_id"), col("piece_seq"),
        col("x1_ft"), col("y1_ft"), col("x2_ft"), col("y2_ft"),
        col("ring_area_sqft")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        (r.getDouble(3), r.getDouble(4)), (r.getDouble(5), r.getDouble(6)),
        r.getDouble(7)))

    // ---- conservation: Σ ring signed areas per zone == area query ---
    val ringAreas = ringRows.map(r => (r._1, r._2) -> r._6).toMap
    val sums = ringAreas.toSeq.groupBy(_._1._1)
      .map { case (z, rs) => z -> rs.map(_._2).sum }
    val nRingsByZone = ringAreas.keySet.groupBy(_._1).map {
      case (z, ks) => z -> ks.size }
    var consBad = List.empty[String]
    gotArea.foreach { case (z, a) =>
      val s0 = sums.getOrElse(z, 0.0)
      // per-ring r6 rounding accumulates: tolerance = rings × quantum
      val tol = 1e-9 * math.max(1.0, a) +
        5e-7 * (nRingsByZone.getOrElse(z, 0) + 1)
      if (math.abs(s0 - a) > tol) consBad ::= s"zone $z: ringsum $s0 vs $a"
    }
    // every ring zone must exist in the area output too (same zones,
    // same subtrahend catalog — a zone mismatch means the two queries
    // read different snapshots)
    val zoneBad = sums.keySet -- gotArea.keySet
    // fully-erased regime: when the disk density swallows every zone
    // (all areas 0 — measured at sf10), ZERO rings is the true answer
    // and conservation holds trivially; same class as the committed
    // graph_triangles `ok_empty_regime` row. An empty ring set with
    // any nonzero area is still a failure.
    val emptyRegime = ringRows.isEmpty && gotArea.nonEmpty &&
      gotArea.values.forall(_ == 0.0)
    val consOk = consBad.isEmpty && zoneBad.isEmpty &&
      (ringRows.nonEmpty || emptyRegime)

    // ---- density + closure on the ordered piece chain ---------------
    val byRing = ringRows.groupBy(r => (r._1, r._2))
    val seqBad = byRing.collect {
      case (k, rs) if rs.map(_._3).sorted.toSeq !=
        (0L until rs.size.toLong) => s"$k"
    }
    // endpoints are r6-rounded independently: two ulps of the quantum
    val closeBad = byRing.collect {
      case (k, rs) if {
        val ord = rs.sortBy(_._3)
        ord.indices.exists { i =>
          val (ex, ey) = ord(i)._5
          val (sx, sy) = ord((i + 1) % ord.size)._4
          math.abs(ex - sx) > 2e-6 || math.abs(ey - sy) > 2e-6
        }
      } => s"$k"
    }
    val chainOk = seqBad.isEmpty && closeBad.isEmpty

    def j(q: String, status: String, rows: Long, method: String,
        note: String): String =
      s"""  "$q": {"status": "$status", "rows": $rows, "method": "$method", "note": "$note"}"""
    val ok = consOk && chainOk
    val status =
      if (ok && emptyRegime) "ok_empty_regime" else if (ok) "ok" else "fail"
    println("{\n" + j("wnv_erase_poly_disk_rings", status,
      ringRows.length.toLong, "rows-and-invariants",
      if (ok && emptyRegime)
        s"0 rings is the TRUE answer: all ${gotArea.size} zone areas are 0 " +
          "(disk density fully erases every zone at this scale); " +
          "conservation holds trivially"
      else if (ok) "sum of r6 ring signed areas == wnv_erase_concave's r6 area per zone " +
        "(mixed stitcher vs sub-triangle kernel - independent methods); " +
        s"piece_seq dense; every ring endpoint-closed; ${ringAreas.size} rings"
      else (consBad.take(3) ++ zoneBad.take(3).map(z => s"extra zone $z") ++
        seqBad.take(3).map(k => s"seq $k") ++
        closeBad.take(3).map(k => s"open ring $k")).mkString("; ")) +
      "\n}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

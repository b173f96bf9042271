package graft.tools

import org.apache.spark.sql.functions._

/** At-scale correctness method for the CONCAVE-zone polygon-subtrahend
  * erase pair (round 14's `wnv_erase_concave_sub` /
  * `wnv_erase_concave_sub_rings`) — the same two checks
  * [[PolySubReplay]] runs for the convex pair, one JSON verdict line
  * each, CORRECTNESS_TAILS-style:
  *
  *   - `wnv_erase_concave_sub`: the distributed triangle-granular
  *     plan's per-zone areas vs a DRIVER-SIDE replay of the pure-JVM
  *     kernel ([[graft.geo.EraseArcs.erasedAreaConcaveSub]]) on the
  *     collected zone-local footprints. Tolerance 1e-9 relative (float
  *     re-association) + the query's r6 output quantum.
  *   - `wnv_erase_concave_sub_rings`: Σ r6-rounded ring signed areas
  *     per zone == the area query's r6 output (conservation across two
  *     INDEPENDENT methods — the rings come from the line-piece stitch,
  *     the area from ear-clip triangulation), plus ring-id/piece-seq
  *     density.
  *
  * Usage: runMain graft.tools.ConcaveSubReplay <sfDir> <verifyOutDir>
  * (reads the parquet dumps graft.Verify wrote; prints one JSON line).
  */
object ConcaveSubReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    // engine outputs under test — columns selected BY NAME (the
    // PolySubReplay convention post-r13-ADVICE)
    val gotArea = spark.read.parquet(s"$outDir/wnv_erase_concave_sub")
      .select(col("zone_id"), col("area_sqft")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val ringRows = spark.read
      .parquet(s"$outDir/wnv_erase_concave_sub_rings")
      .select(col("zone_id"), col("ring_id"), col("piece_seq"),
        col("ring_area_sqft")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // ---- replay: kernel per zone on the zone-local footprints -------
    val zones = graft.ops.Wnv.starZones(spark, sfDir)
    val subs = graft.ops.Wnv.parcelFootprints(spark, sfDir)
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"),
        col("holes")).collect()
      .map { w =>
        (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1)),
          w.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](2)
            .map(h => ring(h.toSeq)))
      }
    // one distributed pass assigns footprints to zones (the same
    // bounding-circle superset the plan uses); only zone-local rings
    // reach the driver
    val bound = zs.toSeq.map { case (z, vs, _) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      (z, cx, cy, rad)
    }
    import spark.implicits._
    val boundDf = bound.toDF("z", "bcx", "bcy", "brad")
    val xs = transform(col("vertices"), v => v.getField("_1"))
    val ys = transform(col("vertices"), v => v.getField("_2"))
    val withB = subs.select(col("vertices"),
      ((array_min(xs) + array_max(xs)) / 2).as("sx"),
      ((array_min(ys) + array_max(ys)) / 2).as("sy"),
      (sqrt(graft.geo.Geo.dist2(array_min(xs), array_min(ys),
        array_max(xs), array_max(ys))) / 2).as("sr"))
    val perZone = withB.join(broadcast(boundDf),
        graft.geo.Geo.dist2(col("sx"), col("sy"), col("bcx"), col("bcy"))
          < (col("brad") + col("sr")) * (col("brad") + col("sr")))
      .select(col("z"), col("vertices"))
      .as[(Int, Seq[(Double, Double)])]
      .collect().groupBy(_._1)

    def shoelace(vs: Seq[(Double, Double)]): Double =
      math.abs(vs.indices.map { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
        x1 * y2 - x2 * y1
      }.sum) / 2

    var areaBad = List.empty[String]
    zs.foreach { case (z, vs, hs) =>
      val near = perZone.get(z).map(_.map(_._2).toSeq).getOrElse(Nil)
      val want =
        if (near.isEmpty) shoelace(vs) - hs.map(shoelace).sum
        else graft.geo.EraseArcs.erasedAreaConcaveSub(vs, hs, near)
      val got = gotArea.getOrElse(z, Double.NaN)
      // the query emits XF.r6(area): allow the r6 quantum + relative slack
      if (math.abs(got - want) > 1e-9 * math.max(1.0, want) + 1e-5)
        areaBad ::= s"zone $z: got $got want $want"
    }
    val areaOk = areaBad.isEmpty && gotArea.keySet == zs.map(_._1).toSet

    // ---- rings: conservation + density on the engine output ---------
    val ringAreas = ringRows.map(r => (r._1, r._2) -> r._4).toMap
    val sums = ringAreas.toSeq.groupBy(_._1._1)
      .map { case (z, rs) => z -> rs.map(_._2).sum }
    val nRingsByZone = ringAreas.keySet.groupBy(_._1).map {
      case (z, ks) => z -> ks.size }
    var ringBad = List.empty[String]
    gotArea.foreach { case (z, a) =>
      val s0 = sums.getOrElse(z, 0.0)
      // per-ring r6 rounding accumulates: tolerance = rings × quantum
      val tol = 1e-9 * math.max(1.0, a) +
        5e-7 * (nRingsByZone.getOrElse(z, 0) + 1)
      if (math.abs(s0 - a) > tol) ringBad ::= s"zone $z: ringsum $s0 vs $a"
    }
    val seqBad = ringRows.groupBy(r => (r._1, r._2)).collect {
      case (k, rs) if rs.map(_._3).sorted.toSeq !=
        (0L until rs.size.toLong) => s"$k"
    }
    val ringsOk = ringBad.isEmpty && seqBad.isEmpty && ringRows.nonEmpty

    def j(q: String, ok: Boolean, rows: Long, method: String,
        note: String): String =
      s"""  "$q": {"status": "${if (ok) "ok" else "fail"}", "rows": $rows, "method": "$method", "note": "$note"}"""
    val parts = Seq(
      j("wnv_erase_concave_sub", areaOk, gotArea.size.toLong,
        "kernel-replay",
        if (areaOk) "distributed triangle plan == driver-side erasedAreaConcaveSub replay (1e-9 rel)"
        else areaBad.take(3).mkString("; ")),
      j("wnv_erase_concave_sub_rings", ringsOk, ringRows.length.toLong,
        "rows-and-invariants",
        if (ringsOk) "sum of r6 ring areas == r6 area per zone (two independent kernels); piece_seq dense; " +
          s"${ringAreas.size} rings"
        else (ringBad.take(3) ++ seqBad.take(3)).mkString("; ")))
    println("{\n" + parts.mkString(",\n") + "\n}")
    spark.stop()
    if (!(areaOk && ringsOk)) sys.exit(1)
  }
}

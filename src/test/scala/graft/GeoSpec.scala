package graft

import org.apache.spark.sql.functions._
import graft.geo.{Geo, Lcc}

class GeoSpec extends SparkSpec {

  test("Lcc forward projects the EPSG:2876 origin to the false origin") {
    // At (lat0=39°20'N, lon0=105°30'W) easting/northing equal the false
    // easting/northing (3,000,000.00032 / 999,999.99996 ftUS per the
    // published EPSG:2876 parameter set).
    val (e, n) = Lcc.forward(-105.5, 39.0 + 20.0 / 60)
    assert(math.abs(e - 3000000.0) < 0.01, s"easting $e")
    assert(math.abs(n - 1000000.0) < 0.01, s"northing $n")
  }

  test("Lcc forward is monotone east and north near Boulder") {
    val (e1, n1) = Lcc.forward(-105.3, 40.0)
    val (e2, n2) = Lcc.forward(-105.2, 40.0)
    val (_, n3) = Lcc.forward(-105.3, 40.1)
    assert(e2 > e1)
    assert(n3 > n1)
    assert(math.abs(n2 - n1) < 2000) // same latitude ≈ same northing
  }

  test("Lcc degree of longitude near 40N is ~280k ftUS") {
    // cos(40°)·111.32 km ≈ 85.28 km ≈ 280k US survey feet
    val (e1, _) = Lcc.forward(-106.0, 40.0)
    val (e2, _) = Lcc.forward(-105.0, 40.0)
    assert(math.abs((e2 - e1) - 280150) < 1000, s"got ${e2 - e1}")
  }

  test("mock geocoder is deterministic and misses ~5%") {
    import spark.implicits._
    val addrs = (1 to 2000).map(i => s"$i Main St Boulder CO").toDF("addr")
    val out = addrs.select(
      Geo.geocodeHit(col("addr")).as("hit"),
      Geo.geocodeLon(col("addr")).as("lon"),
      Geo.geocodeLat(col("addr")).as("lat")).cache()
    val hitRate = out.filter(col("hit")).count().toDouble / 2000
    assert(hitRate > 0.92 && hitRate < 0.98, s"hit rate $hitRate")
    // coordinates land in the documented synthetic bounding box
    val bad = out.filter(col("lon") < -105.5 || col("lon") > -105.0 ||
      col("lat") < 39.9 || col("lat") > 40.2).count()
    assert(bad === 0)
    // determinism: identical second evaluation
    val again = addrs.select(Geo.geocodeLon(col("addr")).as("lon"))
    assert(out.select("lon").except(again).count() === 0)
    out.unpersist()
  }

  test("dist2 is symmetric and zero iff same point") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 3.0, 4.0)).toDF("x1", "y1", "x2", "y2")
    val d = df.select(
      Geo.dist2(col("x1"), col("y1"), col("x2"), col("y2")).as("d12"),
      Geo.dist2(col("x2"), col("y2"), col("x1"), col("y1")).as("d21"),
      Geo.dist2(col("x1"), col("y1"), col("x1"), col("y1")).as("d11"))
      .head()
    assert(d.getDouble(0) === 25.0)
    assert(d.getDouble(1) === 25.0)
    assert(d.getDouble(2) === 0.0)
  }

  test("erase arcs: hand-built circle-circle cases") {
    import spark.implicits._
    import graft.geo.EraseArcs
    val tau = 2 * math.Pi
    // one zone: unit-ish circle R=1000 at origin
    val zones = Seq((1, 0.0, 0.0, 1000.0)).toDF(
      "zone_id", "cx_ft", "cy_ft", "radius_ft")
    def arcsFor(bufs: (Double, Double)*): Seq[(Double, Double)] =
      EraseArcs.eraseArcs(spark, zones,
          bufs.toDF("x_ft", "y_ft"), bufferFt = 300.0)
        .collect().map(a => (a.start, a.end)).toSeq
    // no buffers → the whole circle survives
    assert(arcsFor() === Seq((0.0, tau)))
    // buffer far away → untouched
    assert(arcsFor((5000.0, 0.0)) === Seq((0.0, tau)))
    // buffer strictly interior (d + r < R) → boundary untouched
    assert(arcsFor((100.0, 0.0)) === Seq((0.0, tau)))
    // buffer centered ON the boundary at bearing 0: covers ±α with
    // cos α = (d²+R²−r²)/(2dR) at d=R=1000, r=300
    val alpha = math.acos((1000.0 * 1000 + 1000.0 * 1000 - 300.0 * 300) /
      (2 * 1000.0 * 1000))
    val one = arcsFor((1000.0, 0.0))
    assert(one.length === 1)
    assert(math.abs(one.head._1 - alpha) < 1e-12)
    assert(math.abs(one.head._2 - (tau - alpha)) < 1e-12)
    // two overlapping boundary buffers at bearings 0 and ~α merge into
    // ONE covered interval → still one surviving arc
    val px = 1000.0 * math.cos(alpha); val py = 1000.0 * math.sin(alpha)
    val two = arcsFor((1000.0, 0.0), (px, py))
    assert(two.length === 1, two)
    // a huge buffer swallowing the whole boundary → nothing survives
    assert(EraseArcs.eraseArcs(spark, zones,
        Seq((0.0, 0.0)).toDF("x_ft", "y_ft"), bufferFt = 2500.0)
      .collect().isEmpty)
  }

  test("erased area: closed form matches hand cases and grid sampling") {
    import graft.geo.EraseArcs
    val R = 1000.0; val r = 300.0
    def area(bufs: (Double, Double)*): Double =
      EraseArcs.erasedArea(R, bufs, r)
    val full = math.Pi * R * R
    // no buffers / far buffer → full disk
    assert(math.abs(area() - full) < 1e-6)
    assert(math.abs(area((5000.0, 0.0)) - full) < 1e-6)
    // concentric interior hole → annulus
    assert(math.abs(area((0.0, 0.0)) - (full - math.Pi * r * r)) < 1e-6)
    // duplicate centers erase once, not twice
    assert(math.abs(area((100.0, 50.0), (100.0, 50.0)) -
      (full - math.Pi * r * r)) < 1e-6)
    // zone swallowed by a huge buffer → empty region
    assert(EraseArcs.erasedArea(R, Seq((0.0, 0.0)), 2500.0) === 0.0)
    // straddling buffer → full − exact lens area
    val d = 1000.0
    def lens(rr: Double, dd: Double): Double =
      R * R * math.acos((dd * dd + R * R - rr * rr) / (2 * dd * R)) +
        rr * rr * math.acos((dd * dd + rr * rr - R * R) / (2 * dd * rr)) -
        0.5 * math.sqrt((-dd + rr + R) * (dd + rr - R) *
          (dd - rr + R) * (dd + rr + R))
    assert(math.abs(area((d, 0.0)) - (full - lens(r, d))) < 1e-6)
    // deterministic pseudo-random configuration vs grid sampling
    val bufs = (1 to 12).map { i =>
      val a = i * 2.399963229728653 // golden angle: spread bearings
      val rad = 150.0 + (i * 173) % 1100
      (rad * math.cos(a), rad * math.sin(a))
    }
    val got = EraseArcs.erasedArea(R, bufs, r)
    val n = 600
    var in = 0; var tot = 0
    for (ix <- -n to n; iy <- -n to n) {
      val x = ix * R / n; val y = iy * R / n
      if (x * x + y * y <= R * R) {
        tot += 1
        val hit = bufs.exists { case (bx, by) =>
          (x - bx) * (x - bx) + (y - by) * (y - by) < r * r }
        if (!hit) in += 1
      }
    }
    val sampled = full * in / tot
    assert(math.abs(got - sampled) / full < 2e-3,
      s"green $got vs grid $sampled")
  }

  test("erase arcs: covered + surviving is 360 degrees on real frames") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.zones(spark, sf)
    val buffers = graft.ops.Wnv.optOut(spark, sf)
      .select(col("x_ft"), col("y_ft"))
    val arcs = EraseArcs.eraseArcs(spark, zones, buffers,
      graft.ops.Wnv.BufferFt).collect()
    assert(arcs.nonEmpty)
    // per zone: surviving total ∈ [0, 2π], arcs disjoint and ordered
    arcs.groupBy(_.zone_id).foreach { case (z, as) =>
      val sorted = as.sortBy(_.start)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.end <= b.start + 1e-12, s"zone $z")
        case _ =>
      }
      val total = as.map(_.len).sum
      assert(total >= -1e-9 && total <= 2 * math.Pi + 1e-9, s"zone $z")
    }
    // consistency with the selection semantics: a zone whose boundary
    // is fully erased must still be a zone (arcs absent != zone absent
    // in the selection outputs) — here we only require some zone
    // retains a full untouched circle OR a partial arc exists
    assert(arcs.exists(_.len > 0))
  }

  test("erase area: the distributed path equals a driver-side replay") {
    // drives the Spark plumbing of eraseArea — the broadcast touch
    // join, per-zone group assembly, and the untouched-zone full-disk
    // fallback — against a driver-side replay that feeds the same pure
    // kernel directly (the kernel itself is validated by the closed
    // form / grid-sampling test above)
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.zones(spark, sf)
    val buffers = graft.ops.Wnv.optOut(spark, sf)
      .select(col("x_ft"), col("y_ft"))
    val r = graft.ops.Wnv.BufferFt
    val got = EraseArcs.eraseArea(spark, zones, buffers, r)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    val zs = zones.select(col("zone_id").cast("int"), col("cx_ft"),
        col("cy_ft"), col("radius_ft"))
      .collect().map(w => (w.getInt(0), w.getDouble(1), w.getDouble(2),
        w.getDouble(3)))
    val bs = buffers.collect().map(w => (w.getDouble(0), w.getDouble(1)))
    assert(got.keySet === zs.map(_._1).toSet)
    zs.foreach { case (z, cx, cy, rr) =>
      val near = bs.toSeq.collect { case (x, y)
          if (x - cx) * (x - cx) + (y - cy) * (y - cy) < (rr + r) * (rr + r) =>
        (x - cx, y - cy)
      }
      val want = EraseArcs.erasedArea(rr, near, r)
      assert(math.abs(got(z) - want) <= 1e-9 * math.max(1.0, want),
        s"zone $z: spark ${got(z)} vs replay $want")
    }
  }

  test("erase rings: closure, orientation, area conservation, determinism") {
    import graft.geo.EraseArcs
    val R = 1000.0; val r = 300.0
    def checkRings(bufs: Seq[(Double, Double)])
        : Seq[Seq[EraseArcs.RingPiece]] = {
      val rings = EraseArcs.eraseRings(R, bufs, r)
      val tol = 1e-6 * (R + r)
      rings.foreach { ring =>
        // closure: each piece's end is the next piece's start (cyclic)
        ring.indices.foreach { i =>
          val a = ring(i); val b = ring((i + 1) % ring.size)
          val (ex, ey) = a.end; val (sx, sy) = b.start
          assert(math.hypot(ex - sx, ey - sy) <= tol,
            s"open ring at piece $i of $ring")
        }
        // orientation: hole-only loops are CW (negative signed area),
        // loops containing a zone arc are CCW-positive
        val area = ring.map(_.signedArea).sum
        if (ring.exists(_.ccw)) assert(area > 0, s"outer ring CW: $ring")
        else assert(area < 0, s"hole ring CCW: $ring")
      }
      // area conservation: Σ ring signed areas == erasedArea
      val sum = rings.flatten.map(_.signedArea).sum
      val want = EraseArcs.erasedArea(R, bufs, r)
      assert(math.abs(sum - want) <= 1e-6 * math.max(1.0, want),
        s"rings $sum vs erasedArea $want")
      rings
    }
    // untouched zone: one full-circle CCW ring of area πR²
    val r0 = checkRings(Nil)
    assert(r0.size === 1 && r0.head.size === 1 && r0.head.head.ccw)
    assert(math.abs(r0.head.head.signedArea - math.Pi * R * R) < 1e-6)
    // strictly interior buffer: CCW outer circle + CW full-circle hole
    val r1 = checkRings(Seq((0.0, 0.0)))
    assert(r1.size === 2)
    assert(r1.head.head.ccw && !r1(1).head.ccw)
    assert(math.abs(r1(1).head.signedArea + math.Pi * r * r) < 1e-6)
    // straddling buffer: ONE mixed two-piece ring (zone arc + hole arc)
    val r2 = checkRings(Seq((1000.0, 0.0)))
    assert(r2.size === 1 && r2.head.size === 2)
    assert(r2.head.map(_.ccw).toSet === Set(true, false))
    // two overlapping interior buffers: outer + ONE hole loop (3 arc
    // pieces — the right circle's surviving arc crosses angle 0 and
    // splits under the [0,2π) convention, but chains back into one
    // closed CW loop)
    val r3 = checkRings(Seq((-200.0, 0.0), (200.0, 0.0)))
    assert(r3.size === 2)
    assert(r3(1).size === 3 && r3(1).forall(p => !p.ccw))
    // the golden-angle 12-buffer configuration (multi-ring, mixed)
    val bufs = (1 to 12).map { i =>
      val a = i * 2.399963229728653
      val rad = 150.0 + (i * 173) % 1100
      (rad * math.cos(a), rad * math.sin(a))
    }
    checkRings(bufs)
    // deterministic output regardless of buffer arrival order
    assert(EraseArcs.eraseRings(R, bufs.reverse, r) ===
      EraseArcs.eraseRings(R, bufs, r))
  }

  test("erase rings: the distributed path equals a driver-side replay") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.zones(spark, sf)
    val buffers = graft.ops.Wnv.optOut(spark, sf)
      .select(col("x_ft"), col("y_ft"))
    val r = graft.ops.Wnv.BufferFt
    val got = EraseArcs.eraseRingsPerZone(spark, zones, buffers, r)
      .collect()
      .map(w => (w.getInt(0), w.getLong(1), w.getLong(2)) ->
        (w.getString(3), w.getBoolean(4), w.getDouble(5), w.getDouble(6),
          w.getDouble(7), w.getDouble(8), w.getDouble(9), w.getDouble(10)))
      .toMap
    val zs = zones.select(col("zone_id").cast("int"), col("cx_ft"),
        col("cy_ft"), col("radius_ft"))
      .collect().map(w => (w.getInt(0), w.getDouble(1), w.getDouble(2),
        w.getDouble(3)))
    val bs = buffers.collect().map(w => (w.getDouble(0), w.getDouble(1)))
    assert(got.keys.map(_._1).toSet === zs.map(_._1).toSet)
    zs.foreach { case (z, cx, cy, rr) =>
      val near = bs.toSeq.collect { case (x, y)
          if (x - cx) * (x - cx) + (y - cy) * (y - cy) < (rr + r) * (rr + r) =>
        (x - cx, y - cy)
      }
      val want = if (near.isEmpty)
        Seq(Seq(EraseArcs.RingPiece(ccw = true, 0.0, 0.0, rr, 0.0,
          2 * math.Pi)))
      else EraseArcs.eraseRings(rr, near, r)
      val wantRows = want.zipWithIndex.flatMap { case (ring, ri) =>
        val area = ring.map(_.signedArea).sum
        ring.zipWithIndex.map { case (p, pi) =>
          (z, ri.toLong, pi.toLong) ->
            (p.ccw, p.cx + cx, p.cy + cy, p.rho,
              p.s * 180.0 / math.Pi, p.e * 180.0 / math.Pi, area)
        }
      }
      assert(got.keys.count(_._1 == z) === wantRows.size, s"zone $z")
      wantRows.foreach { case (k, (ccw, wcx, wcy, wrho, ws, we, wa)) =>
        val (kind, gccw, gcx, gcy, grho, gs, ge, ga) = got(k)
        assert(gccw === ccw && kind === (if (ccw) "zone" else "hole"), k)
        Seq(gcx -> wcx, gcy -> wcy, grho -> wrho, gs -> ws, ge -> we)
          .foreach { case (g, w2) => assert(math.abs(g - w2) <= 1e-5, k) }
        assert(math.abs(ga - wa) <= 1e-5 * math.max(1.0, math.abs(wa)), k)
      }
    }
  }

  test("polygon erase: hand cases, winding invariance, grid sampling") {
    import graft.geo.EraseArcs
    val r = 300.0
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    def area(bufs: (Double, Double)*): Double =
      EraseArcs.erasedAreaPoly(square, bufs, r)
    val full = 4e6
    assert(math.abs(area() - full) < 1e-6)
    assert(math.abs(area((9000.0, 0.0)) - full) < 1e-6) // disjoint disk
    // interior hole → full − πr²
    assert(math.abs(area((0.0, 0.0)) - (full - math.Pi * r * r)) < 1e-6)
    // duplicate centers erase once, not twice
    assert(math.abs(area((100.0, 50.0), (100.0, 50.0)) -
      (full - math.Pi * r * r)) < 1e-6)
    // winding invariance: CW input normalizes
    assert(math.abs(EraseArcs.erasedAreaPoly(square.reverse,
      Seq((0.0, 0.0)), r) - (full - math.Pi * r * r)) < 1e-6)
    // center ON an edge → exactly half the disk erased
    assert(math.abs(area((1000.0, 0.0)) -
      (full - math.Pi * r * r / 2)) < 1e-6)
    // polygon swallowed by a huge disk → empty region
    assert(EraseArcs.erasedAreaPoly(
      Seq((-100.0, -100.0), (100.0, -100.0), (100.0, 100.0),
        (-100.0, 100.0)), Seq((0.0, 0.0)), 500.0) === 0.0)
    // pseudo-random configuration over an irregular convex pentagon
    // vs grid sampling (the same 0.2% gate as the circle kernel)
    val pent = Seq((-900.0, -700.0), (800.0, -1000.0), (1100.0, 200.0),
      (200.0, 1000.0), (-1000.0, 500.0))
    val bufs = (1 to 12).map { i =>
      val a = i * 2.399963229728653
      val rad = 150.0 + (i * 173) % 1000
      (rad * math.cos(a), rad * math.sin(a))
    }
    val got = EraseArcs.erasedAreaPoly(pent, bufs, r)
    // half-plane point-in-polygon for the sampler (pent is CCW)
    def inside(x: Double, y: Double): Boolean =
      pent.indices.forall { i =>
        val (ax, ay) = pent(i); val (bx, by) = pent((i + 1) % pent.size)
        (bx - ax) * (y - ay) - (by - ay) * (x - ax) >= 0
      }
    val n = 600
    var in = 0; var tot = 0
    for (ix <- -n to n; iy <- -n to n) {
      val x = ix * 1100.0 / n; val y = iy * 1100.0 / n
      if (inside(x, y)) {
        tot += 1
        val hit = bufs.exists { case (bx, by) =>
          (x - bx) * (x - bx) + (y - by) * (y - by) < r * r }
        if (!hit) in += 1
      }
    }
    val pentArea = math.abs(pent.indices.map { i =>
      val (x1, y1) = pent(i); val (x2, y2) = pent((i + 1) % pent.size)
      x1 * y2 - x2 * y1
    }.sum) / 2
    val sampled = pentArea * in / tot
    assert(math.abs(got - sampled) / pentArea < 2e-3,
      s"green $got vs grid $sampled")
  }

  test("polygon erase: a repeated vertex fails loudly, not as NaN area") {
    import graft.geo.EraseArcs
    val bad = Seq((0.0, 0.0), (0.0, 0.0), (1000.0, 0.0), (500.0, 800.0))
    val e = intercept[IllegalArgumentException] {
      EraseArcs.erasedAreaPoly(bad, Seq((100.0, 100.0)), 300.0)
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("polygon erase: fine regular polygon converges to the circle kernel") {
    import graft.geo.EraseArcs
    val R = 1000.0; val r = 300.0
    val bufs = (1 to 8).map { i =>
      val a = i * 2.399963229728653
      val rad = 200.0 + (i * 211) % 900
      (rad * math.cos(a), rad * math.sin(a))
    }
    val ngon = (0 until 512).map { k =>
      val a = 2 * math.Pi * k / 512
      (R * math.cos(a), R * math.sin(a))
    }
    val got = EraseArcs.erasedAreaPoly(ngon, bufs, r)
    val want = EraseArcs.erasedArea(R, bufs, r)
    // the inscribed 512-gon underestimates the disk by ~R²π³/(3·512²)
    // relative ≈ 2e-5 — well inside the 1e-3 gate
    assert(math.abs(got - want) / want < 1e-3, s"ngon $got vs circle $want")
  }

  test("polygon erase: the distributed path equals a driver-side replay") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.polygonZones(spark, sf)
    val buffers = graft.ops.Wnv.optOut(spark, sf)
      .select(col("x_ft"), col("y_ft"))
    val r = graft.ops.Wnv.BufferFt
    val got = EraseArcs.eraseAreaPoly(spark, zones, buffers, r)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"))
      .collect().map { w =>
        (w.getInt(0), w.getSeq[org.apache.spark.sql.Row](1)
          .map(v => (v.getDouble(0), v.getDouble(1))))
      }
    val bs = buffers.collect().map(w => (w.getDouble(0), w.getDouble(1)))
    assert(got.keySet === zs.map(_._1).toSet)
    zs.foreach { case (z, vs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      val near = bs.toSeq.filter { case (x, y) =>
        (x - cx) * (x - cx) + (y - cy) * (y - cy) < (rad + r) * (rad + r) }
      val want =
        if (near.isEmpty) math.abs(vs.indices.map { i =>
          val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
          x1 * y2 - x2 * y1
        }.sum) / 2
        else EraseArcs.erasedAreaPoly(vs, near, r)
      assert(math.abs(got(z) - want) <= 1e-9 * math.max(1.0, want),
        s"zone $z: spark ${got(z)} vs replay $want")
    }
    // the diamond is inscribed in the circle: its surviving area can
    // never exceed the circle zone's
    val circ = EraseArcs.eraseArea(spark, graft.ops.Wnv.zones(spark, sf),
        buffers, r)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    got.foreach { case (z, a) =>
      assert(a <= circ(z) + 1e-6, s"zone $z diamond $a > circle ${circ(z)}")
    }
  }

  // ---- round 9: general (concave, holed) polygon Erase ---------------

  private val star = Seq((1000.0, 0.0), (350.0, 350.0), (0.0, 1000.0),
    (-350.0, 350.0), (-1000.0, 0.0), (-350.0, -350.0), (0.0, -1000.0),
    (350.0, -350.0))
  private val holeSq = Seq((150.0, 150.0), (-150.0, 150.0),
    (-150.0, -150.0), (150.0, -150.0))
  private def ringArea(vs: Seq[(Double, Double)]): Double =
    math.abs(vs.indices.map { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
      x1 * y2 - x2 * y1
    }.sum) / 2
  // crossing-number point-in-polygon (concave-safe)
  private def inRing(vs: Seq[(Double, Double)], x: Double, y: Double)
      : Boolean = {
    var c = false
    vs.indices.foreach { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
      if ((y1 > y) != (y2 > y) &&
        x < x1 + (y - y1) * (x2 - x1) / (y2 - y1)) c = !c
    }
    c
  }

  test("triangulation partitions concave rings: areas conserve") {
    import graft.geo.EraseArcs
    val lshape = Seq((0.0, 0.0), (2000.0, 0.0), (2000.0, 1000.0),
      (1000.0, 1000.0), (1000.0, 2000.0), (0.0, 2000.0))
    Seq(star, lshape, star.reverse,
        // convex rings triangulate too
        Seq((-900.0, -700.0), (800.0, -1000.0), (1100.0, 200.0),
          (200.0, 1000.0), (-1000.0, 500.0)),
        // a closing duplicate vertex and a collinear vertex are handled
        Seq((0.0, 0.0), (1000.0, 0.0), (2000.0, 0.0), (2000.0, 2000.0),
          (0.0, 2000.0), (0.0, 0.0))).foreach { ring =>
      val tris = EraseArcs.triangulate(ring)
      assert(tris.forall(_.size == 3))
      val sum = tris.map(ringArea).sum
      val want = ringArea(ring.distinct)
      assert(math.abs(sum - want) <= 1e-9 * want,
        s"triangulated $sum vs shoelace $want for $ring")
    }
  }

  test("concave erase: hand cases, hole algebra, winding invariance") {
    import graft.geo.EraseArcs
    val r = 300.0
    // the convex kernel REJECTS concave rings loudly
    val e = intercept[IllegalArgumentException] {
      EraseArcs.erasedAreaPoly(star, Seq((0.0, 500.0)), r)
    }
    assert(e.getMessage.contains("concave"))
    // concave == convex kernel on convex input
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    Seq(Seq((0.0, 0.0)), Seq((900.0, 200.0), (-300.0, 700.0)))
      .foreach { bufs =>
        assert(math.abs(
          EraseArcs.erasedAreaConcave(square, Nil, bufs, r) -
            EraseArcs.erasedAreaPoly(square, bufs, r)) < 1e-6)
      }
    // L-shape minus a disk wholly inside one arm
    val lshape = Seq((0.0, 0.0), (2000.0, 0.0), (2000.0, 1000.0),
      (1000.0, 1000.0), (1000.0, 2000.0), (0.0, 2000.0))
    assert(math.abs(
      EraseArcs.erasedAreaConcave(lshape, Nil, Seq((500.0, 500.0)), r) -
        (3e6 - math.Pi * r * r)) < 1e-6)
    // no buffers: outer − hole exactly
    assert(math.abs(
      EraseArcs.erasedAreaConcave(star, Seq(holeSq), Nil, r) -
        (ringArea(star) - ringArea(holeSq))) < 1e-9 * ringArea(star))
    // a disk strictly inside the hole erases NOTHING: the outer loss
    // and the hole loss cancel exactly (disk ⊆ hole ⊆ outer)
    val tiny = 100.0
    assert(math.abs(
      EraseArcs.erasedAreaConcave(star, Seq(holeSq),
        Seq((0.0, 0.0)), tiny) -
        (ringArea(star) - ringArea(holeSq))) < 1e-6)
    // winding invariance: both rings reversed
    assert(math.abs(
      EraseArcs.erasedAreaConcave(star.reverse, Seq(holeSq.reverse),
        Seq((600.0, 0.0)), r) -
      EraseArcs.erasedAreaConcave(star, Seq(holeSq),
        Seq((600.0, 0.0)), r)) < 1e-6)
  }

  test("concave erase: grid sampling on the star-with-hole") {
    import graft.geo.EraseArcs
    val r = 300.0
    val bufs = (1 to 10).map { i =>
      val a = i * 2.399963229728653
      val rad = 100.0 + (i * 173) % 900
      (rad * math.cos(a), rad * math.sin(a))
    }
    val got = EraseArcs.erasedAreaConcave(star, Seq(holeSq), bufs, r)
    val n = 600
    var in = 0; var tot = 0
    for (ix <- -n to n; iy <- -n to n) {
      val x = ix * 1000.0 / n; val y = iy * 1000.0 / n
      if (inRing(star, x, y) && !inRing(holeSq, x, y)) {
        tot += 1
        val hit = bufs.exists { case (bx, by) =>
          (x - bx) * (x - bx) + (y - by) * (y - by) < r * r }
        if (!hit) in += 1
      }
    }
    val regionArea = ringArea(star) - ringArea(holeSq)
    val sampled = regionArea * in / tot
    assert(math.abs(got - sampled) / regionArea < 2e-3,
      s"green $got vs grid $sampled")
  }

  test("concave erase: fine n-gon annulus converges to circle-kernel difference") {
    import graft.geo.EraseArcs
    val R = 1000.0; val rHole = 400.0; val r = 300.0
    val bufs = (1 to 8).map { i =>
      val a = i * 2.399963229728653
      val rad = 200.0 + (i * 211) % 900
      (rad * math.cos(a), rad * math.sin(a))
    }
    def ngon(rad: Double, k: Int): Seq[(Double, Double)] =
      (0 until k).map { j =>
        val a = 2 * math.Pi * j / k
        (rad * math.cos(a), rad * math.sin(a))
      }
    val got = EraseArcs.erasedAreaConcave(
      ngon(R, 512), Seq(ngon(rHole, 256)), bufs, r)
    val want = EraseArcs.erasedArea(R, bufs, r) -
      EraseArcs.erasedArea(rHole, bufs, r)
    assert(math.abs(got - want) / want < 1e-3,
      s"annulus $got vs circle difference $want")
  }

  test("concave erase: the distributed path equals a driver-side replay") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.starZones(spark, sf)
    val buffers = graft.ops.Wnv.optOut(spark, sf)
      .select(col("x_ft"), col("y_ft"))
    val r = graft.ops.Wnv.BufferFt
    val got = EraseArcs.eraseAreaConcave(spark, zones, buffers, r)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"),
        col("holes"))
      .collect().map { w =>
        (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1)),
          w.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](2))
      }
    val bs = buffers.collect().map(w => (w.getDouble(0), w.getDouble(1)))
    assert(got.keySet === zs.map(_._1).toSet)
    zs.foreach { case (z, vs, hsRaw) =>
      val hs = hsRaw.map(h => ring(h.toSeq))
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      val near = bs.toSeq.filter { case (x, y) =>
        (x - cx) * (x - cx) + (y - cy) * (y - cy) < (rad + r) * (rad + r) }
      val want =
        if (near.isEmpty) ringArea(vs) - hs.map(ringArea).sum
        else EraseArcs.erasedAreaConcave(vs, hs, near, r)
      assert(math.abs(got(z) - want) <= 1e-9 * math.max(1.0, want),
        s"zone $z: spark ${got(z)} vs replay $want")
    }
    // the star is inscribed in the circle zone: surviving area can
    // never exceed the circle's
    val circ = EraseArcs.eraseArea(spark, graft.ops.Wnv.zones(spark, sf),
        buffers, r)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    got.foreach { case (z, a) =>
      assert(a <= circ(z) + 1e-6, s"zone $z star $a > circle ${circ(z)}")
    }
  }

  // ---- round 12: POLYGON subtrahends (general Erase contract) --------

  test("polygon-subtrahend erase: rectangle algebra is exact") {
    import graft.geo.EraseArcs
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    def sq(cx: Double, cy: Double, hw: Double) = Seq(
      (cx - hw, cy - hw), (cx + hw, cy - hw),
      (cx + hw, cy + hw), (cx - hw, cy + hw))
    def area(subs: Seq[(Double, Double)]*): Double =
      EraseArcs.erasedAreaPolySub(square, subs)
    val full = 4e6
    assert(math.abs(area() - full) < 1e-6)
    // disjoint subtrahend leaves the zone whole
    assert(math.abs(area(sq(9000, 0, 300)) - full) < 1e-6)
    // centered interior square: a² − b² exactly
    assert(math.abs(area(sq(0, 0, 300)) - (full - 600.0 * 600.0)) < 1e-6)
    // duplicate subtrahends erase once (union semantics)
    assert(math.abs(area(sq(0, 0, 300), sq(0, 0, 300)) -
      (full - 600.0 * 600.0)) < 1e-6)
    // corner overlap: only the intersecting rectangle is erased
    assert(math.abs(area(sq(1000, 1000, 400)) -
      (full - 400.0 * 400.0)) < 1e-6)
    // two OVERLAPPING interior squares: inclusion-exclusion
    val a1 = sq(0, 0, 300); val a2 = sq(200, 0, 300)
    val inter = 400.0 * 600.0
    assert(math.abs(area(a1, a2) -
      (full - (360000.0 + 360000.0 - inter))) < 1e-6)
    // subtrahend covering the zone entirely -> empty
    assert(area(sq(0, 0, 5000)) === 0.0)
    // winding invariance: CW subtrahend input normalizes
    assert(math.abs(EraseArcs.erasedAreaPolySub(square,
      Seq(sq(0, 0, 300).reverse)) - (full - 600.0 * 600.0)) < 1e-6)
    // subtrahend poking OUT of the zone: only the inside part erases
    assert(math.abs(area(sq(1000, 0, 300)) -
      (full - 300.0 * 600.0)) < 1e-6)
  }

  test("polygon-subtrahend erase: rotated / re-wound duplicates erase once") {
    // r12 ADVICE: representation-level distinct missed a duplicate ring
    // given through a rotated vertex order or opposite winding — each
    // copy then saw the other covering all its edges and the union
    // boundary vanished (area inflated back toward the full zone).
    // canonicalRing (CCW + rotate-to-smallest-vertex) makes them equal.
    import graft.geo.EraseArcs
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    val base = Seq((-300.0, -300.0), (300.0, -300.0),
      (300.0, 300.0), (-300.0, 300.0))
    val rotated = base.drop(2) ++ base.take(2)       // same ring, shifted start
    val rewound = base.reverse                       // same ring, CW
    val rotRewound = rotated.reverse
    val want = 4e6 - 600.0 * 600.0
    for (dup <- Seq(rotated, rewound, rotRewound)) {
      val got = EraseArcs.erasedAreaPolySub(square, Seq(base, dup))
      assert(math.abs(got - want) < 1e-6,
        s"kernel: duplicate variant not canonicalized (got $got, want $want)")
    }
    // distributed path: same canonicalization before dropDuplicates
    import spark.implicits._
    val zones = Seq((1, square)).toDF("zone_id", "vertices")
    val subs = Seq(base, rotated, rewound).toDF("vertices")
    val got = EraseArcs.eraseAreaPolySub(spark, zones, subs)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1) - want) < 1e-6,
      s"distributed: duplicate variants not canonicalized (got ${got(1)})")
  }

  test("polygon-subtrahend erase: grid sampling over rotated subtrahends") {
    import graft.geo.EraseArcs
    val pent = Seq((-900.0, -700.0), (800.0, -1000.0), (1100.0, 200.0),
      (200.0, 1000.0), (-1000.0, 500.0))
    // rotated squares and triangles in pseudo-random positions
    val subs = (1 to 10).map { i =>
      val a = i * 2.399963229728653
      val rad = 150.0 + (i * 173) % 900
      val cx = rad * math.cos(a); val cy = rad * math.sin(a)
      val rot = i * 0.7; val hw = 120.0 + (i * 37) % 180
      if (i % 2 == 0)
        (0 until 4).map { k =>
          val b = rot + math.Pi / 2 * k
          (cx + hw * math.cos(b), cy + hw * math.sin(b))
        }
      else
        (0 until 3).map { k =>
          val b = rot + 2 * math.Pi / 3 * k
          (cx + hw * math.cos(b), cy + hw * math.sin(b))
        }
    }
    val got = EraseArcs.erasedAreaPolySub(pent, subs)
    def insideConvex(p: Seq[(Double, Double)], x: Double, y: Double) =
      p.indices.forall { i =>
        val (ax, ay) = p(i); val (bx, by) = p((i + 1) % p.size)
        (bx - ax) * (y - ay) - (by - ay) * (x - ax) >= 0
      }
    val n = 600
    var in = 0; var tot = 0
    for (ix <- -n to n; iy <- -n to n) {
      val x = ix * 1100.0 / n; val y = iy * 1100.0 / n
      if (insideConvex(pent, x, y)) {
        tot += 1
        if (!subs.exists(s => insideConvex(s, x, y))) in += 1
      }
    }
    val pentArea = ringArea(pent)
    val sampled = pentArea * in / tot
    assert(math.abs(got - sampled) / pentArea < 2e-3,
      s"green $got vs grid $sampled")
  }

  test("polygon-subtrahend erase: fine n-gon subtrahend converges to the disk kernel") {
    import graft.geo.EraseArcs
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    val r = 300.0
    val centers = Seq((100.0, 50.0), (-400.0, 300.0), (950.0, -200.0))
    val subs = centers.map { case (cx, cy) =>
      (0 until 512).map { k =>
        val a = 2 * math.Pi * k / 512
        (cx + r * math.cos(a), cy + r * math.sin(a))
      }
    }
    val got = EraseArcs.erasedAreaPolySub(square, subs)
    val want = EraseArcs.erasedAreaPoly(square, centers, r)
    assert(math.abs(got - want) / want < 1e-3, s"ngon $got vs disk $want")
  }

  test("polygon-subtrahend erase: concave zone reduction and hole algebra") {
    import graft.geo.EraseArcs
    // L-shaped (concave) zone: 3000x2000 minus the top-right 1500x1000
    val ell = Seq((0.0, 0.0), (3000.0, 0.0), (3000.0, 1000.0),
      (1500.0, 1000.0), (1500.0, 2000.0), (0.0, 2000.0))
    def sq(cx: Double, cy: Double, hw: Double) = Seq(
      (cx - hw, cy - hw), (cx + hw, cy - hw),
      (cx + hw, cy + hw), (cx - hw, cy + hw))
    val ellArea = 3000.0 * 1000.0 + 1500.0 * 1000.0
    // interior square in the lower arm
    val got = EraseArcs.erasedAreaConcaveSub(ell, Nil, Seq(sq(2200, 500, 200)))
    assert(math.abs(got - (ellArea - 400.0 * 400.0)) < 1e-6)
    // square straddling the concave notch: only the in-zone half erases
    val got2 = EraseArcs.erasedAreaConcaveSub(ell, Nil, Seq(sq(1500, 1500, 200)))
    assert(math.abs(got2 - (ellArea - 200.0 * 400.0)) < 1e-6)
    // hole algebra: a hole and a subtrahend in disjoint regions
    val hole = sq(500, 500, 150)
    val got3 = EraseArcs.erasedAreaConcaveSub(ell, Seq(hole),
      Seq(sq(2200, 500, 200)))
    assert(math.abs(got3 - (ellArea - 300.0 * 300.0 - 400.0 * 400.0)) < 1e-6)
    // convex agreement: the reduction equals the direct kernel
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    val subs = Seq(sq(100, 50, 300), sq(-300, 200, 250))
    assert(math.abs(
      EraseArcs.erasedAreaConcaveSub(square, Nil, subs) -
        EraseArcs.erasedAreaPolySub(square, subs)) < 1e-6)
  }

  test("polygon-subtrahend erase: the distributed path equals a driver-side replay") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.polygonZones(spark, sf)
    val subs = graft.ops.Wnv.parcelFootprints(spark, sf)
    val got = EraseArcs.eraseAreaPolySub(spark, zones, subs)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"))
      .collect().map(w => (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1))))
    val ss = subs.select(col("vertices")).collect()
      .map(w => ring(w.getSeq[org.apache.spark.sql.Row](0)))
    assert(got.keySet === zs.map(_._1).toSet)
    assert(ss.nonEmpty, "no parcel footprints at this sf")
    zs.foreach { case (z, vs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      val near = ss.filter { s =>
        val sx = (s.map(_._1).min + s.map(_._1).max) / 2
        val sy = (s.map(_._2).min + s.map(_._2).max) / 2
        val sr = math.hypot(s.map(_._1).max - s.map(_._1).min,
          s.map(_._2).max - s.map(_._2).min) / 2
        (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) < (rad + sr) * (rad + sr)
      }.toSeq
      val want =
        if (near.isEmpty) ringArea(vs)
        else EraseArcs.erasedAreaPolySub(vs, near)
      assert(math.abs(got(z) - want) <= 1e-9 * math.max(1.0, want),
        s"zone $z: spark ${got(z)} vs replay $want")
      // monotone: polygon-subtrahend area never exceeds the full zone
      assert(got(z) <= ringArea(vs) + 1e-6)
    }
  }

  test("concave-zone polygon-subtrahend erase: the distributed path " +
      "equals a driver-side replay") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.starZones(spark, sf)
    val subs = graft.ops.Wnv.parcelFootprints(spark, sf)
    val got = EraseArcs.eraseAreaConcaveSub(spark, zones, subs)
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"),
        col("holes"))
      .collect().map { w =>
        (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1)),
          w.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](2)
            .map(h => ring(h.toSeq)))
      }
    val ss = subs.select(col("vertices")).collect()
      .map(w => ring(w.getSeq[org.apache.spark.sql.Row](0)))
    assert(got.keySet === zs.map(_._1).toSet)
    assert(ss.nonEmpty, "no parcel footprints at this sf")
    zs.foreach { case (z, vs, hs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      val near = ss.filter { s0 =>
        val sx = (s0.map(_._1).min + s0.map(_._1).max) / 2
        val sy = (s0.map(_._2).min + s0.map(_._2).max) / 2
        val sr = math.hypot(s0.map(_._1).max - s0.map(_._1).min,
          s0.map(_._2).max - s0.map(_._2).min) / 2
        (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) < (rad + sr) * (rad + sr)
      }.toSeq
      val want =
        if (near.isEmpty) ringArea(vs) - hs.map(ringArea).sum
        else EraseArcs.erasedAreaConcaveSub(vs, hs, near)
      assert(math.abs(got(z) - want) <= 1e-9 * math.max(1.0, want),
        s"zone $z: spark ${got(z)} vs replay $want")
      // monotone: surviving area never exceeds the un-erased region
      assert(got(z) <= ringArea(vs) - hs.map(ringArea).sum + 1e-6)
      assert(got(z) >= -1e-12)
    }
  }

  test("concave-zone rings: closure, orientation, conservation vs the " +
      "triangulation kernel, convex agreement, determinism") {
    import graft.geo.EraseArcs
    def sq(cx: Double, cy: Double, hw: Double) = Seq(
      (cx - hw, cy - hw), (cx + hw, cy - hw),
      (cx + hw, cy + hw), (cx - hw, cy + hw))
    def checkRings(outer: Seq[(Double, Double)],
        holes: Seq[Seq[(Double, Double)]],
        subs: Seq[Seq[(Double, Double)]])
        : Seq[Seq[EraseArcs.LinePiece]] = {
      val rings = EraseArcs.eraseRingsConcaveSub(outer, holes, subs)
      val scale = (outer ++ holes.flatten ++ subs.flatten)
        .flatMap(p => Seq(p._1.abs, p._2.abs)).max
      val tol = 1e-9 * math.max(1.0, scale)
      rings.foreach { ring =>
        ring.indices.foreach { i =>
          val a = ring(i); val b = ring((i + 1) % ring.size)
          val (ex, ey) = a.end; val (sx, sy) = b.start
          assert(math.hypot(ex - sx, ey - sy) <= tol,
            s"open ring at piece $i of $ring")
        }
        val area = ring.map(_.signedArea).sum
        if (ring.exists(_.kind == "zone"))
          assert(area > 0, s"outer ring CW: $ring")
        else assert(area < 0, s"hole ring CCW: $ring")
      }
      // conservation against the INDEPENDENT method: ear-clip
      // triangulation × the convex area kernel
      val sum = rings.flatten.map(_.signedArea).sum
      val want = EraseArcs.erasedAreaConcaveSub(outer, holes, subs)
      assert(math.abs(sum - want) <= 1e-9 * math.max(1.0, want),
        s"rings $sum vs erasedAreaConcaveSub $want")
      // determinism under member order and winding
      val again = EraseArcs.eraseRingsConcaveSub(outer,
        holes.map(_.reverse), subs.reverse.map(_.reverse))
      assert(again === rings, "rings depend on member order/winding")
      rings
    }
    // L-shaped zone: the concave notch splits a straddling square
    val ell = Seq((0.0, 0.0), (3000.0, 0.0), (3000.0, 1000.0),
      (1500.0, 1000.0), (1500.0, 2000.0), (0.0, 2000.0))
    // untouched: one CCW ring of the 6 edges
    val r0 = checkRings(ell, Nil, Nil)
    assert(r0.size === 1 && r0.head.size === 6 &&
      r0.head.forall(_.kind == "zone"))
    // hole only: CCW outer + the hole's CW 4-piece ring
    val r1 = checkRings(ell, Seq(sq(500, 500, 150)), Nil)
    assert(r1.size === 2 && r1(1).forall(_.kind == "sub") &&
      r1(1).size === 4)
    // square straddling the concave notch: ONE mixed outer ring (only
    // the in-zone half of the square erases)
    val r2 = checkRings(ell, Nil, Seq(sq(1500, 1500, 200)))
    assert(r2.size === 1)
    assert(r2.head.map(_.kind).toSet === Set("zone", "sub"))
    // hole + interior subtrahend in disjoint regions: three rings
    val r3 = checkRings(ell, Seq(sq(500, 500, 150)),
      Seq(sq(2200, 500, 200)))
    assert(r3.size === 3)
    // subtrahend OVERLAPPING the hole (offset in BOTH axes — equal
    // extents would make their edges collinear, which is the declared
    // tangency-degenerate domain and fails loudly): one CW cavity
    val r4 = checkRings(ell, Seq(sq(500, 500, 150)),
      Seq(sq(700, 560, 150)))
    assert(r4.size === 2, s"expected outer + one merged cavity: $r4")
    // a member edge crossing the concave notch REGION twice: a thin
    // horizontal bar through x ∈ [1000, 2500] at y ≈ 1500 lies inside
    // the zone only for x < 1500 — entered and left across the notch
    val bar = Seq((1000.0, 1400.0), (2500.0, 1400.0),
      (2500.0, 1600.0), (1000.0, 1600.0))
    checkRings(ell, Nil, Seq(bar))
    // convex agreement: on a convex zone the general path matches the
    // convex stitcher ring-for-ring, piece-for-piece (the crossing
    // parameters come from different but algebraically-equal float
    // expressions — parametric half-plane clip vs segment-crossing
    // params — so coordinates agree to a few ulps, not bitwise)
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    val subs = Seq(sq(100, 50, 300), sq(-300, 200, 250), sq(1000, 0, 300))
    val gen = EraseArcs.eraseRingsConcaveSub(square, Nil, subs)
    val convex = EraseArcs.eraseRingsPolySub(square, subs)
    assert(gen.size === convex.size)
    gen.zip(convex).foreach { case (g, c) =>
      assert(g.size === c.size)
      g.zip(c).foreach { case (pg, pc) =>
        assert(pg.kind === pc.kind)
        assert(math.hypot(pg.x1 - pc.x1, pg.y1 - pc.y1) <= 1e-9 * 1000)
        assert(math.hypot(pg.x2 - pc.x2, pg.y2 - pc.y2) <= 1e-9 * 1000)
      }
    }
  }

  test("concave-zone rings: the distributed path equals a driver-side " +
      "replay and conserves the distributed area") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.starZones(spark, sf)
    val subs = graft.ops.Wnv.parcelFootprints(spark, sf)
    val got = EraseArcs.eraseRingsConcaveSubPerZone(spark, zones, subs)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"),
        col("holes"))
      .collect().map { w =>
        (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1)),
          w.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](2)
            .map(h => ring(h.toSeq)))
      }
    val ss = subs.select(col("vertices")).collect()
      .map(w => ring(w.getSeq[org.apache.spark.sql.Row](0)))
    val byZone = got.groupBy(_._1)
    assert(byZone.keySet === zs.map(_._1).toSet)
    val scale = 4e6 // state-plane feet
    zs.foreach { case (z, vs, hs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      val near = ss.filter { s0 =>
        val sx = (s0.map(_._1).min + s0.map(_._1).max) / 2
        val sy = (s0.map(_._2).min + s0.map(_._2).max) / 2
        val sr = math.hypot(s0.map(_._1).max - s0.map(_._1).min,
          s0.map(_._2).max - s0.map(_._2).min) / 2
        (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) < (rad + sr) * (rad + sr)
      }.toSeq
      val want = EraseArcs.eraseRingsConcaveSub(vs, hs, near)
      val gotRings = byZone(z).sortBy(r => (r._2, r._3))
        .groupBy(_._2).toSeq.sortBy(_._1).map(_._2)
      assert(gotRings.size === want.size, s"zone $z ring count")
      gotRings.zip(want).foreach { case (g, w) =>
        assert(g.size === w.size, s"zone $z piece count")
        g.zip(w).foreach { case (gp, wp) =>
          assert(gp._4 === wp.kind, s"zone $z kind")
          assert(math.hypot(gp._5 - wp.x1, gp._6 - wp.y1) <= 1e-9 * scale,
            s"zone $z piece start")
          assert(math.hypot(gp._7 - wp.x2, gp._8 - wp.y2) <= 1e-9 * scale,
            s"zone $z piece end")
        }
      }
      // Σ ring signed areas == the distributed AREA plan's value
      val sums = byZone(z).groupBy(_._2).map(_._2.head._9).sum
      val area = EraseArcs.erasedAreaConcaveSub(vs, hs, near)
      assert(math.abs(sums - area) <= 1e-9 * math.max(1.0, area),
        s"zone $z rings $sums vs area $area")
    }
  }

  test("polygon-subtrahend rings: closure, orientation, area " +
      "conservation, determinism") {
    import graft.geo.EraseArcs
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    def sq(cx: Double, cy: Double, hw: Double) = Seq(
      (cx - hw, cy - hw), (cx + hw, cy - hw),
      (cx + hw, cy + hw), (cx - hw, cy + hw))
    def checkRings(zone: Seq[(Double, Double)],
        subs: Seq[Seq[(Double, Double)]])
        : Seq[Seq[EraseArcs.LinePiece]] = {
      val rings = EraseArcs.eraseRingsPolySub(zone, subs)
      val scale = (zone ++ subs.flatten)
        .flatMap(p => Seq(p._1.abs, p._2.abs)).max
      val tol = 1e-9 * math.max(1.0, scale)
      rings.foreach { ring =>
        // closure: each piece's end is the next piece's start (cyclic)
        ring.indices.foreach { i =>
          val a = ring(i); val b = ring((i + 1) % ring.size)
          val (ex, ey) = a.end; val (sx, sy) = b.start
          assert(math.hypot(ex - sx, ey - sy) <= tol,
            s"open ring at piece $i of $ring")
        }
        // orientation: hole-only loops are CW (negative signed area),
        // loops containing a zone piece are CCW-positive
        val area = ring.map(_.signedArea).sum
        if (ring.exists(_.kind == "zone"))
          assert(area > 0, s"outer ring CW: $ring")
        else assert(area < 0, s"hole ring CCW: $ring")
      }
      // area conservation: Σ ring signed areas == erasedAreaPolySub
      // (identical Green terms, re-associated only)
      val sum = rings.flatten.map(_.signedArea).sum
      val want = EraseArcs.erasedAreaPolySub(zone, subs)
      assert(math.abs(sum - want) <= 1e-9 * math.max(1.0, want),
        s"rings $sum vs erasedAreaPolySub $want")
      rings
    }
    // untouched zone: ONE CCW ring of the 4 full edges
    val r0 = checkRings(square, Nil)
    assert(r0.size === 1 && r0.head.size === 4 &&
      r0.head.forall(_.kind == "zone"))
    assert(math.abs(r0.head.map(_.signedArea).sum - 4e6) < 1e-6)
    // strictly interior subtrahend: CCW outer + a CW 4-piece hole of
    // exactly the subtrahend's (reversed) boundary
    val r1 = checkRings(square, Seq(sq(0, 0, 300)))
    assert(r1.size === 2)
    assert(r1.head.forall(_.kind == "zone") &&
      r1(1).forall(_.kind == "sub") && r1(1).size === 4)
    assert(math.abs(r1(1).map(_.signedArea).sum + 600.0 * 600.0) < 1e-6)
    // subtrahend poking OUT across one zone edge: ONE mixed ring
    // (zone-edge pieces + the subtrahend's interior pieces)
    val r2 = checkRings(square, Seq(sq(1000, 0, 300)))
    assert(r2.size === 1)
    assert(r2.head.map(_.kind).toSet === Set("zone", "sub"))
    assert(math.abs(r2.head.map(_.signedArea).sum -
      (4e6 - 300.0 * 600.0)) < 1e-6)
    // two OVERLAPPING interior squares (generic offset — aligned
    // twins would share collinear boundary segments, the declared
    // tangency-degenerate case the stitcher rejects loudly): outer +
    // ONE merged hole of inclusion-exclusion area
    val r3 = checkRings(square, Seq(sq(0, 0, 300), sq(200, 100, 250)))
    assert(r3.size === 2)
    assert(r3(1).forall(_.kind == "sub"))
    assert(math.abs(r3(1).map(_.signedArea).sum +
      (360000.0 + 250000.0 - 350.0 * 450.0)) < 1e-6)
    // a pseudo-random rotated-polygon configuration (multi-ring)
    val pent = Seq((-900.0, -700.0), (800.0, -1000.0), (1100.0, 200.0),
      (200.0, 1000.0), (-1000.0, 500.0))
    val subs = (1 to 10).map { i =>
      val a = i * 2.399963229728653
      val rad = 150.0 + (i * 173) % 900
      val cx = rad * math.cos(a); val cy = rad * math.sin(a)
      val rot = i * 0.7; val hw = 120.0 + (i * 37) % 180
      val n = if (i % 2 == 0) 4 else 3
      (0 until n).map { k =>
        val b = rot + 2 * math.Pi / n * k
        (cx + hw * math.cos(b), cy + hw * math.sin(b))
      }
    }
    checkRings(pent, subs)
    // deterministic output regardless of subtrahend arrival order /
    // winding / vertex rotation
    val canon = EraseArcs.eraseRingsPolySub(pent, subs)
    assert(EraseArcs.eraseRingsPolySub(pent, subs.reverse) === canon)
    assert(EraseArcs.eraseRingsPolySub(pent,
      subs.map(_.reverse)) === canon)
    assert(EraseArcs.eraseRingsPolySub(pent,
      subs.map(s => s.drop(1) ++ s.take(1))) === canon)
  }

  test("polygon-subtrahend rings: the distributed path equals a " +
      "driver-side replay") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.polygonZones(spark, sf)
    val subs = graft.ops.Wnv.parcelFootprints(spark, sf)
    val got = EraseArcs.eraseRingsPolySubPerZone(spark, zones, subs)
      .collect()
      .map(w => (w.getInt(0), w.getLong(1), w.getLong(2)) ->
        (w.getString(3), w.getDouble(4), w.getDouble(5), w.getDouble(6),
          w.getDouble(7), w.getDouble(8)))
      .toMap
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"))
      .collect()
      .map(w => (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1))))
    val ss = subs.select(col("vertices")).collect()
      .map(w => ring(w.getSeq[org.apache.spark.sql.Row](0)))
    assert(got.keys.map(_._1).toSet === zs.map(_._1).toSet)
    zs.foreach { case (z, vs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      val near = ss.filter { s =>
        val sx = (s.map(_._1).min + s.map(_._1).max) / 2
        val sy = (s.map(_._2).min + s.map(_._2).max) / 2
        val sr = math.hypot(s.map(_._1).max - s.map(_._1).min,
          s.map(_._2).max - s.map(_._2).min) / 2
        (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) < (rad + sr) * (rad + sr)
      }.toSeq
      val want = EraseArcs.eraseRingsPolySub(vs, near)
      val wantRows = want.zipWithIndex.flatMap { case (r, ri) =>
        val area = r.map(_.signedArea).sum
        r.zipWithIndex.map { case (p, pi) =>
          (z, ri.toLong, pi.toLong) ->
            (p.kind, p.x1, p.y1, p.x2, p.y2, area)
        }
      }
      assert(got.keys.count(_._1 == z) === wantRows.size, s"zone $z")
      val tol = 1e-9 * math.max(1.0, rad + cx.abs + cy.abs)
      wantRows.foreach { case (k, (kind, x1, y1, x2, y2, area)) =>
        val (gk, gx1, gy1, gx2, gy2, ga) = got(k)
        assert(gk === kind, s"$k kind")
        assert(math.abs(gx1 - x1) <= tol && math.abs(gy1 - y1) <= tol &&
          math.abs(gx2 - x2) <= tol && math.abs(gy2 - y2) <= tol,
          s"$k coords: ($gx1,$gy1)->($gx2,$gy2) vs ($x1,$y1)->($x2,$y2)")
        assert(math.abs(ga - area) <= 1e-9 * math.max(1.0, area.abs),
          s"$k ring area $ga vs $area")
      }
    }
  }

  test("mixed line+arc rings (disk subtrahends on polygon zones): " +
      "closure, orientation, conservation, determinism") {
    import graft.geo.EraseArcs
    def checkRings(outer: Seq[(Double, Double)],
        holes: Seq[Seq[(Double, Double)]],
        disks: Seq[(Double, Double)], r: Double)
        : Seq[Seq[EraseArcs.BoundaryPiece]] = {
      val rings = EraseArcs.eraseRingsPolyDisk(outer, holes, disks, r)
      val scale = (outer ++ holes.flatten ++ disks)
        .flatMap(p => Seq(p._1.abs, p._2.abs)).max
      val tol = 1e-9 * math.max(1.0, scale)
      rings.foreach { ring =>
        ring.indices.foreach { i =>
          val a = ring(i); val b = ring((i + 1) % ring.size)
          val (ex, ey) = a.end; val (sx, sy) = b.start
          assert(math.hypot(ex - sx, ey - sy) <= tol,
            s"open ring at piece $i of $ring")
        }
        val area = ring.map(_.signedArea).sum
        val hasZone = ring.exists {
          case lp: EraseArcs.LinePiece => lp.kind == "zone"
          case _ => false
        }
        if (hasZone) assert(area > 0, s"outer ring CW: $ring")
        else assert(area < 0, s"hole ring CCW: $ring")
      }
      // conservation against the INDEPENDENT area kernels (half-plane
      // interval algebra / ear-clip triangulation — no shared terms
      // with the crossing-angle midpoint classification)
      val sum = rings.flatten.map(_.signedArea).sum
      val want = EraseArcs.erasedAreaConcave(outer, holes, disks, r)
      assert(math.abs(sum - want) <= 1e-9 * math.max(1.0, want),
        s"rings $sum vs erasedAreaConcave $want")
      // determinism under disk order
      val again = EraseArcs.eraseRingsPolyDisk(outer, holes,
        disks.reverse, r)
      assert(again === rings, "rings depend on disk order")
      rings
    }
    def isArc(p: EraseArcs.BoundaryPiece): Boolean = p match {
      case _: EraseArcs.RingPiece => true
      case _ => false
    }
    val square = Seq((-1000.0, -1000.0), (1000.0, -1000.0),
      (1000.0, 1000.0), (-1000.0, 1000.0))
    // untouched: one CCW ring of the 4 edges, no arcs
    val r0 = checkRings(square, Nil, Nil, 300.0)
    assert(r0.size === 1 && r0.head.size === 4 && !r0.head.exists(isArc))
    // one disk straddling an edge: ONE mixed outer ring (line pieces +
    // one arc bridging the bite)
    val r1 = checkRings(square, Nil, Seq((1000.0, 100.0)), 300.0)
    assert(r1.size === 1)
    assert(r1.head.exists(isArc) && r1.head.count(!isArc(_)) >= 4)
    // disk strictly inside: CCW outer + a full-circle CW hole; exact
    // area square − πr²
    val r2 = checkRings(square, Nil, Seq((0.0, 0.0)), 300.0)
    assert(r2.size === 2)
    assert(r2.exists(ring => ring.size == 1 && (ring.head match {
      case rp: EraseArcs.RingPiece => rp.isFullCircle && !rp.ccw
      case _ => false
    })))
    val a2 = r2.flatten.map(_.signedArea).sum
    assert(math.abs(a2 - (4e6 - math.Pi * 9e4)) <= 1e-4)
    // disk covering a corner: both adjacent edges clipped, one arc
    val r3 = checkRings(square, Nil, Seq((1000.0, 1000.0)), 300.0)
    assert(r3.size === 1 && r3.head.count(isArc) === 1)
    // two overlapping interior disks: one merged CW cavity of two arcs
    val r4 = checkRings(square, Nil,
      Seq((-100.0, 0.0), (150.0, 60.0)), 300.0)
    assert(r4.size === 2)
    assert(r4.exists(ring => ring.size == 2 && ring.forall(isArc)))
    // hole + disk overlapping the hole: one merged cavity (hole edges
    // + arcs), plus conservation on the full general input
    val hole = Seq((-200.0, -200.0), (200.0, -200.0),
      (200.0, 200.0), (-200.0, 200.0))
    val r5 = checkRings(square, Seq(hole), Seq((350.0, 80.0)), 300.0)
    assert(r5.size === 2, s"expected outer + merged cavity: ${r5.size}")
    assert(r5.exists(ring => ring.exists(isArc) && ring.exists {
      case lp: EraseArcs.LinePiece => lp.kind == "sub"
      case _ => false
    }))
    // disk strictly inside the hole: erases nothing
    val r6 = checkRings(square, Seq(hole), Seq((0.0, 0.0)), 100.0)
    assert(r6.flatten.count(isArc) === 0)
    // concave star with hole × several disks (the query's shape)
    val star = Seq((1000.0, 0.0), (350.0, 350.0), (0.0, 1000.0),
      (-350.0, 350.0), (-1000.0, 0.0), (-350.0, -350.0),
      (0.0, -1000.0), (350.0, -350.0))
    val hole2 = Seq((150.0, 150.0), (-150.0, 150.0),
      (-150.0, -150.0), (150.0, -150.0))
    checkRings(star, Seq(hole2),
      Seq((700.0, 100.0), (-300.0, 500.0), (50.0, -600.0),
        (1100.0, 300.0)), 280.0)
    // circle-zone convergence: a fine n-gon zone's mixed rings
    // conserve toward the pure circle kernel ([[eraseRings]] family)
    val ngon = (0 until 512).map { k =>
      val a = 2 * math.Pi * k / 512
      (1000.0 * math.cos(a), 1000.0 * math.sin(a))
    }
    val disks = Seq((800.0, 150.0), (-200.0, 400.0), (-900.0, -500.0))
    val got = EraseArcs.eraseRingsPolyDisk(ngon, Nil, disks, 300.0)
      .flatten.map(_.signedArea).sum
    val want = EraseArcs.erasedArea(1000.0, disks, 300.0)
    assert(math.abs(got - want) / want < 1e-3,
      s"ngon rings $got vs circle kernel $want")
  }

  test("mixed line+arc rings: the distributed path equals a " +
      "driver-side replay and conserves the concave area kernel") {
    import graft.geo.EraseArcs
    val zones = graft.ops.Wnv.starZones(spark, sf)
    val buffers = graft.ops.Wnv.optOut(spark, sf)
      .select(col("x_ft"), col("y_ft"))
    val r = graft.ops.Wnv.BufferFt
    val got = EraseArcs.eraseRingsPolyDiskPerZone(spark, zones, buffers, r)
      .collect()
      .map(w => (w.getInt(0), w.getLong(1), w.getLong(2)) ->
        (w.getString(3), w.getDouble(4), w.getDouble(5), w.getDouble(6),
          w.getDouble(7), w.getDouble(13)))
      .toMap
    def ring(rows: Seq[org.apache.spark.sql.Row]): Seq[(Double, Double)] =
      rows.map(v => (v.getDouble(0), v.getDouble(1)))
    val zs = zones.select(col("zone_id").cast("int"), col("vertices"),
        col("holes"))
      .collect().map { w =>
        (w.getInt(0), ring(w.getSeq[org.apache.spark.sql.Row](1)),
          w.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](2)
            .map(h => ring(h.toSeq)))
      }
    val bs = buffers.collect().map(w => (w.getDouble(0), w.getDouble(1)))
    assert(got.keys.map(_._1).toSet === zs.map(_._1).toSet)
    val scale = 4e6 // state-plane feet
    val tol = 1e-9 * scale
    zs.foreach { case (z, vs, hs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      // the distributed plan's own candidate rule (bounding circle)
      val near = bs.filter { case (ox, oy) =>
        (ox - cx) * (ox - cx) + (oy - cy) * (oy - cy) < (rad + r) * (rad + r)
      }.toSeq
      val want = EraseArcs.eraseRingsPolyDisk(vs, hs, near, r)
      val wantRows = want.zipWithIndex.flatMap { case (rg, ri) =>
        val area = rg.map(_.signedArea).sum
        rg.zipWithIndex.map { case (p, pi) =>
          val (kind, x1, y1, x2, y2) = p match {
            case lp: EraseArcs.LinePiece =>
              (lp.kind, lp.x1, lp.y1, lp.x2, lp.y2)
            case rp: EraseArcs.RingPiece =>
              ("arc", rp.start._1, rp.start._2, rp.end._1, rp.end._2)
          }
          (z, ri.toLong, pi.toLong) -> (kind, x1, y1, x2, y2, area)
        }
      }
      assert(got.keys.count(_._1 == z) === wantRows.size, s"zone $z rows")
      wantRows.foreach { case (k, (kind, x1, y1, x2, y2, area)) =>
        val (gk, gx1, gy1, gx2, gy2, ga) = got(k)
        assert(gk === kind, s"$k kind")
        assert(math.abs(gx1 - x1) <= tol && math.abs(gy1 - y1) <= tol &&
          math.abs(gx2 - x2) <= tol && math.abs(gy2 - y2) <= tol,
          s"$k coords: ($gx1,$gy1)->($gx2,$gy2) vs ($x1,$y1)->($x2,$y2)")
        assert(math.abs(ga - area) <= 1e-9 * math.max(1.0, area.abs),
          s"$k ring area $ga vs $area")
      }
      // Σ ring signed areas == the INDEPENDENT triangulation kernel
      val sums = wantRows.groupBy(_._1._2).map(_._2.head._2._6).sum
      val areaK = EraseArcs.erasedAreaConcave(vs, hs, near, r)
      assert(math.abs(sums - areaK) <= 1e-9 * math.max(1.0, areaK),
        s"zone $z rings $sums vs concave kernel $areaK")
    }
  }
}

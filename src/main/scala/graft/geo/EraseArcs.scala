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

  /** EXACT area of (zone disk − union of buffer disks) via Green's
    * theorem over the region's arc boundary — the closed form of the
    * quantity the reference's final report wants (how much ground the
    * spray zone actually covers after opt-outs). Pure JVM on one
    * zone's geometry (buffer centers RELATIVE to the zone center);
    * unit- and grid-sampling-tested in GeoSpec without Spark.
    *
    * Boundary decomposition: the region's boundary is (a) the zone
    * circle's arcs not inside any buffer, traversed CCW, and (b) for
    * each buffer, the arcs of its circle inside the zone and outside
    * every other buffer, traversed CW (hole side). For an arc of a
    * circle centered (cx,cy) radius ρ over [θa,θb] CCW, ½∮(x dy − y dx)
    * = ½[ρ²Δθ + cx·ρ(sin θb − sin θa) − cy·ρ(cos θb − cos θa)]; CW
    * pieces contribute the negation. Exact-duplicate buffer centers
    * are deduplicated first (identical circles would erase each
    * other's boundary).
    */
  /** Green's-theorem contribution of a CCW arc of the circle centered
    * (cx,cy), radius ρ, over [a,b]: ½[ρ²Δθ + cx·ρ(sin b − sin a) −
    * cy·ρ(cos b − cos a)]. Shared by the circle and polygon kernels.
    */
  private def arcContrib(cx: Double, cy: Double, rho: Double,
      a: Double, b: Double): Double =
    0.5 * (rho * rho * (b - a) +
      cx * rho * (math.sin(b) - math.sin(a)) -
      cy * rho * (math.cos(b) - math.cos(a)))

  private def clampAcos(x: Double): Double =
    math.acos(math.max(-1.0, math.min(1.0, x)))

  /** Boundary decomposition of (zone disk − union of buffer disks),
    * shared by [[erasedArea]] and [[eraseRings]]: the zone circle's
    * surviving CCW intervals, plus — per buffer — the intervals of its
    * circle that lie ON the region boundary (inside the zone, outside
    * every other buffer; traversed CW by consumers). Buffers are
    * deduped, bound-filtered, and SORTED so piece identity downstream
    * is deterministic regardless of input row order (the interval
    * VALUES are order-independent already — [[survivingIntervals]]
    * sorts; only float-sum order shifts below 1e-10 relative).
    */
  private[geo] def boundaryDecomp(bigR: Double,
      buffersIn: Seq[(Double, Double)], r: Double)
      : (Seq[(Double, Double)],
         Seq[((Double, Double), Seq[(Double, Double)])]) = {
    // IndexedSeq: the grid below addresses buffers BY INDEX, and a
    // List-backed input would turn each lookup into an O(B) walk —
    // quietly restoring the quadratic this grid exists to remove
    val buffers = buffersIn.distinct.sorted
      .filter { case (x, y) => math.hypot(x, y) < bigR + r }.toIndexedSeq
    // (a) surviving zone arcs, CCW around the origin
    val zoneCovered = buffers.flatMap { case (ox, oy) =>
      val d = math.hypot(ox, oy)
      if (d >= bigR + r) None
      else if (d <= r - bigR) Some((0.0, math.Pi)) // boundary swallowed
      else if (d <= bigR - r) None                 // strictly interior
      else Some((math.atan2(oy, ox),
        clampAcos((d * d + bigR * bigR - r * r) / (2 * d * bigR))))
    }
    val zoneArcs = survivingIntervals(zoneCovered)
    // (b) per buffer: pieces inside the zone, outside other buffers.
    // Only buffers with center distance < 2r can cover each other's
    // circles, so neighbor lookup goes through a uniform grid of cell
    // size 2r (candidates = the 3×3 cell neighborhood) instead of the
    // all-pairs scan — the buffer-buffer grid join the area kernel's
    // scale note names, done in-process: per-buffer work tracks LOCAL
    // density, not the zone's total buffer count (the sf10 drive
    // measured the all-pairs form at 31× the sf1 line). Candidate
    // order is index-ascending; interval VALUES are order-independent
    // (survivingIntervals sorts), so the output is unchanged.
    val cell = 2 * r
    def cellOf(x: Double, y: Double): (Long, Long) =
      (math.floor(x / cell).toLong, math.floor(y / cell).toLong)
    val grid: Map[(Long, Long), Seq[Int]] =
      buffers.indices.groupBy(i => cellOf(buffers(i)._1, buffers(i)._2))
    val bufferArcs = buffers.zipWithIndex.map { case ((ox, oy), i) =>
      val d = math.hypot(ox, oy)
      // interval of THIS buffer circle lying inside the zone disk
      val inside: Option[(Double, Double)] =
        if (d >= bigR + r) None
        else if (d <= bigR - r) Some((0.0, math.Pi)) // whole circle inside
        else if (d <= r - bigR) None // zone inside buffer: circle outside
        else Some((math.atan2(-oy, -ox),
          clampAcos((d * d + r * r - bigR * bigR) / (2 * d * r))))
      val arcs = inside match {
        case None => Seq.empty[(Double, Double)]
        case Some((inB, inA)) =>
          // covered-by-others on this circle + the outside-zone band
          val (ci, cj) = cellOf(ox, oy)
          val near = (for {
            dx <- -1L to 1L; dy <- -1L to 1L
            j <- grid.getOrElse((ci + dx, cj + dy), Seq.empty)
            if j != i
          } yield j).sorted
          val others = near.map(buffers).flatMap { case (px, py) =>
              val dij = math.hypot(px - ox, py - oy)
              if (dij >= 2 * r) None
              else if (dij == 0.0) None // deduped above; safety
              else Some((math.atan2(py - oy, px - ox),
                clampAcos(dij / (2 * r))))
            }
          val outsideZone =
            if (inA >= math.Pi) Nil // fully inside: no outside band
            else Seq((inB + math.Pi, math.Pi - inA))
          survivingIntervals(others ++ outsideZone)
      }
      ((ox, oy), arcs)
    }
    (zoneArcs, bufferArcs)
  }

  private[graft] def erasedArea(bigR: Double,
      buffersIn: Seq[(Double, Double)], r: Double): Double = {
    val (zoneArcs, bufferArcs) = boundaryDecomp(bigR, buffersIn, r)
    val zonePart = zoneArcs
      .map { case (s, e) => arcContrib(0.0, 0.0, bigR, s, e) }.sum
    val bufferPart = bufferArcs.map { case ((ox, oy), arcs) =>
      arcs.map { case (s, e) => arcContrib(ox, oy, r, s, e) }.sum
    }.sum
    // hole pieces are CW: subtract their CCW-form contributions
    math.max(0.0, zonePart - bufferPart)
  }

  /** Surviving area per zone in square feet (see [[erasedArea]]):
    * same broadcast-join candidate generation as [[eraseArcs]], the
    * per-zone geometry evaluated in `mapGroups` (candidate sets are
    * locality-bounded; at extreme buffer densities the buffer-buffer
    * pairing inside becomes its own grid-cell join — the documented
    * swap). Zones with no candidate buffer keep the full πR².
    */
  def eraseArea(spark: SparkSession, zones: DataFrame, buffers: DataFrame,
      bufferFt: Double): DataFrame = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"),
      col("cx_ft"), col("cy_ft"), col("radius_ft"))
    val pairs = buffers.select(col("x_ft"), col("y_ft"))
      .join(broadcast(zcat),
        Geo.dist2(col("x_ft"), col("y_ft"), col("cx_ft"), col("cy_ft"))
          < (col("radius_ft") + bufferFt) * (col("radius_ft") + bufferFt))
      .select(col("zone_id").cast("int"),
        (col("x_ft") - col("cx_ft")).as("dx"),
        (col("y_ft") - col("cy_ft")).as("dy"), col("radius_ft"))
      .as[(Int, Double, Double, Double)]
    val touched = pairs.groupByKey(_._1).mapGroups { (zid, rows) =>
      val rs = rows.toSeq
      zid -> erasedArea(rs.head._4, rs.map(t => (t._2, t._3)), bufferFt)
    }.collect().toMap
    val all = zcat.select(col("zone_id"), col("radius_ft"))
      .as[(Int, Double)].collect().toSeq.sortBy(_._1).map { case (z, rr) =>
        (z, touched.getOrElse(z, math.Pi * rr * rr))
      }
    all.toDF("zone_id", "area_sqft")
  }

  /** CONVEX-POLYGON generalization of [[erasedArea]] — the last
    * reference-geometry scope item (arcpy Erase on polygon zones,
    * reference GSheetsETL_Lab2.py:133) for convex vertex rings: EXACT
    * area of (convex polygon − union of buffer disks), same
    * Green's-theorem boundary decomposition:
    *
    *   (a) straight-edge pieces outside every disk, traversed CCW —
    *       per edge, each disk covers ONE parametric t-interval from
    *       the line-circle quadratic ‖A + t·AB − o‖² < r²; a 1-D
    *       interval merge + complement yields the survivors, and a
    *       segment P₁→P₂ contributes ½(x₁y₂ − x₂y₁);
    *   (b) per disk, the arcs of its circle inside the polygon and
    *       outside every other disk, traversed CW (hole side) — the
    *       circle's OUTSIDE-the-polygon set is, per edge half-plane,
    *       one angular interval centered on the outward normal's
    *       bearing with half-width acos(−proj/r) (proj = signed
    *       center distance): the SAME angular-interval merge
    *       ([[survivingIntervals]]) as the circle-circle case.
    *
    * Vertices may wind either way (the shoelace sign normalizes to
    * CCW). Pure JVM on one zone's geometry; unit- and grid-sampling-
    * tested in GeoSpec without Spark, and cross-checked against the
    * circle kernel via a fine regular polygon.
    */
  private[graft] def erasedAreaPoly(verticesIn: Seq[(Double, Double)],
      buffersIn: Seq[(Double, Double)], r: Double): Double = {
    require(verticesIn.size >= 3, "polygon needs >= 3 vertices")
    val shoelace = verticesIn.indices.map { i =>
      val (x1, y1) = verticesIn(i)
      val (x2, y2) = verticesIn((i + 1) % verticesIn.size)
      x1 * y2 - x2 * y1
    }.sum
    val vertices = if (shoelace >= 0) verticesIn else verticesIn.reverse
    // CONVEXITY is a hard precondition of this kernel: the per-edge
    // half-plane decomposition of a disk's outside-the-polygon set is
    // only valid when the polygon is the intersection of its edge
    // half-planes. A concave ring would return a silently-wrong area —
    // fail loudly instead (concave/holed rings go through
    // [[erasedAreaConcave]], which triangulates and sums this kernel).
    vertices.indices.foreach { i =>
      val (ax, ay) = vertices(i)
      val (bx, by) = vertices((i + 1) % vertices.size)
      val (cx2, cy2) = vertices((i + 2) % vertices.size)
      val cross = (bx - ax) * (cy2 - by) - (by - ay) * (cx2 - bx)
      require(cross >= -1e-9 * math.abs(shoelace),
        s"erasedAreaPoly: concave vertex at ($bx,$by) — " +
          "use erasedAreaConcave for non-convex rings")
    }
    val edges = vertices.indices.map { i =>
      (vertices(i), vertices((i + 1) % vertices.size))
    }
    val buffers = buffersIn.distinct
    // (a) surviving straight-edge pieces, CCW
    val edgePart = edges.map { case ((ax, ay), (bx, by)) =>
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      // a zero-length edge (repeated vertex) would 0-divide the
      // quadratic roots into NaN intervals and silently corrupt the
      // area — fail loudly instead (same discipline as the circle
      // kernel's loud guards)
      require(len2 > 0,
        s"erasedAreaPoly: degenerate zero-length edge at ($ax,$ay)")
      val covered = buffers.flatMap { case (ox, oy) =>
        val fx = ax - ox; val fy = ay - oy
        val bq = fx * dx + fy * dy
        val cq = fx * fx + fy * fy - r * r
        val disc = bq * bq - len2 * cq
        if (disc <= 0) None
        else {
          val sq = math.sqrt(disc)
          val s = math.max(0.0, (-bq - sq) / len2)
          val e = math.min(1.0, (-bq + sq) / len2)
          if (s < e) Some((s, e)) else None
        }
      }.sortBy(_._1)
      val merged = covered.foldLeft(List.empty[(Double, Double)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: tl if s <= pe => (ps, math.max(pe, e)) :: tl
          case _ => (s, e) :: acc
        }
      }.reverse
      val bounds =
        0.0 +: merged.flatMap { case (s, e) => Seq(s, e) } :+ 1.0
      bounds.grouped(2).collect { case Seq(s, e) if e > s =>
        val x1 = ax + s * dx; val y1 = ay + s * dy
        val x2 = ax + e * dx; val y2 = ay + e * dy
        0.5 * (x1 * y2 - x2 * y1)
      }.sum
    }.sum
    // (b) per-disk hole arcs, CW (subtracted)
    val bufferPart = buffers.zipWithIndex.map { case ((ox, oy), i) =>
      var disjoint = false // circle fully outside one half-plane ⇒ disk ∩ polygon = ∅
      val outside = edges.flatMap { case ((ax, ay), (bx, by)) =>
        val nx = by - ay; val ny = -(bx - ax) // outward normal (CCW ring)
        val nn = math.hypot(nx, ny)
        val proj = (nx * (ox - ax) + ny * (oy - ay)) / nn
        val ce = -proj / r
        if (ce >= 1) None // circle never outside this edge
        else if (ce <= -1) { disjoint = true; None }
        else Some((math.atan2(ny, nx), clampAcos(ce)))
      }
      if (disjoint) 0.0
      else {
        val others = buffers.zipWithIndex.filter(_._2 != i).map(_._1)
          .flatMap { case (qx, qy) =>
            val dij = math.hypot(qx - ox, qy - oy)
            if (dij >= 2 * r || dij == 0.0) None
            else Some((math.atan2(qy - oy, qx - ox),
              clampAcos(dij / (2 * r))))
          }
        survivingIntervals(outside ++ others)
          .map { case (s, e) => arcContrib(ox, oy, r, s, e) }.sum
      }
    }.sum
    math.max(0.0, edgePart - bufferPart)
  }

  /** Ear-clipping triangulation of a SIMPLE polygon (concave allowed,
    * no self-intersections, no holes): returns triangles that PARTITION
    * the ring — disjoint interiors, union = polygon — so any additive
    * measure (area, erased area) sums exactly over them. O(n²) scan
    * per clip, fine for zone rings (≤ tens of vertices; the zone
    * catalog is cluster-constant — SCALE.md). Input winding is
    * normalized to CCW; consecutive duplicate vertices are dropped;
    * collinear vertices are clipped as degenerate (zero-area) ears.
    * Fails loudly on rings it cannot clip (self-intersecting input).
    */
  private[graft] def triangulate(ringIn: Seq[(Double, Double)])
      : Seq[Seq[(Double, Double)]] = {
    // drop consecutive duplicates (incl. a closing vertex == first)
    val dedup0 = ringIn.foldLeft(Vector.empty[(Double, Double)]) {
      (acc, v) => if (acc.nonEmpty && acc.last == v) acc else acc :+ v
    }
    val dedup = if (dedup0.size > 1 && dedup0.head == dedup0.last)
      dedup0.dropRight(1) else dedup0
    require(dedup.size >= 3, "triangulate: polygon needs >= 3 vertices")
    val shoelace = dedup.indices.map { i =>
      val (x1, y1) = dedup(i); val (x2, y2) = dedup((i + 1) % dedup.size)
      x1 * y2 - x2 * y1
    }.sum
    val eps = 1e-12 * math.max(1.0, math.abs(shoelace))
    var ring = if (shoelace >= 0) dedup else dedup.reverse
    val out = Vector.newBuilder[Seq[(Double, Double)]]
    def cross(a: (Double, Double), b: (Double, Double),
        c: (Double, Double)): Double =
      (b._1 - a._1) * (c._2 - b._2) - (b._2 - a._2) * (c._1 - b._1)
    // inside-OR-ON the triangle: a REFLEX vertex lying exactly on the
    // candidate diagonal (the L-shape corner case) makes the ear
    // invalid on one side even though it is not strictly interior —
    // the inclusive test blocks it. Rejecting a borderline-valid ear
    // is safe (another ear exists by the two-ears theorem; the loud
    // require below catches genuinely unclippable = self-intersecting
    // input).
    def inTriIncl(p: (Double, Double), a: (Double, Double),
        b: (Double, Double), c: (Double, Double)): Boolean =
      cross(a, b, p) >= -eps && cross(b, c, p) >= -eps &&
        cross(c, a, p) >= -eps
    while (ring.size > 3) {
      val n = ring.size
      val reflex = (0 until n).filter { i =>
        cross(ring((i + n - 1) % n), ring(i), ring((i + 1) % n)) < -eps
      }.map(ring).toSet
      val ear = (0 until n).find { i =>
        val a = ring((i + n - 1) % n); val b = ring(i)
        val c = ring((i + 1) % n)
        val cr = cross(a, b, c)
        if (cr < -eps) false // reflex vertex — never an ear
        else if (cr <= eps) true // collinear: zero-area ear, clip free
        else reflex.forall { p =>
          (p == a) || (p == b) || (p == c) || !inTriIncl(p, a, b, c)
        }
      }
      require(ear.isDefined,
        "triangulate: no ear found — ring is self-intersecting")
      val i = ear.get; val n2 = ring.size
      val tri = Seq(ring((i + n2 - 1) % n2), ring(i), ring((i + 1) % n2))
      // skip zero-area slivers (collinear clips) — they contribute
      // nothing and would trip erasedAreaPoly's zero-length-edge guard
      if (math.abs(cross(tri(0), tri(1), tri(2))) > eps) out += tri
      ring = ring.patch(i, Nil, 1)
    }
    out += ring.toSeq
    out.result()
  }

  /** GENERAL-POLYGON Erase area — concave rings and holes (the full
    * input domain of arcpy's Erase on polygon zones, reference
    * GSheetsETL_Lab2.py:133): EXACT area of
    * ((outer − ∪holes) − union of buffer disks).
    *
    * Reduction, not new geometry: ear-clip the outer ring (and each
    * hole ring) into triangles ([[triangulate]] — a PARTITION, so
    * areas add exactly), evaluate the CONVEX kernel
    * ([[erasedAreaPoly]]) per triangle (every triangle is convex),
    * and combine:
    *
    *   area(P∖U) = Σᵢ area(Tᵢ∖U)                 (outer triangles)
    *   area((P∖H)∖U) = area(P∖U) − Σⱼ area(Hⱼ∖U)  (holes ⊆ P, disjoint)
    *
    * — the second identity because (P∖U) ∩ Hⱼ = Hⱼ∖U for holes inside
    * the outer ring. A disk crossing several triangles contributes
    * each triangle's portion independently; internal edges carry no
    * double-count because each term is an AREA, not a contour piece.
    *
    * Preconditions (caller contract, same loud-failure discipline as
    * the convex kernel): simple rings, holes pairwise disjoint and
    * inside the outer ring.
    */
  private[graft] def erasedAreaConcave(outer: Seq[(Double, Double)],
      holes: Seq[Seq[(Double, Double)]],
      buffers: Seq[(Double, Double)], r: Double): Double = {
    def piece(ring: Seq[(Double, Double)]): Double =
      triangulate(ring).map(t => erasedAreaPoly(t, buffers, r)).sum
    math.max(0.0, piece(outer) - holes.map(piece).sum)
  }

  /** Surviving area per GENERAL polygon zone (see [[erasedAreaConcave]]):
    * zones arrive as (zone_id, outer vertex ring, array of hole rings).
    * Same broadcast-join candidate generation as [[eraseAreaPoly]]
    * (touch predicate on the outer ring's bounding circle); zones with
    * no candidate buffer keep the exact shoelace area (outer − holes).
    */
  def eraseAreaConcave(spark: SparkSession, zones: DataFrame,
      buffers: DataFrame, bufferFt: Double): DataFrame = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"),
        col("vertices"), col("holes"))
      .as[(Int, Seq[(Double, Double)], Seq[Seq[(Double, Double)]])]
      .collect().toSeq
    eraseAreaDiskTri(spark, zcat, buffers, bufferFt)
  }

  /** Longest-edge midpoint subdivision until the triangle's bounding
    * radius (max vertex distance from the centroid) is ≤ maxRad.
    * Areas add exactly (the midpoint split partitions the triangle),
    * so any subdivision depth computes the same erased area — the knob
    * only bounds how much of the zone one task's kernel call sees.
    */
  private[graft] def subdivide(t: Seq[(Double, Double)],
      maxRad: Double, depth: Int = 0): Seq[Seq[(Double, Double)]] = {
    // each split halves the longest edge, so 64 levels shrink any
    // finite triangle below any positive maxRad; hitting the cap means
    // a non-positive/denormal maxRad or NaN vertices — fail loudly
    // instead of recursing to an exponential triangle count
    require(depth < 64,
      s"subdivide: depth cap hit (maxRad=$maxRad, t=$t) — " +
        "non-positive radius bound or degenerate vertices?")
    val cx = t.map(_._1).sum / t.size
    val cy = t.map(_._2).sum / t.size
    val rad = t.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
    if (rad <= maxRad || t.size != 3) Seq(t)
    else {
      def d2(a: (Double, Double), b: (Double, Double)) =
        (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2)
      val i = (0 until 3).maxBy(k => d2(t(k), t((k + 1) % 3)))
      val a = t(i); val b = t((i + 1) % 3); val c = t((i + 2) % 3)
      val m = ((a._1 + b._1) / 2, (a._2 + b._2) / 2)
      subdivide(Seq(a, m, c), maxRad, depth + 1) ++
        subdivide(Seq(m, b, c), maxRad, depth + 1)
    }
  }

  /** Shared TRIANGLE-GRANULAR distributed plan for DISK subtrahends on
    * polygon zones (the disk twin of [[eraseAreaConcaveSub]]'s plan):
    * ear-clip each ring driver-side, SUBDIVIDE each triangle to a
    * bounding radius ≤ 2·bufferFt, broadcast the triangle-bound
    * catalog, and run the convex kernel per (zone, triangle) group
    * with only the disks whose centers sit within brad + bufferFt of
    * that triangle. Hole-ring triangles count negative (holes ⊆ outer,
    * pairwise disjoint — the [[erasedAreaConcave]] identity).
    *
    * The subdivision is the scale lever: the per-group kernel is
    * quadratic in its CANDIDATE count (every surviving arc is clipped
    * against every overlapping neighbor), so a whole-zone group costs
    * (zone's disks)² on ONE task — measured 83 s for the star catalog
    * at sf10's opt-out density (70× its sf1 time; round-15 sweep).
    * With triangle extents pinned at O(bufferFt), each group sees only
    * the disks overlapping its neighborhood — work per group is
    * (local density)², group count tracks zone area, and the job
    * parallelizes across every core/executor. Same plan at 100 TB:
    * the broadcast triangle catalog is |zones|·O((R/r)²) rows and the
    * disk side streams.
    *
    * Float note: each far disk contributes NO term to a kernel sum
    * (not a 0.0 term), so candidate pruning is value-exact; the
    * per-group buffer list is SORTED so the arc-term summation order
    * is deterministic under any partitioning. Association across
    * triangles differs from the whole-zone kernel at the ulp level —
    * inside GeoSpec's existing 1e-9-relative replay pins.
    */
  private def eraseAreaDiskTri(spark: SparkSession,
      zcat: Seq[(Int, Seq[(Double, Double)], Seq[Seq[(Double, Double)]])],
      buffers: DataFrame, bufferFt: Double): DataFrame = {
    // maxRad = 2·bufferFt below: a non-positive radius would make
    // subdivide recurse toward its depth cap on every triangle
    require(bufferFt > 0, s"eraseAreaDiskTri: bufferFt=$bufferFt must be > 0")
    import spark.implicits._
    def shoelace(vs: Seq[(Double, Double)]): Double =
      math.abs(vs.indices.map { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
        x1 * y2 - x2 * y1
      }.sum) / 2
    val maxRad = 2.0 * bufferFt
    val tcat: Seq[(Int, Int, Int, Seq[(Double, Double)])] =
      zcat.flatMap { case (z, vs, hs) =>
        (triangulate(vs).flatMap(subdivide(_, maxRad)).map(t => (1, t)) ++
          hs.flatMap(h => triangulate(h).flatMap(subdivide(_, maxRad))
            .map(t => (-1, t))))
          .zipWithIndex.map { case ((sgn, t), i) => (z, i, sgn, t) }
      }
    val bound = tcat.map { case (z, i, _, t) =>
      val cx = t.map(_._1).sum / t.size
      val cy = t.map(_._2).sum / t.size
      val rad = t.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      (z, i, cx, cy, rad)
    }.toDF("zone_id", "tri_id", "bcx", "bcy", "brad")
    // triangle vertices ride task closures (bounded: zones × O((R/r)²)
    // triangles of 3 vertices — the zEdgesMap convention)
    val tris = tcat.map { case (z, i, _, t) => (z, i) -> t }.toMap
    val pairs = buffers.select(col("x_ft"), col("y_ft"))
      .join(broadcast(bound),
        Geo.dist2(col("x_ft"), col("y_ft"), col("bcx"), col("bcy"))
          < (col("brad") + bufferFt) * (col("brad") + bufferFt))
      .select(col("zone_id").cast("int"), col("tri_id").cast("int"),
        col("x_ft"), col("y_ft"))
      .as[(Int, Int, Double, Double)]
    val touched = pairs.groupByKey(r => (r._1, r._2))
      .mapGroups { (k: (Int, Int), rows: Iterator[(Int, Int, Double, Double)]) =>
        (k._1, k._2,
          erasedAreaPoly(tris(k), rows.map(r => (r._3, r._4)).toSeq.sorted,
            bufferFt))
      }
      .collect() // bounded: zones × triangles, areas only
      .map(r => (r._1, r._2) -> r._3).toMap
    val byZone = tcat.groupBy(_._1)
    val all = zcat.sortBy(_._1).map { case (z, _, _) =>
      val s = byZone(z).map { case (_, i, sgn, t) =>
        sgn * touched.getOrElse((z, i), shoelace(t))
      }.sum
      (z, math.max(0.0, s))
    }
    all.toDF("zone_id", "area_sqft")
  }

  /** Surviving area per POLYGON zone in square feet (see
    * [[erasedAreaPoly]]): zones arrive as vertex rings
    * (zone_id, vertex ring as array of (x_ft, y_ft) structs).
    * Distributed via the shared triangle-granular plan
    * ([[eraseAreaDiskTri]]); triangles with no candidate disk keep the
    * exact shoelace area.
    */
  def eraseAreaPoly(spark: SparkSession, zones: DataFrame,
      buffers: DataFrame, bufferFt: Double): DataFrame = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"),
        col("vertices")) // array<struct<x:double,y:double>>
      .as[(Int, Seq[(Double, Double)])]
      .collect().toSeq
      .map { case (z, vs) => (z, vs, Seq.empty[Seq[(Double, Double)]]) }
    eraseAreaDiskTri(spark, zcat, buffers, bufferFt)
  }

  // ---- GENERAL POLYGON SUBTRAHEND (round 12) -------------------------
  // arcpy Erase accepts ARBITRARY erase features, not only buffer
  // disks (the reference's only actual use is the 1500 ft buffer,
  // GSheetsETL_Lab2.py:129-133); this family completes the operator's
  // general contract: zone polygon − union of SUBTRAHEND POLYGONS.
  // Same Green's-theorem boundary decomposition as the disk kernels,
  // with the angular-interval machinery replaced by parametric
  // t-intervals on straight edges ("edge clipping"):
  //   (a) zone edges CCW, minus the t-intervals covered by any
  //       subtrahend (segment-in-polygon: crossing params + midpoint
  //       point-in-polygon per sub-interval);
  //   (b) each subtrahend's edges clipped to the convex zone and to
  //       the OUTSIDE of every other subtrahend, traversed REVERSED
  //       (the kept region lies right of the subtrahend's CCW edge).
  // All intersection points are rational in the vertex coordinates —
  // no transcendentals — but the clipping algorithm itself has no SQL
  // form, so the query keeps the erase family's declared no-oracle
  // rule with GeoSpec pinning hand cases, rectangle algebra,
  // inclusion-exclusion, winding invariance, grid sampling, and
  // convergence to the circle kernel on a fine n-gon subtrahend.

  /** Ray-cast point-in-polygon (strict interior for generic points;
    * boundary points are resolved arbitrarily — callers only test
    * interval MIDPOINTS, which are off-boundary in general position).
    */
  private def pointInPoly(px: Double, py: Double,
      poly: Seq[(Double, Double)]): Boolean = {
    var in = false
    var j = poly.size - 1
    var i = 0
    while (i < poly.size) {
      val (xi, yi) = poly(i); val (xj, yj) = poly(j)
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) in = !in
      j = i; i += 1
    }
    in
  }

  /** Merged t-intervals of segment A→B lying inside simple polygon
    * `poly` (winding-agnostic): crossing parameters against every
    * polygon edge split [0,1]; each sub-interval is classified by its
    * midpoint. Degenerate polygon edges fail loudly (same discipline
    * as the convex kernel).
    */
  private def segInPolyIntervals(ax: Double, ay: Double, bx: Double,
      by: Double, poly: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val dx = bx - ax; val dy = by - ay
    val ts = Seq.newBuilder[Double]
    poly.indices.foreach { i =>
      val (cx, cy) = poly(i)
      val (ex, ey) = poly((i + 1) % poly.size)
      val fx = ex - cx; val fy = ey - cy
      require(fx != 0.0 || fy != 0.0,
        s"erasedAreaPolySub: degenerate subtrahend edge at ($cx,$cy)")
      val denom = dx * fy - dy * fx
      if (denom != 0.0) {
        val t = ((cx - ax) * fy - (cy - ay) * fx) / denom
        val u = ((cx - ax) * dy - (cy - ay) * dx) / denom
        if (t > 0.0 && t < 1.0 && u >= 0.0 && u <= 1.0) ts += t
      }
    }
    val bounds = (0.0 +: ts.result().sorted :+ 1.0).distinct
    bounds.sliding(2).collect { case Seq(s, e) if e > s &&
        pointInPoly(ax + (s + e) / 2 * dx, ay + (s + e) / 2 * dy, poly) =>
      (s, e)
    }.toSeq
  }

  /** 1-D interval merge (inputs clamped to [0,1], sorted by start). */
  private def mergeIntervals(
      in: Seq[(Double, Double)]): List[(Double, Double)] =
    in.sortBy(_._1).foldLeft(List.empty[(Double, Double)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: tl if s <= pe => (ps, math.max(pe, e)) :: tl
        case _ => (s, e) :: acc
      }
    }.reverse

  /** CCW-normalize a subtrahend ring (loud guard on degenerate rings) —
    * one code path for the kernel and the distributed wrapper so their
    * per-piece arithmetic is identical. */
  private def normalizeCcw(ring: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    require(ring.size >= 3, "subtrahend needs >= 3 vertices")
    val sl = ring.indices.map { i =>
      val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % ring.size)
      x1 * y2 - x2 * y1
    }.sum
    if (sl >= 0) ring else ring.reverse
  }

  /** Canonical form of a ring for duplicate detection: CCW winding,
    * rotated to start at the lexicographically smallest vertex. Two
    * rings listing the same polygon through a rotated vertex order or
    * opposite winding canonicalize identically (r12 ADVICE: plain
    * representation `distinct` missed those, and two same-polygon
    * rings would then each see the other covering all their edges —
    * the union boundary silently vanished instead of erasing once).
    * Rings that differ in vertex SET (e.g. an inserted collinear
    * vertex) remain distinct representations — out of scope, same as
    * the general-position contract. Geometry is unchanged. */
  private[geo] def canonicalRing(ringIn: Seq[(Double, Double)])
      : Seq[(Double, Double)] = {
    val ring = normalizeCcw(ringIn)
    val i = ring.indices.minBy(ring(_))
    ring.drop(i) ++ ring.take(i)
  }

  /** CCW-normalized vertices + edges of a CONVEX zone ring (loud
    * guards), shared by the kernel and the distributed wrapper. */
  private def convexZoneEdges(verticesIn: Seq[(Double, Double)])
      : IndexedSeq[((Double, Double), (Double, Double))] = {
    require(verticesIn.size >= 3, "polygon needs >= 3 vertices")
    val shoelace = verticesIn.indices.map { i =>
      val (x1, y1) = verticesIn(i)
      val (x2, y2) = verticesIn((i + 1) % verticesIn.size)
      x1 * y2 - x2 * y1
    }.sum
    val vertices = if (shoelace >= 0) verticesIn else verticesIn.reverse
    vertices.indices.foreach { i =>
      val (ax, ay) = vertices(i)
      val (bx, by) = vertices((i + 1) % vertices.size)
      val (cx2, cy2) = vertices((i + 2) % vertices.size)
      val cross = (bx - ax) * (cy2 - by) - (by - ay) * (cx2 - bx)
      require(cross >= -1e-9 * math.abs(shoelace),
        s"erasedAreaPolySub: concave vertex at ($bx,$by) — " +
          "use erasedAreaConcaveSub for non-convex zones")
    }
    vertices.indices.map { i =>
      (vertices(i), vertices((i + 1) % vertices.size))
    }.toIndexedSeq
  }

  /** Common face of the two boundary-piece vocabularies ([[LinePiece]]
    * straight segments, [[RingPiece]] circular arcs): traversal
    * endpoints for endpoint-matching stitchers and the Green's-theorem
    * term along the traversal direction. Sealed here so the MIXED
    * stitcher ([[stitchMixedPieces]] — disk subtrahends on polygon
    * zones, where one output ring alternates line and arc pieces) can
    * pattern-match exhaustively.
    */
  private[graft] sealed trait BoundaryPiece extends Serializable {
    def start: (Double, Double)
    def end: (Double, Double)
    def signedArea: Double
  }

  /** One directed boundary piece of a polygon-subtrahend erased
    * region: the straight segment (x1,y1) → (x2,y2) traversed with the
    * KEPT region on the left — zone-edge pieces run along the zone's
    * CCW ring; subtrahend-edge pieces run REVERSED (the hole side).
    * The linear analogue of [[RingPiece]]; `signedArea` is the
    * segment's Green's-theorem term along the traversal direction, so
    * Σ signedArea over all of a zone's pieces == [[erasedAreaPolySub]]
    * term-for-term (the area kernel sums exactly these).
    */
  private[graft] case class LinePiece(kind: String, x1: Double, y1: Double,
      x2: Double, y2: Double) extends BoundaryPiece {
    def start: (Double, Double) = (x1, y1)
    def end: (Double, Double) = (x2, y2)
    def signedArea: Double = 0.5 * (x1 * y2 - x2 * y1)
  }

  /** Surviving pieces of one zone edge traversed CCW minus its covered
    * intervals (MERGED, sorted) — the boundary (a) term piecewise;
    * [[zoneEdgeGreen]] is their signed-area sum (identical terms,
    * identical order, so the area and ring paths agree bitwise). */
  private def zoneEdgePieces(ax: Double, ay: Double, bx: Double, by: Double,
      covered: List[(Double, Double)]): Seq[LinePiece] = {
    val dx = bx - ax; val dy = by - ay
    require(dx != 0.0 || dy != 0.0,
      s"erasedAreaPolySub: degenerate zero-length edge at ($ax,$ay)")
    val bounds = 0.0 +: covered.flatMap { case (s, e) => Seq(s, e) } :+ 1.0
    bounds.grouped(2).collect { case Seq(s, e) if e > s =>
      LinePiece("zone", ax + s * dx, ay + s * dy, ax + e * dx, ay + e * dy)
    }.toSeq
  }

  /** Green's contribution of one zone edge traversed CCW minus its
    * covered intervals (MERGED, sorted). */
  private def zoneEdgeGreen(ax: Double, ay: Double, bx: Double, by: Double,
      covered: List[(Double, Double)]): Double =
    zoneEdgePieces(ax, ay, bx, by, covered).map(_.signedArea).sum

  /** The (b) term for ONE CCW subtrahend ring `p` against a convex
    * zone: its edge pieces inside the zone and outside every OTHER
    * subtrahend (the `others` rings, any exact superset of the actual
    * coverers — non-coverers contribute empty interval lists),
    * traversed reversed. Shared by the kernel and the distributed
    * wrapper; arithmetic per piece is identical in both.
    */
  private def subEdgePieces(
      zEdges: IndexedSeq[((Double, Double), (Double, Double))],
      p: Seq[(Double, Double)],
      others: Int => Seq[Seq[(Double, Double)]]): Seq[LinePiece] =
    p.indices.flatMap { i =>
      val (cx, cy) = p(i)
      val (ex, ey) = p((i + 1) % p.size)
      val dx = ex - cx; val dy = ey - cy
      require(dx != 0.0 || dy != 0.0,
        s"erasedAreaPolySub: degenerate subtrahend edge at ($cx,$cy)")
      // parametric clip of C→E to the convex CCW zone (inside = left
      // of every zone edge)
      var t0 = 0.0; var t1 = 1.0
      zEdges.foreach { case ((zax, zay), (zbx, zby)) =>
        val nx = zbx - zax; val ny = zby - zay
        val f0 = nx * (cy - zay) - ny * (cx - zax)
        val fd = nx * dy - ny * dx
        if (fd == 0.0) { if (f0 < 0.0) { t0 = 1.0; t1 = 0.0 } }
        else {
          val tc = -f0 / fd
          if (fd > 0.0) t0 = math.max(t0, tc)
          else t1 = math.min(t1, tc)
        }
      }
      if (t0 >= t1) Nil
      else {
        val coveredByOthers = mergeIntervals(
          others(i).flatMap(o => segInPolyIntervals(cx, cy, ex, ey, o)))
        // survivors of [t0, t1] minus coveredByOthers, each traversed
        // e → s (kept side left — the hole side of the subtrahend)
        var cur = t0
        val acc = Seq.newBuilder[LinePiece]
        def reversedPiece(s: Double, e: Double): LinePiece =
          LinePiece("sub", cx + e * dx, cy + e * dy,
            cx + s * dx, cy + s * dy)
        coveredByOthers.foreach { case (s, e) =>
          if (e > cur && s < t1) {
            if (s > cur) acc += reversedPiece(cur, math.min(s, t1))
            cur = math.max(cur, math.min(e, t1))
          }
        }
        if (cur < t1) acc += reversedPiece(cur, t1)
        acc.result()
      }
    }

  private def subContribution(
      zEdges: IndexedSeq[((Double, Double), (Double, Double))],
      p: Seq[(Double, Double)],
      others: Int => Seq[Seq[(Double, Double)]]): Double =
    subEdgePieces(zEdges, p, others).map(_.signedArea).sum

  /** EXACT area of (convex zone polygon − union of subtrahend simple
    * polygons) — see the family header above. Zone ring requirements
    * match [[erasedAreaPoly]] (convex, loud guards); subtrahends may
    * be any simple rings in either winding and in general position
    * (no exactly-shared boundary segments between subtrahends).
    */
  /** Canonical distinct subtrahends + a bbox-grid candidate lookup —
    * the spatial prune for the pairwise term, shared by the area and
    * ring kernels. A subtrahend whose bounding box misses a segment's
    * bounding box cannot cover any part of it, so bucket subtrahends
    * on a grid (cell = the largest bbox extent) and probe only the
    * cells a segment's bbox touches. Without this the ∂P_k-vs-P_j term
    * is quadratic in the LOCAL footprint count — measured 17 s at sf1
    * (~700 footprints/zone) and unusable at sf10; physically
    * near-disjoint parcels prune to O(1) candidates per edge,
    * restoring the linear shape the disk kernels have.
    * Canonicalization (CCW + rotation-normalized) + distinct is
    * load-bearing: two same-polygon rings would otherwise each see the
    * other covering all their edges and the union boundary would
    * vanish.
    */
  private def subPruneIndex(subsIn: Seq[Seq[(Double, Double)]])
      : (IndexedSeq[Seq[(Double, Double)]],
         (Double, Double, Double, Double) => Seq[Int]) = {
    val subs = subsIn.map(canonicalRing).distinct.toIndexedSeq
    val bboxes = subs.map { p =>
      (p.map(_._1).min, p.map(_._2).min, p.map(_._1).max, p.map(_._2).max)
    }
    val cellSz = math.max(1.0, bboxes.map { case (x0, y0, x1, y1) =>
      math.max(x1 - x0, y1 - y0) }.foldLeft(0.0)(math.max))
    val grid = new java.util.HashMap[Long, List[Int]]()
    def cellKey(cx: Long, cy: Long): Long = cx * 0x100000000L + cy
    bboxes.zipWithIndex.foreach { case ((x0, y0, x1, y1), k) =>
      var cx = math.floor(x0 / cellSz).toLong
      while (cx <= math.floor(x1 / cellSz).toLong) {
        var cy = math.floor(y0 / cellSz).toLong
        while (cy <= math.floor(y1 / cellSz).toLong) {
          val key = cellKey(cx, cy)
          grid.put(key, k :: Option(grid.get(key)).getOrElse(Nil))
          cy += 1
        }
        cx += 1
      }
    }
    // distinct subtrahend indices whose bbox may intersect the given
    // segment bbox (exact superset of the covering subs). EMPTY subs
    // short-circuit: with no bboxes cellSz floors at 1.0 ft and the
    // scan below would walk every 1-ft cell of the edge bbox — at
    // state-plane coordinates that is ~10⁶ iterations per edge for a
    // guaranteed-empty answer (measured: 36 s of driver CPU building
    // the rings plan at sf0.001, where most zones are untouched and
    // take the subs-free driver path).
    def candidatesNear(ax: Double, ay: Double, bx: Double,
        by: Double): Seq[Int] = if (subs.isEmpty) Nil else {
      val x0 = math.min(ax, bx); val x1 = math.max(ax, bx)
      val y0 = math.min(ay, by); val y1 = math.max(ay, by)
      val out = scala.collection.mutable.SortedSet.empty[Int]
      var cx = math.floor(x0 / cellSz).toLong
      while (cx <= math.floor(x1 / cellSz).toLong) {
        var cy = math.floor(y0 / cellSz).toLong
        while (cy <= math.floor(y1 / cellSz).toLong) {
          val l = grid.get(cellKey(cx, cy))
          if (l != null) l.foreach { k =>
            val (bx0, by0, bx1, by1) = bboxes(k)
            if (bx0 <= x1 && x0 <= bx1 && by0 <= y1 && y0 <= by1) out += k
          }
          cy += 1
        }
        cx += 1
      }
      out.toSeq
    }
    (subs, candidatesNear)
  }

  private[graft] def erasedAreaPolySub(verticesIn: Seq[(Double, Double)],
      subsIn: Seq[Seq[(Double, Double)]]): Double = {
    val zEdges = convexZoneEdges(verticesIn)
    val (subs, candidatesNear) = subPruneIndex(subsIn)
    // (a) zone-edge pieces outside every subtrahend, CCW
    val edgePart = zEdges.map { case ((ax, ay), (bx, by)) =>
      zoneEdgeGreen(ax, ay, bx, by,
        mergeIntervals(candidatesNear(ax, ay, bx, by)
          .flatMap(k => segInPolyIntervals(ax, ay, bx, by, subs(k)))))
    }.sum
    // (b) subtrahend-edge pieces inside the zone and outside every
    // other subtrahend, traversed REVERSED (kept region on the left)
    val subPart = subs.zipWithIndex.map { case (p, k) =>
      subContribution(zEdges, p, { i =>
        val (cx, cy) = p(i)
        val (ex, ey) = p((i + 1) % p.size)
        candidatesNear(cx, cy, ex, ey).filter(_ != k).map(subs)
      })
    }.sum
    math.max(0.0, edgePart + subPart)
  }

  /** ALL directed boundary pieces of (convex zone − union of
    * subtrahend polygons): the zone-edge survivors (CCW) and the
    * subtrahend-edge survivors (reversed) — exactly the terms
    * [[erasedAreaPolySub]] integrates, emitted as segments instead of
    * summed. [[eraseRingsPolySub]] stitches them into closed rings.
    */
  private[graft] def erasePolySubPieces(verticesIn: Seq[(Double, Double)],
      subsIn: Seq[Seq[(Double, Double)]]): Seq[LinePiece] = {
    val zEdges = convexZoneEdges(verticesIn)
    val (subs, candidatesNear) = subPruneIndex(subsIn)
    val zonePieces = zEdges.flatMap { case ((ax, ay), (bx, by)) =>
      zoneEdgePieces(ax, ay, bx, by,
        mergeIntervals(candidatesNear(ax, ay, bx, by)
          .flatMap(k => segInPolyIntervals(ax, ay, bx, by, subs(k)))))
    }
    val subPieces = subs.zipWithIndex.flatMap { case (p, k) =>
      subEdgePieces(zEdges, p, { i =>
        val (cx, cy) = p(i)
        val (ex, ey) = p((i + 1) % p.size)
        candidatesNear(cx, cy, ex, ey).filter(_ != k).map(subs)
      })
    }
    zonePieces ++ subPieces
  }

  /** Stitch directed line pieces into closed boundary rings — the
    * straight-edge analogue of [[eraseRings]]'s arc stitcher: at every
    * boundary vertex of a manifold region exactly one piece starts
    * where another ends, so following end → start until closure
    * reconstructs each loop. Endpoints computed through two different
    * parametrizations (a zone-edge crossing parameter vs the
    * subtrahend edge's zone-clip parameter) agree to IEEE rounding;
    * the match tolerance is 1e-9 × the coordinate scale, nearest
    * candidate wins, and the chain FAILS loudly if no piece continues
    * (non-manifold boundary — tangency-degenerate input, outside the
    * general-position contract). Rings and their starting pieces are
    * rotated / ordered by a canonical key so output is deterministic
    * regardless of piece arrival order. Orientation falls out of
    * construction: loops enclosing surviving area run CCW (signed
    * area > 0), hole loops run CW (< 0), and Σ signed areas ==
    * [[erasedAreaPolySub]] (same Green terms, re-associated only).
    */
  private[graft] def stitchLinePieces(
      piecesIn: Seq[LinePiece]): Seq[Seq[LinePiece]] = {
    val pieces = piecesIn.toIndexedSeq
    if (pieces.isEmpty) return Seq.empty
    val scale = pieces.iterator.flatMap(p =>
      Iterator(p.x1.abs, p.y1.abs, p.x2.abs, p.y2.abs)).max
    val tol = 1e-9 * math.max(1.0, scale)
    def dist(a: (Double, Double), b: (Double, Double)): Double =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val hcell = 4 * tol
    def hkey(p: (Double, Double)): (Long, Long) =
      (math.floor(p._1 / hcell).toLong, math.floor(p._2 / hcell).toLong)
    val byStart = scala.collection.mutable.HashMap
      .empty[(Long, Long), List[Int]]
    pieces.zipWithIndex.foreach { case (p, i) =>
      val k = hkey(p.start)
      byStart(k) = i :: byStart.getOrElse(k, Nil)
    }
    val used = Array.fill(pieces.size)(false)
    def takeAt(pt: (Double, Double)): Option[Int] = {
      val (ki, kj) = hkey(pt)
      val cands = for {
        dx <- -1L to 1L; dy <- -1L to 1L
        i <- byStart.getOrElse((ki + dx, kj + dy), Nil)
        if !used(i) && dist(pieces(i).start, pt) <= tol
      } yield i
      if (cands.isEmpty) None
      else Some(cands.minBy(i => (dist(pieces(i).start, pt), i)))
    }
    val chains = Vector.newBuilder[Seq[LinePiece]]
    pieces.indices.foreach { seed =>
      if (!used(seed)) {
        used(seed) = true
        val first = pieces(seed)
        val chain = scala.collection.mutable.ArrayBuffer(first)
        var cur = first
        while (dist(cur.end, first.start) > tol) {
          val idx = takeAt(cur.end).getOrElse(throw new
            IllegalArgumentException(
              "requirement failed: stitchLinePieces: no piece starts " +
                "at a boundary vertex — tangency-degenerate input"))
          used(idx) = true
          cur = pieces(idx)
          chain += cur
        }
        chains += chain.toSeq
      }
    }
    def key(p: LinePiece): (Int, Double, Double, Double, Double) =
      (if (p.kind == "zone") 0 else 1, p.x1, p.y1, p.x2, p.y2)
    val ord = Ordering.Tuple5[Int, Double, Double, Double, Double]
    val rings = chains.result().map { ring =>
      val i = ring.indices.minBy(j => key(ring(j)))(ord)
      ring.drop(i) ++ ring.take(i)
    }
    rings.sortBy(ring => key(ring.head))(ord)
  }

  /** OUTPUT RINGS of (convex zone polygon − union of subtrahend
    * polygons) — the feature class arcpy's Erase emits
    * (GSheetsETL_Lab2.py:133) under its GENERAL erase-feature
    * signature, completing the geometric contract the disk-subtrahend
    * [[eraseRings]] covers for buffer erasure: each closed boundary
    * loop alternates zone-edge segments (CCW) and subtrahend-edge
    * segments (reversed / hole side) joined at edge-edge intersection
    * points. GeoSpec pins closure, orientation, Σ ring signed areas ==
    * [[erasedAreaPolySub]], and determinism under input order/winding.
    */
  private[graft] def eraseRingsPolySub(verticesIn: Seq[(Double, Double)],
      subsIn: Seq[Seq[(Double, Double)]]): Seq[Seq[LinePiece]] =
    stitchLinePieces(erasePolySubPieces(verticesIn, subsIn))

  /** GENERAL zone rings with polygon subtrahends: ear-clip the outer
    * and hole rings and sum the convex kernel per triangle — the same
    * additive-measure reduction as [[erasedAreaConcave]].
    */
  private[graft] def erasedAreaConcaveSub(outer: Seq[(Double, Double)],
      holes: Seq[Seq[(Double, Double)]],
      subs: Seq[Seq[(Double, Double)]]): Double = {
    def piece(ring: Seq[(Double, Double)]): Double =
      triangulate(ring).map(t => erasedAreaPolySub(t, subs)).sum
    math.max(0.0, piece(outer) - holes.map(piece).sum)
  }

  /** Edge pieces of ONE member ring `p` (CCW) against a GENERAL simple
    * outer ring: the pieces of p's edges inside the outer ring and
    * outside every OTHER member (the `others` rings, any exact
    * superset of the actual coverers), traversed REVERSED (kept region
    * on the left — the hole side). The general-zone analogue of
    * [[subEdgePieces]]: the convex parametric half-plane clip is
    * replaced by [[segInPolyIntervals]] against the outer ring, which
    * needs no convexity (a member edge can enter and leave a concave
    * outer ring several times — each surviving sub-interval becomes
    * its own piece). Shared by the driver kernel and the distributed
    * plan so their per-piece arithmetic is identical.
    */
  private def memberEdgePieces(outer: Seq[(Double, Double)],
      p: Seq[(Double, Double)],
      others: Int => Seq[Seq[(Double, Double)]]): Seq[LinePiece] =
    p.indices.flatMap { i =>
      val (cx, cy) = p(i)
      val (ex, ey) = p((i + 1) % p.size)
      val dx = ex - cx; val dy = ey - cy
      require(dx != 0.0 || dy != 0.0,
        s"eraseRingsConcaveSub: degenerate member edge at ($cx,$cy)")
      val inOuter = segInPolyIntervals(cx, cy, ex, ey, outer)
      val covered = mergeIntervals(
        others(i).flatMap(o => segInPolyIntervals(cx, cy, ex, ey, o)))
      def reversedPiece(s: Double, e: Double): LinePiece =
        LinePiece("sub", cx + e * dx, cy + e * dy,
          cx + s * dx, cy + s * dy)
      // survivors: inOuter minus covered, each traversed e → s
      inOuter.flatMap { case (s0, e0) =>
        var cur = s0
        val acc = Seq.newBuilder[LinePiece]
        covered.foreach { case (s, e) =>
          if (e > cur && s < e0) {
            if (s > cur) acc += reversedPiece(cur, math.min(s, e0))
            cur = math.max(cur, math.min(e, e0))
          }
        }
        if (cur < e0) acc += reversedPiece(cur, e0)
        acc.result()
      }
    }

  /** ALL directed boundary pieces of (GENERAL simple zone polygon −
    * union of member polygons), where the zone's HOLE rings are passed
    * as members: R = outer ∖ ∪members, so holes and subtrahends are
    * the same thing to the boundary algebra (a subtrahend overlapping
    * a hole is resolved by the mutual member-vs-member clipping,
    * exactly like two overlapping subtrahends in the convex kernel).
    * Piece set: (a) outer-ring edges CCW minus the intervals covered
    * by any member ([[zoneEdgePieces]] — already general); (b) each
    * member's edges inside the outer ring and outside every other
    * member, REVERSED ([[memberEdgePieces]]). [[stitchLinePieces]]
    * chains them into closed rings. Same general-position contract as
    * the convex path (tangency fails loudly in the stitcher —
    * GeoPropertySpec pins the failure is never silent).
    */
  private[graft] def eraseGeneralPieces(outerIn: Seq[(Double, Double)],
      membersIn: Seq[Seq[(Double, Double)]]): Seq[LinePiece] = {
    require(outerIn.size >= 3, "polygon needs >= 3 vertices")
    val outer = normalizeCcw(outerIn)
    val (members, candidatesNear) = subPruneIndex(membersIn)
    val zonePieces = outer.indices.flatMap { i =>
      val (ax, ay) = outer(i)
      val (bx, by) = outer((i + 1) % outer.size)
      zoneEdgePieces(ax, ay, bx, by, mergeIntervals(
        candidatesNear(ax, ay, bx, by)
          .flatMap(k => segInPolyIntervals(ax, ay, bx, by, members(k)))))
    }
    val memberPieces = members.zipWithIndex.flatMap { case (p, k) =>
      memberEdgePieces(outer, p, { i =>
        val (cx, cy) = p(i)
        val (ex, ey) = p((i + 1) % p.size)
        candidatesNear(cx, cy, ex, ey).filter(_ != k).map(members)
      })
    }
    zonePieces ++ memberPieces
  }

  /** OUTPUT RINGS of (GENERAL zone polygon − holes − union of
    * subtrahend polygons) — ring output for CONCAVE zones (with
    * holes), the one geometry cell [[eraseRingsPolySub]]'s convex-only
    * stitch left uncovered (r13 verdict): each closed boundary loop
    * alternates outer-ring segments (CCW) and member segments
    * (reversed / hole side). GeoSpec pins closure, orientation,
    * Σ ring signed areas == [[erasedAreaConcaveSub]] (an INDEPENDENT
    * method — triangulation × the convex area kernel), convex
    * agreement with [[eraseRingsPolySub]], and determinism.
    */
  private[graft] def eraseRingsConcaveSub(outer: Seq[(Double, Double)],
      holes: Seq[Seq[(Double, Double)]],
      subs: Seq[Seq[(Double, Double)]]): Seq[Seq[LinePiece]] =
    stitchLinePieces(eraseGeneralPieces(outer, holes ++ subs))

  // ---- DISK SUBTRAHENDS ON POLYGON ZONES: RING OUTPUT (round 15) ----
  // The one remaining geometry-OUTPUT cell — and the reference's
  // literal Erase shape: arcpy erases 1500-ft DISK buffers from
  // POLYGON high-risk zones (GSheetsETL_Lab2.py:129-133). Area and
  // selection were exact here since rounds 8/9 ([[erasedAreaPoly]] /
  // [[erasedAreaConcave]]); rings existed for circle zones
  // ([[eraseRings]], arc pieces) and polygon subtrahends
  // ([[eraseRingsPolySub]] / [[eraseRingsConcaveSub]], line pieces).
  // This family unifies the two piece vocabularies: a boundary ring of
  // (general polygon − holes − union of disks) alternates STRAIGHT
  // pieces (outer-ring edges CCW / hole-ring edges reversed, minus the
  // t-intervals covered by any disk — the same line-circle quadratic
  // the area kernel integrates) and ARC pieces (each disk circle's
  // intervals inside the outer ring, outside every hole and every
  // other disk, traversed CW — hole side), joined at segment-circle
  // and circle-circle intersection points. [[stitchMixedPieces]]
  // chains them by endpoint matching exactly like the two
  // single-vocabulary stitchers.

  /** Raw parametric roots of ‖A + t·(dx,dy) − o‖² = r² (the covered
    * t-window of the segment's supporting line), or None when the line
    * misses or grazes the circle. Shared by the covered-interval and
    * crossing-angle consumers so both see the same IEEE values.
    */
  private def segDiskRoots(ax: Double, ay: Double, dx: Double, dy: Double,
      len2: Double, ox: Double, oy: Double, r: Double)
      : Option[(Double, Double)] = {
    val fx = ax - ox; val fy = ay - oy
    val bq = fx * dx + fy * dy
    val cq = fx * fx + fy * fy - r * r
    val disc = bq * bq - len2 * cq
    if (disc <= 0) None
    else {
      val sq = math.sqrt(disc)
      Some(((-bq - sq) / len2, (-bq + sq) / len2))
    }
  }

  /** Merged-input form of the disk cover of one segment: the clamped
    * t-interval in [0,1], or None — the same quadratic
    * [[erasedAreaPoly]]'s edge term integrates. */
  private def segDiskCover(ax: Double, ay: Double, dx: Double, dy: Double,
      len2: Double, ox: Double, oy: Double, r: Double)
      : Option[(Double, Double)] =
    segDiskRoots(ax, ay, dx, dy, len2, ox, oy, r).flatMap { case (t1, t2) =>
      val s = math.max(0.0, t1); val e = math.min(1.0, t2)
      if (s < e) Some((s, e)) else None
    }

  /** Survivors of one CCW member (hole) edge minus its covered
    * intervals (MERGED, sorted), traversed REVERSED (kept region on
    * the left — the hole side): the complement logic of
    * [[zoneEdgePieces]] with the traversal flipped. */
  private def reversedEdgePieces(cx: Double, cy: Double, ex: Double,
      ey: Double, covered: List[(Double, Double)]): Seq[LinePiece] = {
    val dx = ex - cx; val dy = ey - cy
    require(dx != 0.0 || dy != 0.0,
      s"erasePolyDisk: degenerate zero-length hole edge at ($cx,$cy)")
    val bounds = 0.0 +: covered.flatMap { case (s, e) => Seq(s, e) } :+ 1.0
    bounds.grouped(2).collect { case Seq(s, e) if e > s =>
      LinePiece("sub", cx + e * dx, cy + e * dy, cx + s * dx, cy + s * dy)
    }.toSeq
  }

  /** The arc pieces of ONE disk circle (center (ox,oy), radius r) on
    * the boundary of (outer − holes − disks): partition the circle at
    * every crossing angle (vs outer/hole edges — the shared quadratic
    * roots mapped through atan2 of the SAME intersection point the
    * line pieces end at, so stitch endpoints agree to IEEE rounding —
    * and vs other disk circles, bearing ± acos(d/2r)), classify each
    * sub-arc by its MIDPOINT (inside outer, outside every hole,
    * outside every other disk — the general-polygon analogue of the
    * convex half-plane interval algebra, valid with no convexity
    * assumption), then MERGE adjacent kept arcs. The merge makes the
    * output independent of the candidate set: a non-covering neighbor
    * in a superset (the distributed plan's grid join, or a
    * zone-assigned disk that misses this circle) adds either no
    * crossing angles or only splits both of whose sides classify
    * identically — so kernel and distributed plans emit the SAME
    * maximal pieces, not merely the same union. `others` may be any
    * superset of the disks within 2r (a disk at ≥ 2r can cover no
    * point of this circle). Traversal is CW (`ccw = false` — the
    * region lies outside the disk), matching [[eraseRings]]'s buffer
    * arcs.
    */
  private def diskArcPieces(outer: Seq[(Double, Double)],
      holes: Seq[Seq[(Double, Double)]], ox: Double, oy: Double,
      r: Double, others: Seq[(Double, Double)]): Seq[RingPiece] = {
    val tau = 2 * math.Pi
    val ringsAll = outer +: holes
    val segAngles = ringsAll.flatMap { ring =>
      ring.indices.flatMap { i =>
        val (ax, ay) = ring(i)
        val (bx, by) = ring((i + 1) % ring.size)
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        require(len2 > 0,
          s"erasePolyDisk: degenerate zero-length edge at ($ax,$ay)")
        segDiskRoots(ax, ay, dx, dy, len2, ox, oy, r).toSeq
          .flatMap { case (t1, t2) => Seq(t1, t2) }
          .filter(t => t > 0.0 && t < 1.0)
          .map(t => math.atan2(ay + t * dy - oy, ax + t * dx - ox))
      }
    }
    val diskAngles = others.flatMap { case (qx, qy) =>
      val dij = math.hypot(qx - ox, qy - oy)
      if (dij >= 2 * r || dij == 0.0) Nil
      else {
        val th = math.atan2(qy - oy, qx - ox)
        val al = clampAcos(dij / (2 * r))
        Seq(th - al, th + al)
      }
    }
    val angles = (segAngles ++ diskAngles)
      .map(a => ((a % tau) + tau) % tau).distinct.sorted.toIndexedSeq
    def keepAt(a: Double): Boolean = {
      val px = ox + r * math.cos(a); val py = oy + r * math.sin(a)
      pointInPoly(px, py, outer) &&
        !holes.exists(h => pointInPoly(px, py, h)) &&
        !others.exists { case (qx, qy) =>
          math.hypot(px - qx, py - qy) < r }
    }
    val n = angles.size
    if (n == 0) {
      // No crossings: the circle lies entirely on one side of every
      // boundary component — classify by CONTAINMENT, not a sampled
      // circle point (a sample can land exactly ON a tangent boundary,
      // where ray-cast resolution is arbitrary; the adversarial
      // tangency property caught exactly that with an internally-
      // tangent disk). With equal radii another disk cannot contain
      // this circle without crossing it (only an exact duplicate
      // could, and duplicates are deduped), so other disks never cover
      // a crossing-free circle; a hole entirely INSIDE the disk leaves
      // the circle untouched, while a disk inside a hole is erased
      // from the region.
      val outerInDisk = outer.forall { case (x, y) =>
        math.hypot(x - ox, y - oy) < r }
      val inHole = holes.exists { h =>
        h.exists { case (x, y) => math.hypot(x - ox, y - oy) >= r } &&
          pointInPoly(ox, oy, h)
      }
      if (!outerInDisk && pointInPoly(ox, oy, outer) && !inHole)
        Seq(RingPiece(ccw = false, ox, oy, r, 0.0, tau))
      else Nil
    } else {
      // arc i spans [ext(i), ext(i+1)) in unwrapped angle space
      val ext = (angles ++ angles.map(_ + tau)) :+ (angles.head + 2 * tau)
      val kept = (0 until n).map { i =>
        keepAt(((ext(i) + ext(i + 1)) / 2) % tau)
      }
      if (kept.forall(identity))
        // crossing points exist but cover nothing (grazing candidates)
        Seq(RingPiece(ccw = false, ox, oy, r, 0.0, tau))
      else if (!kept.exists(identity)) Nil
      else {
        // cyclic merge of consecutive kept arcs, starting after a
        // non-kept arc so no run is split by the array seam
        val start = kept.indexOf(false)
        val merged = Vector.newBuilder[(Double, Double)]
        var run: Option[(Double, Double)] = None
        (0 until n).foreach { j =>
          val i = start + 1 + j
          if (kept(i % n)) {
            run = run match {
              case None => Some((ext(i), ext(i + 1)))
              case Some((s, _)) => Some((s, ext(i + 1)))
            }
          } else {
            run.foreach(merged += _); run = None
          }
        }
        run.foreach(merged += _)
        merged.result()
          .map { case (s, e) => if (s >= tau) (s - tau, e - tau) else (s, e) }
          .sortBy(_._1)
          .map { case (s, e) => RingPiece(ccw = false, ox, oy, r, s, e) }
      }
    }
  }

  /** ALL directed boundary pieces of ((general simple zone polygon −
    * holes) − union of DISK subtrahends): (a) outer-ring edges CCW
    * minus the t-intervals covered by any disk ([[zoneEdgePieces]]
    * over the shared quadratic); (b) hole-ring edges minus disk cover,
    * REVERSED ([[reversedEdgePieces]] — holes are strictly inside the
    * outer ring and pairwise disjoint by the family's caller contract,
    * so disks are their only coverers); (c) per disk, its circle's
    * surviving arcs, CW ([[diskArcPieces]]). Same general-position
    * contract as the line-only family: tangency fails loudly in the
    * stitcher, never silently. Disks are deduped and sorted so piece
    * generation order is deterministic.
    */
  private[graft] def erasePolyDiskPieces(outerIn: Seq[(Double, Double)],
      holesIn: Seq[Seq[(Double, Double)]],
      disksIn: Seq[(Double, Double)], r: Double): Seq[BoundaryPiece] = {
    require(outerIn.size >= 3, "polygon needs >= 3 vertices")
    val outer = normalizeCcw(outerIn)
    val holes = holesIn.map(normalizeCcw)
    val disks = disksIn.distinct.sorted
    val zonePieces: Seq[BoundaryPiece] = outer.indices.flatMap { i =>
      val (ax, ay) = outer(i)
      val (bx, by) = outer((i + 1) % outer.size)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      require(len2 > 0,
        s"erasePolyDisk: degenerate zero-length edge at ($ax,$ay)")
      zoneEdgePieces(ax, ay, bx, by, mergeIntervals(
        disks.flatMap { case (ox, oy) =>
          segDiskCover(ax, ay, dx, dy, len2, ox, oy, r) }))
    }
    val holePieces: Seq[BoundaryPiece] = holes.flatMap { h =>
      h.indices.flatMap { i =>
        val (cx, cy) = h(i)
        val (ex, ey) = h((i + 1) % h.size)
        val dx = ex - cx; val dy = ey - cy
        val len2 = dx * dx + dy * dy
        require(len2 > 0,
          s"erasePolyDisk: degenerate zero-length hole edge at ($cx,$cy)")
        reversedEdgePieces(cx, cy, ex, ey, mergeIntervals(
          disks.flatMap { case (ox, oy) =>
            segDiskCover(cx, cy, dx, dy, len2, ox, oy, r) }))
      }
    }
    val arcPieces: Seq[BoundaryPiece] = disks.zipWithIndex.flatMap {
      case ((ox, oy), k) =>
        diskArcPieces(outer, holes, ox, oy, r, disks.patch(k, Nil, 1))
    }
    zonePieces ++ holePieces ++ arcPieces
  }

  /** Stitch MIXED line+arc boundary pieces into closed rings — the
    * unification of [[stitchLinePieces]] (straight segments) and
    * [[eraseRings]]'s arc chain (circle arcs): full-circle arc pieces
    * close alone; every other piece chains end → start by
    * nearest-candidate endpoint matching through a hash grid. Line and
    * arc endpoints at the same segment-circle intersection are
    * computed through two parametrizations (the quadratic t-root vs
    * the atan2→cos/sin roundtrip of the same point) and agree to IEEE
    * rounding — well inside the 1e-9·scale tolerance. FAILS loudly
    * when no piece continues (non-manifold boundary —
    * tangency-degenerate input, outside the general-position
    * contract). Rings and their starting pieces are rotated / ordered
    * by a canonical key so output is deterministic regardless of piece
    * arrival order. Orientation falls out of construction (outer loops
    * CCW, holes CW) and Σ ring signed areas equals the Green's-theorem
    * area of the region (same terms, re-associated only).
    */
  private[graft] def stitchMixedPieces(
      piecesIn: Seq[BoundaryPiece]): Seq[Seq[BoundaryPiece]] = {
    val (closedSeq, openSeq) = piecesIn.partition {
      case rp: RingPiece => rp.isFullCircle
      case _ => false
    }
    val pieces = openSeq.toIndexedSeq
    if (pieces.isEmpty && closedSeq.isEmpty) return Seq.empty
    val scale = (closedSeq ++ pieces).iterator.flatMap(p =>
      Iterator(p.start._1.abs, p.start._2.abs, p.end._1.abs,
        p.end._2.abs)).max
    val tol = 1e-9 * math.max(1.0, scale)
    def dist(a: (Double, Double), b: (Double, Double)): Double =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val hcell = 4 * tol
    def hkey(p: (Double, Double)): (Long, Long) =
      (math.floor(p._1 / hcell).toLong, math.floor(p._2 / hcell).toLong)
    val byStart = scala.collection.mutable.HashMap
      .empty[(Long, Long), List[Int]]
    pieces.zipWithIndex.foreach { case (p, i) =>
      val k = hkey(p.start)
      byStart(k) = i :: byStart.getOrElse(k, Nil)
    }
    val used = Array.fill(pieces.size)(false)
    def takeAt(pt: (Double, Double)): Option[Int] = {
      val (ki, kj) = hkey(pt)
      val cands = for {
        dx <- -1L to 1L; dy <- -1L to 1L
        i <- byStart.getOrElse((ki + dx, kj + dy), Nil)
        if !used(i) && dist(pieces(i).start, pt) <= tol
      } yield i
      if (cands.isEmpty) None
      else Some(cands.minBy(i => (dist(pieces(i).start, pt), i)))
    }
    val chains = Vector.newBuilder[Seq[BoundaryPiece]]
    pieces.indices.foreach { seed =>
      if (!used(seed)) {
        used(seed) = true
        val first = pieces(seed)
        val chain = scala.collection.mutable.ArrayBuffer(first)
        var cur = first
        while (dist(cur.end, first.start) > tol) {
          val idx = takeAt(cur.end).getOrElse(throw new
            IllegalArgumentException(
              "requirement failed: stitchMixedPieces: no piece starts " +
                "at a boundary vertex — tangency-degenerate input"))
          used(idx) = true
          cur = pieces(idx)
          chain += cur
        }
        chains += chain.toSeq
      }
    }
    def key(p: BoundaryPiece): (Int, Double, Double, Double, Double) =
      p match {
        case lp: LinePiece =>
          (if (lp.kind == "zone") 0 else 1, lp.x1, lp.y1, lp.x2, lp.y2)
        case rp: RingPiece => (2, rp.cx, rp.cy, rp.s, rp.e)
      }
    val ord = Ordering.Tuple5[Int, Double, Double, Double, Double]
    val rings = (closedSeq.map(Seq(_)) ++ chains.result()).map { ring =>
      val i = ring.indices.minBy(j => key(ring(j)))(ord)
      ring.drop(i) ++ ring.take(i)
    }
    rings.sortBy(ring => key(ring.head))(ord)
  }

  /** OUTPUT RINGS of ((general zone polygon − holes) − union of DISK
    * subtrahends) — the reference's LITERAL Erase shape (1500-ft disk
    * buffers erased from polygon high-risk zones,
    * GSheetsETL_Lab2.py:129-133) emitted as the feature class arcpy
    * produces: each closed boundary loop alternates straight pieces
    * (outer edges CCW / hole edges reversed) and circle arcs (CW),
    * joined at segment-circle and circle-circle intersection points.
    * With this kernel the RING-OUTPUT contract matches the AREA
    * contract on EVERY input cell ({circle, convex, concave-with-holes
    * zones} × {disk, polygon subtrahends}). GeoSpec pins closure,
    * orientation, Σ ring signed areas == [[erasedAreaPoly]] /
    * [[erasedAreaConcave]] (INDEPENDENT kernels — half-plane interval
    * algebra / triangulation), n-gon convergence to [[eraseRings]]'s
    * circle-zone areas, determinism, and the distributed replay.
    */
  private[graft] def eraseRingsPolyDisk(outer: Seq[(Double, Double)],
      holes: Seq[Seq[(Double, Double)]],
      disks: Seq[(Double, Double)], r: Double): Seq[Seq[BoundaryPiece]] =
    stitchMixedPieces(erasePolyDiskPieces(outer, holes, disks, r))

  /** One output row of the mixed-piece ring frame: line pieces carry
    * their endpoints and NULL arc columns; arc pieces carry traversal
    * endpoints (start/end of the CW traversal) plus center, radius,
    * and the CCW-parameter angle window in degrees. Shared by the
    * distributed stitch groups and the untouched-zone driver rows so
    * both paths emit identical encodings.
    */
  private def polyDiskRow(z: Int, ri: Long, pi: Long, p: BoundaryPiece,
      area: Double): (Int, Long, Long, String, Double, Double, Double,
        Double, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double], Double) = p match {
    case lp: LinePiece =>
      (z, ri, pi, lp.kind, lp.x1, lp.y1, lp.x2, lp.y2,
        None, None, None, None, None, area)
    case rp: RingPiece =>
      val (sx, sy) = rp.start; val (ex, ey) = rp.end
      (z, ri, pi, "arc", sx, sy, ex, ey, Some(rp.cx), Some(rp.cy),
        Some(rp.rho), Some(rp.s * 180.0 / math.Pi),
        Some(rp.e * 180.0 / math.Pi), area)
  }

  /** One cached frame per LAZY ring plan: the three ring queries
    * return frames that re-read their cached zone-assigned member
    * frame only when the CALLER executes them, so the plan cannot
    * unpersist before returning — but each invocation previously
    * cached a FRESH copy, and repeated bench iterations accumulated
    * cached frames until block-manager LRU pressure (r14 ADVICE #3).
    * Swapping through a one-slot registry unpersists the PREVIOUS
    * invocation's frame at entry, so steady-state residency is one
    * frame per plan. Unpersisting a frame a stale caller still holds
    * is safe (Spark recomputes lineage); blocking=false keeps entry
    * non-blocking.
    */
  private def swapPlanCache(
      slot: java.util.concurrent.atomic.AtomicReference[DataFrame],
      zf: DataFrame): Unit = {
    zf.cache()
    val prev = slot.getAndSet(zf)
    if (prev != null && (prev ne zf)) prev.unpersist(false)
  }
  private val polyDiskRingsCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val concaveSubRingsCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val polySubRingsCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** OUTPUT RINGS per GENERAL polygon zone under DISK subtrahends (see
    * [[eraseRingsPolyDisk]]) — the DISTRIBUTED plan, same shape as the
    * polygon-subtrahend ring plans: the per-piece interval work
    * distributes, only the stitch is zone-serial.
    *
    *   (a) outer-edge and hole-edge covered t-intervals stream from a
    *       flatMap over the zone-assigned disk frame (one row per
    *       (disk, edge) hit — interval endpoints, never geometry,
    *       shuffle here); the zone's edge catalogs ride task closures
    *       (bounded: the zone catalog is cluster-constant — SCALE.md);
    *   (b) each disk's surviving arcs come from a grid-cell neighbor
    *       self-join at cell size 2r (only disks within 2r can cover
    *       each other's circles — the [[boundaryDecomp]] bound), so
    *       per-disk work tracks LOCAL disk density, and
    *       [[diskArcPieces]]'s kept-arc merge makes the pieces
    *       IDENTICAL to the kernel's under the grid's candidate
    *       superset (non-coverers add nothing);
    *
    * then one `flatMapGroups` per zone chains that zone's pieces
    * (bounded by zone-local crossing count) and emits ring rows from
    * executors. Zones with no candidate disk emit their full outer CCW
    * + hole CW rings driver-side (bounded by the zone catalog).
    * Transcendental (atan2/acos/cos/sin) — rows-only by the erase
    * family's declared rule; GeoSpec pins the distributed == driver
    * replay and conservation against the independent area kernels.
    */
  def eraseRingsPolyDiskPerZone(spark: SparkSession, zones: DataFrame,
      buffers: DataFrame, bufferFt: Double): DataFrame = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"),
        col("vertices"), col("holes"))
      .as[(Int, Seq[(Double, Double)], Seq[Seq[(Double, Double)]])]
      .collect().toSeq
    val bound = zcat.map { case (z, vs, _) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      (z, cx, cy, rad)
    }.toDF("zone_id", "bcx", "bcy", "brad")
    // bounded catalogs ride task closures (the zEdgesMap convention)
    val zRingMap = zcat.map { case (z, vs, _) => z -> normalizeCcw(vs) }.toMap
    val zHolesMap = zcat.map { case (z, _, hs) =>
      z -> hs.map(normalizeCcw) }.toMap
    // zone-assigned deduped disk centers (dedup == the kernel's
    // distinct: identical circles would erase each other's boundary)
    val zb = buffers.select(col("x_ft"), col("y_ft"))
      .join(broadcast(bound),
        Geo.dist2(col("x_ft"), col("y_ft"), col("bcx"), col("bcy"))
          < (col("brad") + bufferFt) * (col("brad") + bufferFt))
      .select(col("zone_id").cast("int"),
        col("x_ft").as("ox"), col("y_ft").as("oy"))
      .dropDuplicates("zone_id", "ox", "oy")
    swapPlanCache(polyDiskRingsCache, zb)
    // tag 0 = outer-edge interval (ei, s, e); tag 1 = hole-edge
    // interval (hi, ei, s, e); tag 2 = arc piece (ox, oy, s, e);
    // tag 3 = seed (a zone whose disks all miss still emits rings);
    // row type (Int, Int, Int, Int, Double, Double, Double, Double)
    val ivRows = zb.as[(Int, Double, Double)].flatMap { case (z, ox, oy) =>
      val outer = zRingMap(z)
      val outerIv = outer.indices.flatMap { i =>
        val (ax, ay) = outer(i)
        val (bx, by) = outer((i + 1) % outer.size)
        val dx = bx - ax; val dy = by - ay
        segDiskCover(ax, ay, dx, dy, dx * dx + dy * dy, ox, oy, bufferFt)
          .map { case (s, e) => (z, 0, i, 0, s, e, 0.0, 0.0) }
      }
      val holeIv = zHolesMap(z).zipWithIndex.flatMap {
        case (h, hi) =>
          h.indices.flatMap { i =>
            val (cx, cy) = h(i)
            val (ex, ey) = h((i + 1) % h.size)
            val dx = ex - cx; val dy = ey - cy
            segDiskCover(cx, cy, dx, dy, dx * dx + dy * dy, ox, oy,
                bufferFt)
              .map { case (s, e) => (z, 1, hi, i, s, e, 0.0, 0.0) }
          }
      }
      outerIv ++ holeIv
    }
    // (b) per-disk arcs via the 2r grid-cell neighbor self-join: the
    // left side probes its 3×3 cell neighborhood, the right side sits
    // in its own cell, so each true neighbor pair matches exactly once
    val cell = 2 * bufferFt
    val l = zb
      .withColumn("dxc", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dyc", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("zone_id"), col("ox"), col("oy"),
        (floor(col("ox") / cell).cast("long") + col("dxc")).as("cx"),
        (floor(col("oy") / cell).cast("long") + col("dyc")).as("cy"))
    val rt = zb.select(col("zone_id").as("rz"), col("ox").as("rox"),
      col("oy").as("roy"),
      floor(col("ox") / cell).cast("long").as("rcx"),
      floor(col("oy") / cell).cast("long").as("rcy"))
    val arcRows = l.join(rt,
        col("zone_id") === col("rz") && col("cx") === col("rcx") &&
          col("cy") === col("rcy") &&
          !(col("ox") === col("rox") && col("oy") === col("roy")) &&
          Geo.dist2(col("ox"), col("oy"), col("rox"), col("roy"))
            < lit(4 * bufferFt * bufferFt),
        "left_outer")
      .select(col("zone_id"), col("ox"), col("oy"), col("rox"), col("roy"))
      .as[(Int, Double, Double, Option[Double], Option[Double])]
      .groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroups { (k: (Int, Double, Double),
          rows: Iterator[(Int, Double, Double, Option[Double],
            Option[Double])]) =>
        val (z, ox, oy) = k
        val neighbors = rows.flatMap(r =>
          r._4.zip(r._5)).toSeq.distinct
        diskArcPieces(zRingMap(z), zHolesMap(z), ox, oy, bufferFt,
            neighbors)
          .map(p => (z, 2, 0, 0, p.s, p.e, ox, oy))
      }
    val seedRows = zb.select(col("zone_id")).distinct().as[Int]
      .map(z => (z, 3, 0, 0, 0.0, 0.0, 0.0, 0.0))
    val stitched = ivRows.union(arcRows).union(seedRows)
      .groupByKey(_._1)
      .flatMapGroups { (z: Int,
          rowsIt: Iterator[(Int, Int, Int, Int, Double, Double, Double,
            Double)]) =>
        val rs = rowsIt.toSeq
        val outer = zRingMap(z)
        val outerIv = rs.filter(_._2 == 0).groupBy(_._3)
          .map { case (ei, ivs) =>
            ei -> mergeIntervals(ivs.map(r => (r._5, r._6))) }
        val zonePieces: Seq[BoundaryPiece] =
          outer.indices.flatMap { ei =>
            val (ax, ay) = outer(ei)
            val (bx, by) = outer((ei + 1) % outer.size)
            zoneEdgePieces(ax, ay, bx, by, outerIv.getOrElse(ei, Nil))
          }
        val holeIv = rs.filter(_._2 == 1).groupBy(r => (r._3, r._4))
          .map { case (k, ivs) =>
            k -> mergeIntervals(ivs.map(r => (r._5, r._6))) }
        val holePieces: Seq[BoundaryPiece] =
          zHolesMap(z).zipWithIndex.flatMap { case (h, hi) =>
            h.indices.flatMap { ei =>
              val (cx, cy) = h(ei)
              val (ex, ey) = h((ei + 1) % h.size)
              reversedEdgePieces(cx, cy, ex, ey,
                holeIv.getOrElse((hi, ei), Nil))
            }
          }
        val arcPieces: Seq[BoundaryPiece] = rs.filter(_._2 == 2)
          .map(r => RingPiece(ccw = false, r._7, r._8, bufferFt,
            r._5, r._6))
        stitchMixedPieces(zonePieces ++ holePieces ++ arcPieces)
          .zipWithIndex.flatMap { case (ring, ri) =>
            val area = ring.map(_.signedArea).sum
            ring.zipWithIndex.map { case (p, pi) =>
              polyDiskRow(z, ri.toLong, pi.toLong, p, area)
            }
          }
      }
      .toDF("zone_id", "ring_id", "piece_seq", "kind",
        "x1_ft", "y1_ft", "x2_ft", "y2_ft", "cx_ft", "cy_ft", "rho_ft",
        "start_deg", "end_deg", "ring_area_sqft")
    // zones with NO candidate disk: full outer CCW + hole CW rings via
    // the driver kernel (bounded catalog); zb stays cached past return
    // — the stitched path is lazy, residency bounded by swapPlanCache
    // (the eraseRingsPolySubPerZone convention)
    val touched = zb.select(col("zone_id")).distinct()
      .as[Int].collect().toSet
    val untouched = zcat.filter(zc => !touched(zc._1))
      .sortBy(_._1).flatMap { case (z, vs, hs) =>
        eraseRingsPolyDisk(vs, hs, Seq.empty, bufferFt).zipWithIndex
          .flatMap { case (ring, ri) =>
            val area = ring.map(_.signedArea).sum
            ring.zipWithIndex.map { case (p, pi) =>
              polyDiskRow(z, ri.toLong, pi.toLong, p, area)
            }
          }
      }
    stitched.union(untouched.toDF("zone_id", "ring_id", "piece_seq",
      "kind", "x1_ft", "y1_ft", "x2_ft", "y2_ft", "cx_ft", "cy_ft",
      "rho_ft", "start_deg", "end_deg", "ring_area_sqft"))
  }

  /** Surviving area per GENERAL (concave, with holes) polygon zone
    * under POLYGON subtrahends — the DISTRIBUTED plan, closing the
    * last Erase input-domain cell ({concave zones} × {polygon erase
    * features}; arcpy's Erase accepts any feature-class pair,
    * reference GSheetsETL_Lab2.py:133). Distribution is at TRIANGLE
    * granularity, finer than [[eraseAreaConcave]]'s per-zone groups:
    * ear-clip each zone's outer and hole rings driver-side (the zone
    * catalog is cluster-constant — SCALE.md), broadcast the triangle
    * bounding circles, assign canonical deduped footprints to the
    * triangles they can touch, and evaluate the CONVEX kernel
    * ([[erasedAreaPolySub]]) independently per (zone, triangle) group
    * — so a zone whose footprint over-coverage would serialize one
    * task (the r12 sf10 lesson on the convex per-zone plan, 262 s)
    * splits across its ~12 triangles, each group bounded by the
    * TRIANGLE's local footprint density. Per-triangle areas are a
    * bounded catalog (zones × triangles rows — never footprints), so
    * the driver combine Σ sign·tri (outer +, holes −, floor 0) is the
    * same collect class as the zone catalog itself. Exactness: the
    * triangles PARTITION each ring ([[triangulate]]), areas add; a
    * footprint outside a triangle's candidate circle contributes
    * exactly 0.0 to it, so candidate pruning is lossless up to float
    * re-association (GeoSpec pins the distributed == replay parity).
    */
  def eraseAreaConcaveSub(spark: SparkSession, zones: DataFrame,
      subs: DataFrame): DataFrame = {
    import spark.implicits._
    def shoelace(vs: Seq[(Double, Double)]): Double =
      math.abs(vs.indices.map { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
        x1 * y2 - x2 * y1
      }.sum) / 2
    val zcat = zones.select(col("zone_id").cast("int"),
        col("vertices"), col("holes"))
      .as[(Int, Seq[(Double, Double)], Seq[Seq[(Double, Double)]])]
      .collect().toSeq
    // triangle catalog: (zone, tri_id, sign, vertices) — outer-ring
    // triangles count +, hole-ring triangles count − (holes ⊆ outer
    // and pairwise disjoint: the erasedAreaConcaveSub identity)
    val tcat: Seq[(Int, Int, Int, Seq[(Double, Double)])] =
      zcat.flatMap { case (z, vs, hs) =>
        (triangulate(vs).map(t => (1, t)) ++
          hs.flatMap(h => triangulate(h).map(t => (-1, t))))
          .zipWithIndex.map { case ((sgn, t), i) => (z, i, sgn, t) }
      }
    val bound = tcat.map { case (z, i, _, t) =>
      val cx = t.map(_._1).sum / t.size
      val cy = t.map(_._2).sum / t.size
      val rad = t.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      (z, i, cx, cy, rad)
    }.toDF("zone_id", "tri_id", "bcx", "bcy", "brad")
    // triangle vertices ride task closures (bounded: zones × ~12 tris
    // of 3 vertices — the zEdgesMap convention)
    val tris = tcat.map { case (z, i, _, t) => (z, i) -> t }.toMap
    val footCanon = subs.select(col("vertices"))
      .as[Seq[(Double, Double)]].map(canonicalRing(_)).toDF("vertices")
    val xs = transform(col("vertices"), v => v.getField("_1"))
    val ys = transform(col("vertices"), v => v.getField("_2"))
    val foot = footCanon.dropDuplicates("vertices")
      .select(col("vertices"),
        ((array_min(xs) + array_max(xs)) / 2).as("sx"),
        ((array_min(ys) + array_max(ys)) / 2).as("sy"),
        (sqrt(Geo.dist2(array_min(xs), array_min(ys),
          array_max(xs), array_max(ys))) / 2).as("sr"))
    val pairs = foot
      .join(broadcast(bound),
        Geo.dist2(col("sx"), col("sy"), col("bcx"), col("bcy"))
          < (col("brad") + col("sr")) * (col("brad") + col("sr")))
      .select(col("zone_id").cast("int"), col("tri_id").cast("int"),
        col("vertices"))
      .as[(Int, Int, Seq[(Double, Double)])]
    val touched = pairs.groupByKey(r => (r._1, r._2))
      .mapGroups { (k: (Int, Int),
          rows: Iterator[(Int, Int, Seq[(Double, Double)])]) =>
        (k._1, k._2, erasedAreaPolySub(tris(k), rows.map(_._3).toSeq))
      }
      .collect() // bounded: zones × triangles, areas only
      .map(r => (r._1, r._2) -> r._3).toMap
    val byZone = tcat.groupBy(_._1)
    val all = zcat.sortBy(_._1).map { case (z, _, _) =>
      val s = byZone(z).map { case (_, i, sgn, t) =>
        sgn * touched.getOrElse((z, i), shoelace(t))
      }.sum
      (z, math.max(0.0, s))
    }
    all.toDF("zone_id", "area_sqft")
  }

  /** OUTPUT RINGS per GENERAL (concave, with holes) zone under POLYGON
    * subtrahends (see [[eraseRingsConcaveSub]]) — the DISTRIBUTED
    * plan. Same shape as [[eraseRingsPolySubPerZone]], with the zone's
    * HOLE rings injected as member rows of the zone-assigned frame
    * (holes and subtrahends are the same thing to the boundary
    * algebra), the convex edge catalog replaced by the general CCW
    * outer-ring edges, and the member clip running through
    * [[memberEdgePieces]] (segment-in-polygon intervals — no
    * convexity). The expensive per-piece interval work distributes:
    * (a) outer-edge coverage intervals stream from a flatMap over the
    * member frame; (b) each member's surviving pieces come from the
    * shared grid-cell neighbor self-join, bounded by local overlap
    * density. Only the stitch is zone-serial (bounded by zone-local
    * crossing count). Rows-only by the family's declared rule; GeoSpec
    * pins the distributed == driver-replay parity and conservation
    * against the triangulation area kernel.
    */
  def eraseRingsConcaveSubPerZone(spark: SparkSession, zones: DataFrame,
      subs: DataFrame): DataFrame = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"),
        col("vertices"), col("holes"))
      .as[(Int, Seq[(Double, Double)], Seq[Seq[(Double, Double)]])]
      .collect().toSeq
    val bound = zcat.map { case (z, vs, _) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      (z, cx, cy, rad)
    }.toDF("zone_id", "bcx", "bcy", "brad")
    // bounded catalogs ride task closures (the zEdgesMap convention)
    val zRingMap = zcat.map { case (z, vs, _) => z -> normalizeCcw(vs) }.toMap
    val zEdgesMap = zRingMap.map { case (z, ring) =>
      z -> ring.indices.map(i =>
        (ring(i), ring((i + 1) % ring.size))).toIndexedSeq
    }
    val zHolesMap = zcat.map { case (z, _, hs) =>
      z -> hs.map(canonicalRing) }.toMap
    val footCanon = subs.select(col("vertices"))
      .as[Seq[(Double, Double)]].map(canonicalRing(_)).toDF("vertices")
    val xs = transform(col("vertices"), v => v.getField("_1"))
    val ys = transform(col("vertices"), v => v.getField("_2"))
    val foot = footCanon.dropDuplicates("vertices")
      .select(col("vertices"),
        array_min(xs).as("x0"), array_min(ys).as("y0"),
        array_max(xs).as("x1"), array_max(ys).as("y1"))
    val scx = (col("x0") + col("x1")) / 2
    val scy = (col("y0") + col("y1")) / 2
    val srad = sqrt(Geo.dist2(col("x0"), col("y0"), col("x1"), col("y1"))) / 2
    val zfFoot = foot
      .join(broadcast(bound),
        Geo.dist2(scx, scy, col("bcx"), col("bcy"))
          < (col("brad") + srad) * (col("brad") + srad))
      .select(col("zone_id").cast("int"), col("vertices"),
        col("x0"), col("y0"), col("x1"), col("y1"))
    // hole member rows: driver rows, bounded by the zone catalog
    val holeRows = zcat.flatMap { case (z, _, hs) =>
      hs.map { h0 =>
        val h = canonicalRing(h0)
        (z, h, h.map(_._1).min, h.map(_._2).min,
          h.map(_._1).max, h.map(_._2).max)
      }
    }
    // per-zone member SET: an exact duplicate (a footprint coinciding
    // with a hole) must erase once, not twice — two identical members
    // would each see the other covering all their edges and the union
    // boundary would vanish (the canonicalRing pitfall)
    val zf = zfFoot
      .union(holeRows.toDF("zone_id", "vertices", "x0", "y0", "x1", "y1"))
      .dropDuplicates("zone_id", "vertices")
    swapPlanCache(concaveSubRingsCache, zf)
    val cellSz = math.max(1.0, Option(zf
      .agg(max(greatest(col("x1") - col("x0"), col("y1") - col("y0"))))
      .head().get(0)).map(_.asInstanceOf[Double]).getOrElse(1.0))
    // tag 0 = outer-edge coverage interval; tag 1 = member piece;
    // tag 2 = seed (a zone whose members all miss still emits rings)
    val aRows = zf.select(col("zone_id"), col("vertices"))
      .as[(Int, Seq[(Double, Double)])]
      .flatMap { case (z, member) =>
        zEdgesMap(z).zipWithIndex.flatMap {
          case (((ax, ay), (bx, by)), ei) =>
            segInPolyIntervals(ax, ay, bx, by, member)
              .map { case (s, e) => (z, 0, ei, s, e, 0.0, 0.0) }
        }
      }
    val bRows = polySubNeighborGroups(spark, zf, cellSz)
      .flatMapGroups { (key: (Int, Seq[(Double, Double)]),
          rows: Iterator[(Int, Seq[(Double, Double)],
            Option[Seq[(Double, Double)]])]) =>
        val neighbors = rows.flatMap(_._3).toSeq.distinct
        memberEdgePieces(zRingMap(key._1), key._2, _ => neighbors)
          .map(p => (key._1, 1, -1, p.x1, p.y1, p.x2, p.y2))
      }
    val seedRows = zf.select(col("zone_id")).distinct().as[Int]
      .map(z => (z, 2, 0, 0.0, 0.0, 0.0, 0.0))
    val stitched = aRows.union(bRows).union(seedRows)
      .groupByKey(_._1)
      .flatMapGroups { (z: Int,
          rows: Iterator[(Int, Int, Int, Double, Double, Double, Double)]) =>
        val rs = rows.toSeq
        val ivByEdge = rs.filter(_._2 == 0).groupBy(_._3)
          .map { case (ei, ivs) =>
            ei -> mergeIntervals(ivs.map(r => (r._4, r._5))) }
        val zonePieces = zEdgesMap(z).zipWithIndex.flatMap {
          case (((ax, ay), (bx, by)), ei) =>
            zoneEdgePieces(ax, ay, bx, by, ivByEdge.getOrElse(ei, Nil))
        }
        val memberPieces = rs.filter(_._2 == 1)
          .map(r => LinePiece("sub", r._4, r._5, r._6, r._7))
        stitchLinePieces(zonePieces ++ memberPieces).zipWithIndex
          .flatMap { case (ring, ri) =>
            val area = ring.map(_.signedArea).sum
            ring.zipWithIndex.map { case (p, pi) =>
              (z, ri.toLong, pi.toLong, p.kind,
                p.x1, p.y1, p.x2, p.y2, area)
            }
          }
      }
      .toDF("zone_id", "ring_id", "piece_seq", "kind",
        "x1_ft", "y1_ft", "x2_ft", "y2_ft", "ring_area_sqft")
    // zones with NO member at all (no holes, no candidate footprint):
    // full CCW outer ring via the driver kernel (bounded catalog);
    // zf stays cached past return — the stitched path is lazy, and
    // swapPlanCache bounds residency to one frame per plan (see
    // eraseRingsPolySubPerZone)
    val touched = zf.select(col("zone_id")).distinct()
      .as[Int].collect().toSet
    val untouched = zcat.filter(zc => !touched(zc._1))
      .sortBy(_._1).flatMap { case (z, vs, hs) =>
        eraseRingsConcaveSub(vs, hs, Seq.empty).zipWithIndex.flatMap {
          case (ring, ri) =>
            val area = ring.map(_.signedArea).sum
            ring.zipWithIndex.map { case (p, pi) =>
              (z, ri.toLong, pi.toLong, p.kind,
                p.x1, p.y1, p.x2, p.y2, area)
            }
        }
      }
    stitched.union(untouched.toDF("zone_id", "ring_id", "piece_seq",
      "kind", "x1_ft", "y1_ft", "x2_ft", "y2_ft", "ring_area_sqft"))
  }

  /** Surviving area per CONVEX polygon zone under POLYGON subtrahends
    * (see [[erasedAreaPolySub]]) — the DISTRIBUTED plan. A first cut
    * ran the whole JVM kernel per zone inside `mapGroups`; at sf10 the
    * generator's opt-out density gives ~30× footprint over-coverage
    * per zone and that single task serialized ~10⁴ footprints' pairwise
    * interval work (measured 262 s). The area decomposes exactly into
    * per-piece terms, so the plan now distributes them:
    *
    *   (a) per (zone, zone-edge): covered t-intervals are produced by a
    *       flatMap over the zone-assigned footprint frame (one row per
    *       footprint), merged per edge in a 4-groups-per-zone
    *       mapGroups — interval endpoints, never rings, shuffle here;
    *   (b) per (zone, footprint): the footprint's reversed-Green
    *       contribution needs only its bbox-overlapping NEIGHBORS — a
    *       grid-cell self-join of the zone-assigned frame (cell = the
    *       largest footprint bbox extent, one tiny agg job) bounds the
    *       group to local overlap density, and every (zone, footprint)
    *       group computes independently across the cluster.
    *
    * A footprint covering part of another's edge inside the zone has
    * interior points in the zone, so it is in the zone's touch set —
    * the zone-local self-join sees every true coverer (non-coverers in
    * the bbox superset contribute empty interval lists; the merged
    * result is identical to the kernel's). Per-piece arithmetic is the
    * kernel's own ([[subContribution]]/[[zoneEdgeGreen]], shared code);
    * only float summation ORDER across footprints differs, and GeoSpec
    * pins the wrapper against a driver-side kernel replay at 1e-9
    * relative. Duplicate rings are dropped before the join (duplicates
    * erase once — same load-bearing distinct as the kernel). Zones
    * with no candidate footprint keep the exact shoelace area.
    */
  /** Shared distributed frames of the polygon-subtrahend family
    * ([[eraseAreaPolySub]] / [[eraseRingsPolySubPerZone]]): the
    * driver-bounded zone catalog + per-zone edge map, and the
    * zone-assigned CANONICAL footprint frame `zf` (CCW +
    * rotation-normalized rings, [[canonicalRing]] — so dropDuplicates
    * also catches re-wound / rotated copies of the same polygon), with
    * bbox columns and the grid cell size (= the largest footprint bbox
    * extent, one tiny agg job). The ring array is its own key
    * downstream (r12 ADVICE: a 64-bit hash pk collision would have
    * collapsed two rings' groups, silently dropping one ring's
    * boundary contribution).
    */
  private case class PolySubFrames(
      zcat: Seq[(Int, Seq[(Double, Double)])],
      zEdgesMap: Map[Int, IndexedSeq[((Double, Double), (Double, Double))]],
      zf: DataFrame, cellSz: Double)

  private def polySubFrames(spark: SparkSession, zones: DataFrame,
      subs: DataFrame): PolySubFrames = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"), col("vertices"))
      .as[(Int, Seq[(Double, Double)])]
      .collect().toSeq
    val bound = zcat.map { case (z, vs) =>
      val cx = vs.map(_._1).sum / vs.size
      val cy = vs.map(_._2).sum / vs.size
      val rad = vs.map { case (x, y) => math.hypot(x - cx, y - cy) }.max
      (z, cx, cy, rad)
    }.toDF("zone_id", "bcx", "bcy", "brad")
    // zone edges (bounded catalog) ride task closures
    val zEdgesMap = zcat.map { case (z, vs) => z -> convexZoneEdges(vs) }.toMap
    val footCanon = subs.select(col("vertices"))
      .as[Seq[(Double, Double)]].map(canonicalRing(_)).toDF("vertices")
    val xs = transform(col("vertices"), v => v.getField("_1"))
    val ys = transform(col("vertices"), v => v.getField("_2"))
    val foot = footCanon.dropDuplicates("vertices")
      .select(col("vertices"),
        array_min(xs).as("x0"), array_min(ys).as("y0"),
        array_max(xs).as("x1"), array_max(ys).as("y1"))
    val cellSz = math.max(1.0, Option(foot
      .agg(max(greatest(col("x1") - col("x0"), col("y1") - col("y0"))))
      .head().get(0)).map(_.asInstanceOf[Double]).getOrElse(1.0))
    // assign footprints to the zones they can touch
    val scx = (col("x0") + col("x1")) / 2
    val scy = (col("y0") + col("y1")) / 2
    val srad = sqrt(Geo.dist2(col("x0"), col("y0"), col("x1"), col("y1"))) / 2
    val zf = foot
      .join(broadcast(bound),
        Geo.dist2(scx, scy, col("bcx"), col("bcy"))
          < (col("brad") + srad) * (col("brad") + srad))
      .select(col("zone_id").cast("int"), col("vertices"),
        col("x0"), col("y0"), col("x1"), col("y1"))
    PolySubFrames(zcat, zEdgesMap, zf, cellSz)
  }

  /** The grid-cell self-join of the zone-assigned footprint frame,
    * grouped per (zone, footprint): each group carries the footprint's
    * bbox-overlapping NEIGHBORS (distinct — the cell explode can
    * deliver a neighbor once per shared cell; left_outer keeps
    * neighbor-free footprints). Self-pair exclusion and grouping both
    * key on the canonical ring ITSELF — exact, no hash-collision
    * failure mode. Shared by the area and ring paths.
    */
  private def polySubNeighborGroups(spark: SparkSession, zf: DataFrame,
      cellSz: Double): org.apache.spark.sql.KeyValueGroupedDataset[
        (Int, Seq[(Double, Double)]),
        (Int, Seq[(Double, Double)], Option[Seq[(Double, Double)]])] = {
    import spark.implicits._
    def withCells(df: DataFrame): DataFrame = df
      .withColumn("cx", explode(sequence(
        floor(col("x0") / cellSz), floor(col("x1") / cellSz))))
      .withColumn("cy", explode(sequence(
        floor(col("y0") / cellSz), floor(col("y1") / cellSz))))
    val left = withCells(zf)
    val right = withCells(zf).select(col("zone_id").as("rz"),
      col("vertices").as("rvertices"),
      col("x0").as("rx0"), col("y0").as("ry0"),
      col("x1").as("rx1"), col("y1").as("ry1"),
      col("cx").as("rcx"), col("cy").as("rcy"))
    left.join(right,
        col("zone_id") === col("rz") && col("cx") === col("rcx") &&
          col("cy") === col("rcy") &&
          col("vertices") =!= col("rvertices") &&
          col("rx0") <= col("x1") && col("x0") <= col("rx1") &&
          col("ry0") <= col("y1") && col("y0") <= col("ry1"),
        "left_outer")
      .select(col("zone_id"), col("vertices"), col("rvertices"))
      .as[(Int, Seq[(Double, Double)], Option[Seq[(Double, Double)]])]
      .groupByKey(r => (r._1, r._2))
  }

  def eraseAreaPolySub(spark: SparkSession, zones: DataFrame,
      subs: DataFrame): DataFrame = {
    import spark.implicits._
    def shoelace(vs: Seq[(Double, Double)]): Double =
      math.abs(vs.indices.map { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
        x1 * y2 - x2 * y1
      }.sum) / 2
    val frames = polySubFrames(spark, zones, subs)
    val zcat = frames.zcat
    val zEdgesMap = frames.zEdgesMap
    val cellSz = frames.cellSz
    val zf = frames.zf
    zf.cache()
    // ---- (a) zone-edge coverage intervals, merged per (zone, edge) --
    val aEdge = zf.select(col("zone_id"), col("vertices"))
      .as[(Int, Seq[(Double, Double)])]
      .flatMap { case (z, ringIn) =>
        val ring = normalizeCcw(ringIn)
        zEdgesMap(z).zipWithIndex.flatMap {
          case (((ax, ay), (bx, by)), ei) =>
            segInPolyIntervals(ax, ay, bx, by, ring)
              .map { case (s, e) => (z, ei, s, e) }
        }
      }
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int), rows: Iterator[(Int, Int, Double, Double)]) =>
        val (z, ei) = key
        val ((ax, ay), (bx, by)) = zEdgesMap(z)(ei)
        (z, ei, zoneEdgeGreen(ax, ay, bx, by,
          mergeIntervals(rows.map(r => (r._3, r._4)).toSeq)))
      }
      .collect() // bounded: zones × edges
    // keyed on the zones with ANY candidate footprint (a zone whose
    // footprints are strictly interior yields no (a) intervals but
    // still has (b) holes); untouched edges keep their full Green term
    val touchedZones = zf.select(col("zone_id")).distinct()
      .as[Int].collect()
    val aEdgeGot = aEdge.map(r => (r._1, r._2) -> r._3).toMap
    val aByZone = touchedZones.map { z =>
      z -> zEdgesMap(z).zipWithIndex.map { case (((ax, ay), (bx, by)), ei) =>
        aEdgeGot.getOrElse((z, ei), zoneEdgeGreen(ax, ay, bx, by, Nil))
      }.sum
    }.toMap
    // ---- (b) per-footprint contributions via a grid-cell self-join --
    val bRows = polySubNeighborGroups(spark, zf, cellSz)
      .mapGroups { (key: (Int, Seq[(Double, Double)]),
          rows: Iterator[(Int, Seq[(Double, Double)],
            Option[Seq[(Double, Double)]])]) =>
        // rings arrive canonical (CCW) from the footprint frame
        // the cell explode can deliver a neighbor once per shared cell
        val neighbors = rows.flatMap(_._3).toSeq.distinct
        (key._1, subContribution(zEdgesMap(key._1), key._2, _ => neighbors))
      }
      .groupByKey(_._1)
      .mapGroups((z: Int, rows: Iterator[(Int, Double)]) =>
        (z, rows.map(_._2).sum))
      .collect().toMap
    zf.unpersist()
    val all = zcat.sortBy(_._1).map { case (z, vs) =>
      aByZone.get(z) match {
        case Some(aPart) =>
          (z, math.max(0.0, aPart + bRows.getOrElse(z, 0.0)))
        case None => (z, shoelace(vs))
      }
    }
    all.toDF("zone_id", "area_sqft")
  }

  /** OUTPUT RINGS per zone under POLYGON subtrahends (see
    * [[eraseRingsPolySub]]) — the DISTRIBUTED plan, closing the one
    * asymmetry the r12 verdict named (disk subtrahends emit rings via
    * [[eraseRingsPerZone]]; polygon subtrahends emitted only area +
    * selection). Same shape as [[eraseAreaPolySub]]: the expensive
    * per-piece interval work distributes —
    *
    *   (a) zone-edge coverage intervals stream from a flatMap over the
    *       zone-assigned footprint frame (interval endpoints, never
    *       rings, shuffle here);
    *   (b) each footprint's surviving edge pieces come from the shared
    *       grid-cell neighbor self-join ([[polySubNeighborGroups]]),
    *       bounded by local overlap density;
    *
    * and only the STITCH is zone-serial: one `flatMapGroups` per zone
    * chains that zone's pieces (bounded by zone-local crossing count,
    * not the corpus) and emits ring rows directly from executors — no
    * driver collect on the data path (the zone catalog and the
    * touched-zone id set are the only bounded collects). Interval
    * merge values are order-independent (sorted merge, float `max`),
    * and every piece's endpoint arithmetic is the kernel's own
    * ([[zoneEdgePieces]]/[[subEdgePieces]], shared code), so the
    * distributed output equals a driver-side [[eraseRingsPolySub]]
    * replay exactly up to float re-association — GeoSpec pins it.
    * Zones with no candidate footprint emit their full CCW ring.
    * Transcendental-free but SQL-inexpressible (the clipping/stitching
    * algorithm) — rows-only by the family's declared rule; GeoSpec
    * pins closure, orientation, and Σ ring areas == erasedAreaPolySub.
    */
  def eraseRingsPolySubPerZone(spark: SparkSession, zones: DataFrame,
      subs: DataFrame): DataFrame = {
    import spark.implicits._
    val frames = polySubFrames(spark, zones, subs)
    val zEdgesMap = frames.zEdgesMap
    val zf = frames.zf
    swapPlanCache(polySubRingsCache, zf)
    // tagged per-zone rows: tag 0 = (a) zone-edge coverage interval
    // (ei, s, e); tag 1 = (b) surviving footprint piece (x1,y1,x2,y2)
    val aRows = zf.select(col("zone_id"), col("vertices"))
      .as[(Int, Seq[(Double, Double)])]
      .flatMap { case (z, ringIn) =>
        val ring = normalizeCcw(ringIn)
        zEdgesMap(z).zipWithIndex.flatMap {
          case (((ax, ay), (bx, by)), ei) =>
            segInPolyIntervals(ax, ay, bx, by, ring)
              .map { case (s, e) => (z, 0, ei, s, e, 0.0, 0.0) }
        }
      }
    val bRows = polySubNeighborGroups(spark, zf, frames.cellSz)
      .flatMapGroups { (key: (Int, Seq[(Double, Double)]),
          rows: Iterator[(Int, Seq[(Double, Double)],
            Option[Seq[(Double, Double)]])]) =>
        val neighbors = rows.flatMap(_._3).toSeq.distinct
        subEdgePieces(zEdgesMap(key._1), key._2, _ => neighbors)
          .map(p => (key._1, 1, -1, p.x1, p.y1, p.x2, p.y2))
      }
    // tag 2 = touched-zone seed: a zone whose candidate footprints all
    // miss the convex ring yields no (a)/(b) rows but must still emit
    // its full ring — the seed forces its stitch group to exist
    val seedRows = zf.select(col("zone_id")).distinct().as[Int]
      .map(z => (z, 2, 0, 0.0, 0.0, 0.0, 0.0))
    val stitched = aRows.union(bRows).union(seedRows)
      .groupByKey(_._1)
      .flatMapGroups { (z: Int,
          rows: Iterator[(Int, Int, Int, Double, Double, Double, Double)]) =>
        val rs = rows.toSeq
        val ivByEdge = rs.filter(_._2 == 0).groupBy(_._3)
          .map { case (ei, ivs) =>
            ei -> mergeIntervals(ivs.map(r => (r._4, r._5))) }
        // untouched / partially-covered zone edges keep their full or
        // surviving pieces; fully-covered edges yield none
        val zonePieces = zEdgesMap(z).zipWithIndex.flatMap {
          case (((ax, ay), (bx, by)), ei) =>
            zoneEdgePieces(ax, ay, bx, by, ivByEdge.getOrElse(ei, Nil))
        }
        val subPieces = rs.filter(_._2 == 1)
          .map(r => LinePiece("sub", r._4, r._5, r._6, r._7))
        stitchLinePieces(zonePieces ++ subPieces).zipWithIndex
          .flatMap { case (ring, ri) =>
            val area = ring.map(_.signedArea).sum
            ring.zipWithIndex.map { case (p, pi) =>
              (z, ri.toLong, pi.toLong, p.kind,
                p.x1, p.y1, p.x2, p.y2, area)
            }
          }
      }
      .toDF("zone_id", "ring_id", "piece_seq", "kind",
        "x1_ft", "y1_ft", "x2_ft", "y2_ft", "ring_area_sqft")
    // zones with no candidate footprint: full CCW ring (driver rows —
    // bounded by the zone catalog, same convention as eraseAreaPolySub)
    val touched = zf.select(col("zone_id")).distinct()
      .as[Int].collect().toSet
    // zf stays CACHED past return: unlike eraseAreaPolySub (which
    // collects every result before unpersisting), this data path is
    // LAZY — the returned frame re-reads zf (aRows, both self-join
    // sides, seedRows) only when the CALLER executes it, so an
    // unpersist here would evict the cache before its real consumers
    // run and recompute zf's canonicalize + dedup shuffle +
    // zone-assignment join ~4×. Steady-state residency is bounded by
    // swapPlanCache (one frame per plan — the previous invocation's
    // frame unpersists at entry).
    val untouched = frames.zcat.filter(z => !touched(z._1))
      .sortBy(_._1).flatMap { case (z, vs) =>
        eraseRingsPolySub(vs, Seq.empty).zipWithIndex.flatMap {
          case (ring, ri) =>
            val area = ring.map(_.signedArea).sum
            ring.zipWithIndex.map { case (p, pi) =>
              (z, ri.toLong, pi.toLong, p.kind,
                p.x1, p.y1, p.x2, p.y2, area)
            }
        }
      }
    stitched.union(untouched.toDF("zone_id", "ring_id", "piece_seq",
      "kind", "x1_ft", "y1_ft", "x2_ft", "y2_ft", "ring_area_sqft"))
  }

  /** One directed boundary piece of an erased-zone output ring
    * (coordinates RELATIVE to the zone center): a circular arc of the
    * circle centered (cx, cy) radius rho over the CCW-parameterized
    * interval [s, e]. Zone pieces (`ccw`) are traversed s → e (region
    * on the left); buffer hole pieces (!ccw) are traversed e → s — the
    * CW hole side. `s == 0 && e == 2π` is a closed full-circle ring.
    */
  private[graft] case class RingPiece(ccw: Boolean, cx: Double,
      cy: Double, rho: Double, s: Double, e: Double) extends BoundaryPiece {
    private def at(a: Double): (Double, Double) =
      (cx + rho * math.cos(a), cy + rho * math.sin(a))
    def start: (Double, Double) = if (ccw) at(s) else at(e)
    def end: (Double, Double) = if (ccw) at(e) else at(s)
    def isFullCircle: Boolean = s == 0.0 && e == 2 * math.Pi
    /** Green's-theorem contribution along the TRAVERSAL direction. */
    def signedArea: Double = {
      val c = arcContrib(cx, cy, rho, s, e)
      if (ccw) c else -c
    }
  }

  /** OUTPUT RINGS of (zone disk − union of buffer disks) — the feature
    * class arcpy's Erase actually emits (reference GSheetsETL_Lab2
    * .py:133), stitched from the same boundary pieces the area kernel
    * integrates ([[boundaryDecomp]]): each connected boundary loop
    * alternates zone arcs (CCW) and buffer hole arcs (CW) joined at
    * circle-circle intersection points; a full untouched circle (zone
    * or strictly-interior buffer) closes alone. Stitching is endpoint
    * matching: at every intersection point exactly one piece starts
    * where another ends, so following end → start until closure
    * reconstructs each loop; the match tolerance is 1e-6·(R+r) against
    * endpoints that agree to IEEE rounding (the same point computed
    * through two trig paths), and the chain FAILS loudly if no piece
    * continues (would mean a non-manifold boundary — tangency-
    * degenerate input). Rings and their starting pieces are rotated /
    * ordered by a canonical key so output is deterministic regardless
    * of buffer arrival order. Orientation falls out of construction:
    * loops enclosing surviving area run CCW (signed area > 0), hole
    * loops run CW (< 0), and Σ signed areas == [[erasedArea]] exactly
    * (same arcContrib terms, same grouping).
    */
  private[graft] def eraseRings(bigR: Double,
      buffersIn: Seq[(Double, Double)], r: Double)
      : Seq[Seq[RingPiece]] = {
    val (zoneArcs, bufferArcs) = boundaryDecomp(bigR, buffersIn, r)
    val pieces =
      zoneArcs.map { case (s, e) =>
        RingPiece(ccw = true, 0.0, 0.0, bigR, s, e) } ++
      bufferArcs.flatMap { case ((ox, oy), arcs) =>
        arcs.map { case (s, e) =>
          RingPiece(ccw = false, ox, oy, r, s, e) } }
    val (closed, openSeq) = pieces.partition(_.isFullCircle)
    // indexed: the stitcher addresses pieces by position (see byStart)
    val open = openSeq.toIndexedSeq
    val tol = 1e-6 * (bigR + r)
    def dist(a: (Double, Double), b: (Double, Double)): Double =
      math.hypot(a._1 - b._1, a._2 - b._2)
    // endpoint matching via a start-point hash grid (cell 4·tol, 3×3
    // probe) instead of a nearest-scan over every remaining piece —
    // the scan made stitching O(pieces²) per zone and dominated the
    // sf10 line. A manifold boundary has exactly ONE piece starting at
    // each intersection point, so the ≤ tol candidate is unique and
    // the result is identical to the global nearest-scan; ties beyond
    // that would be tangency-degenerate input, which still fails
    // loudly below. Chain seeds keep the original piece order.
    val hcell = 4 * tol
    def hkey(p: (Double, Double)): (Long, Long) =
      (math.floor(p._1 / hcell).toLong, math.floor(p._2 / hcell).toLong)
    val byStart = scala.collection.mutable.HashMap
      .empty[(Long, Long), List[Int]]
    open.zipWithIndex.foreach { case (p, i) =>
      val k = hkey(p.start)
      byStart(k) = i :: byStart.getOrElse(k, Nil)
    }
    val used = Array.fill(open.size)(false)
    def takeAt(pt: (Double, Double)): Option[Int] = {
      val (ki, kj) = hkey(pt)
      val cands = for {
        dx <- -1L to 1L; dy <- -1L to 1L
        i <- byStart.getOrElse((ki + dx, kj + dy), Nil)
        if !used(i) && dist(open(i).start, pt) <= tol
      } yield i
      if (cands.isEmpty) None
      else Some(cands.minBy(i => (dist(open(i).start, pt), i)))
    }
    val chains = Vector.newBuilder[Seq[RingPiece]]
    open.indices.foreach { seed =>
      if (!used(seed)) {
        used(seed) = true
        val first = open(seed)
        val chain = scala.collection.mutable.ArrayBuffer(first)
        var cur = first
        while (dist(cur.end, first.start) > tol) {
          val idx = takeAt(cur.end).getOrElse(throw new
            IllegalArgumentException(
              "requirement failed: eraseRings: no piece starts at an " +
                "arc endpoint — tangency-degenerate input"))
          used(idx) = true
          cur = open(idx)
          chain += cur
        }
        chains += chain.toSeq
      }
    }
    // canonical form: rotate each ring to start at its smallest-keyed
    // piece; order rings by that head key
    def key(p: RingPiece): (Int, Double, Double, Double) =
      (if (p.ccw) 0 else 1, p.cx, p.cy, p.s)
    val ord = Ordering.Tuple4[Int, Double, Double, Double]
    val rings = (closed.map(Seq(_)) ++ chains.result()).map { ring =>
      val i = ring.indices.minBy(j => key(ring(j)))(ord)
      ring.drop(i) ++ ring.take(i)
    }
    rings.sortBy(ring => key(ring.head))(ord)
  }

  /** Output rings per zone (see [[eraseRings]]): one row per ring
    * piece with absolute coordinates, degree angles, traversal
    * direction, and the ring's signed area. Same broadcast-join
    * candidate generation and zone-catalog-bounded driver assembly as
    * [[eraseArcs]]; zones with no candidate buffer emit their full
    * circle as a one-piece CCW ring. Transcendental (atan2/acos) —
    * rows-only in the driver check by the same declared rule as
    * `wnv_erase_arcs`; GeoSpec pins closure, orientation, and
    * area-of-rings == [[erasedArea]].
    */
  def eraseRingsPerZone(spark: SparkSession, zones: DataFrame,
      buffers: DataFrame, bufferFt: Double): DataFrame = {
    import spark.implicits._
    val zcat = zones.select(col("zone_id").cast("int"),
        col("cx_ft"), col("cy_ft"), col("radius_ft"))
      .as[(Int, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    val pairs = buffers.select(col("x_ft"), col("y_ft"))
      .join(broadcast(zones.select(col("zone_id"), col("cx_ft"),
        col("cy_ft"), col("radius_ft"))),
        Geo.dist2(col("x_ft"), col("y_ft"), col("cx_ft"), col("cy_ft"))
          < (col("radius_ft") + bufferFt) * (col("radius_ft") + bufferFt))
      .select(col("zone_id").cast("int"),
        (col("x_ft") - col("cx_ft")).as("dx"),
        (col("y_ft") - col("cy_ft")).as("dy"), col("radius_ft"))
      .as[(Int, Double, Double, Double)]
    val touched = pairs.groupByKey(_._1).mapGroups { (zid, rows) =>
      val rs = rows.toSeq
      zid -> eraseRings(rs.head._4, rs.map(t => (t._2, t._3)), bufferFt)
    }.collect().toMap
    val tau = 2 * math.Pi
    val out = zcat.flatMap { case (z, zcx, zcy, zr) =>
      val rings = touched.getOrElse(z,
        Seq(Seq(RingPiece(ccw = true, 0.0, 0.0, zr, 0.0, tau))))
      rings.zipWithIndex.flatMap { case (ring, ri) =>
        val area = ring.map(_.signedArea).sum
        ring.zipWithIndex.map { case (p, pi) =>
          (z, ri.toLong, pi.toLong,
            if (p.ccw) "zone" else "hole", p.ccw,
            p.cx + zcx, p.cy + zcy, p.rho,
            p.s * 180.0 / math.Pi, p.e * 180.0 / math.Pi, area)
        }
      }
    }
    out.toDF("zone_id", "ring_id", "piece_seq", "kind", "ccw",
      "cx_ft", "cy_ft", "rho_ft", "start_deg", "end_deg",
      "ring_area_sqft")
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

package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def qcos(a: Array[Float], b: Array[Float]): Double = {
    def q(x: Array[Float]): Array[Long] =
      x.map(v => math.floor(v.toDouble * 1048576.0).toLong)
    val (qa, qb) = (q(a), q(b))
    def dot(x: Array[Long], y: Array[Long]): Long =
      x.zip(y).map { case (i, j) => i * j }.sum
    dot(qa, qb).toDouble / (math.sqrt(dot(qa, qa).toDouble) *
      math.sqrt(dot(qb, qb).toDouble))
  }

  test("brute-force top-k matches a JVM-side ranking") {
    val vs = vecs
    val got = graft.SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    val queries = vs.keys.filter(_ % 50 == 0)
    assert(got.keySet === queries.toSet)
    queries.foreach { q =>
      val expected = vs.toSeq.filter(_._1 != q)
        .map { case (c, v) => (c, qcos(vs(q), v)) }
        .sortBy { case (c, s) => (-s, c) }
        .take(5)
      assert(got(q) === expected, s"query $q")
    }
  }

  test("bucketed ANN results are a subset of same-cell brute force") {
    val ann = graft.SparkEntry.queries("sim_ann_bucketed")(spark, sf)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def cell(v: Array[Float]): Int =
      (0 until 4).map(k => if (math.floor(v(k).toDouble * 1048576.0) >= 0) 1 << k else 0).sum
    val vs = vecs
    ann.foreach { case (q, c) =>
      assert(cell(vs(q)) === cell(vs(c)), s"($q,$c) cross-cell leak")
    }
  }

  test("label centroid equals a JVM-side exact mean on one cell") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("label") === 3).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val wantDim0 = vecs.map(v => math.floor(v(0).toDouble * 1048576.0).toLong).sum
      .toDouble / vecs.length / 1048576.0
    val got = graft.SparkEntry.queries("emb_centroid_by_label")(spark, sf)
      .filter(col("label") === 3 && col("dim") === 0).head()
    assert(got.getLong(2) === vecs.length)
    assert(math.abs(got.getDouble(3) -
      BigDecimal(wantDim0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("pair matrix is upper-triangular and complete for vec_id < 20") {
    val got = graft.SparkEntry.queries("sim_pair_matrix")(spark, sf).collect()
    val n = vecs.keys.count(_ < 20)
    assert(got.length === n * (n - 1) / 2)
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dim stats cover every dimension with consistent moments") {
    val got = graft.SparkEntry.queries("emb_dim_stats")(spark, sf).collect()
    assert(got.length === 64)
    assert(got.forall(_.getLong(1) === vecs.size.toLong))
    got.foreach { r =>
      val (mean, variance, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(variance >= -1e-9, s"dim ${r.getLong(0)}")
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6, s"dim ${r.getLong(0)}")
    }
    // spot-check dim 0 against a JVM-side integer power-sum replay
    val q0 = vecs.values.map(v => math.floor(v(0) * 1048576.0).toLong).toSeq
    val n = q0.size.toDouble
    val wantMean = BigDecimal(q0.sum.toDouble / n / 1048576.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d0 = got.find(_.getLong(0) == 0L).get
    assert(math.abs(d0.getDouble(2) - wantMean) < 1e-9)
  }

  test("bucketed recall report equals the overlap of the two rankings") {
    val exact = graft.SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = graft.SparkEntry.queries("sim_ann_bucketed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = graft.SparkEntry.queries("sim_recall_bucketed")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === exact.keySet)
    got.foreach { case (qid, (hits, recall)) =>
      val want = (exact(qid) intersect ann.getOrElse(qid, Set.empty)).size
      assert(hits === want.toLong, s"query $qid")
      assert(math.abs(recall - want / 5.0) < 1e-9, s"query $qid")
    }
  }

  test("embedding outliers are the true farthest-from-centroid members") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray.map(v =>
          math.floor(v.toDouble * 1048576.0).toLong)))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
      val n = vs.length.toLong
      val dims = vs.head._3.length
      val cent = (0 until dims).map { d =>
        val s = vs.map(_._3(d)).sum
        (s - (((s % n) + n) % n)) / n // floor division
      }
      vs.map { case (id, _, q) =>
        val d2 = (0 until dims).map { d =>
          val dd = q(d) - cent(d); dd * dd
        }.sum
        (label, id, d2)
      }.sortBy(v => (-v._3, v._2)).take(3).zipWithIndex
        .map { case ((l, id, d2), i) => (l, i + 1L) -> (id, d2) }
    }
    val got = SparkEntry.queries("emb_outliers")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === want.toMap)
    assert(got.nonEmpty)
  }

  test("knn graph edges are exactly the mutual top-3 pairs") {
    val vs = vecs.filter(_._1 < 100)
    val top3 = vs.keys.map { u =>
      u -> vs.keys.filter(_ != u).toSeq
        .map(v => (v, qcos(vs(u), vs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(3).map(_._1).toSet
    }.toMap
    val want = (for {
      u <- vs.keys; v <- vs.keys
      if u < v && top3(u)(v) && top3(v)(u)
    } yield (u, v)).toSet
    val got = graft.SparkEntry.queries("sim_knn_graph")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  /** JVM-side Lloyd twin of Similarity.kmeansFinalAssign: same quantize,
    * seeds, rounds, floor division — returns id -> (cid, d2).
    */
  private def lloydAssign(vs: Map[Long, Array[Float]]): Map[Long, (Long, Long)] = {
    def quant(x: Array[Float]): Array[Long] =
      x.map(v => math.floor(v.toDouble * 1048576.0).toLong)
    val qv = vs.map { case (id, v) => id -> quant(v) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (i, j) => i * j }.sum
    val n2 = qv.map { case (id, v) => id -> dot(v, v) }
    var cents: Map[Long, Array[Long]] = qv.filter(_._1 < 8)
    def assign(): Map[Long, (Long, Long)] = qv.map { case (id, v) =>
      id -> cents.toSeq.map { case (c, cv) =>
        (c, n2(id) + dot(cv, cv) - 2 * dot(v, cv))
      }.minBy { case (c, d) => (d, c) }.swap
    }.map { case (id, (d2, cid)) => id -> (cid, d2) }
    for (_ <- 1 to 3) {
      val byCluster = assign().toSeq.groupBy(_._2._1)
      cents = byCluster.map { case (cid, members) =>
        val mv = members.map(m => qv(m._1))
        cid -> Array.tabulate(mv.head.length) { d =>
          math.floor(mv.map(_(d)).sum.toDouble / mv.size).toLong
        }
      }
    }
    assign()
  }

  test("k-means matches a JVM-side Lloyd run (same seeds, rounds, floor)") {
    val vs = vecs
    val fin = lloydAssign(vs).toSeq.groupBy(_._2._1)
    val expected = fin.map { case (cid, m) =>
      cid -> ((m.size.toLong, m.map(x => BigInt(x._2._2)).sum))
    }
    // inertia is the exact decimal sum cast to double on output (oracle
    // rendering parity); at test scale it stays far below 2^53, so the
    // round trip back to BigInt is exact — assert that, don't assume it.
    val got = graft.SparkEntry.queries("emb_kmeans")(spark, sf).collect()
      .map { r =>
        val inertia = r.getDouble(2)
        assert(inertia.isWhole && inertia.abs < 9.007199254740992e15)
        r.getLong(0) -> ((r.getLong(1), BigInt(inertia.toLong)))
      }.toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === vs.size.toLong)
  }

  test("cluster-capped sample keeps min(cap, cluster size), deterministically") {
    val sizes = graft.SparkEntry.queries("emb_kmeans")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.SparkEntry.queries("sample_cluster_cap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.keySet === sizes.keySet)
    byCluster.foreach { case (cid, members) =>
      assert(members.length.toLong === math.min(40L, sizes(cid)), s"cluster $cid")
      // ranks are contiguous from 1
      assert(members.map(_._3).sorted.toSeq === (1L to members.length).toSeq)
    }
    // hash-ordered pick: identical on re-run
    val again = graft.SparkEntry.queries("sample_cluster_cap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("semantic dedup drops exactly the within-cluster cosine dups") {
    val vs = vecs
    val cl = lloydAssign(vs).map { case (id, (cid, _)) => id -> cid }
    val dropped = cl.keys.toSeq.sorted.flatMap { j =>
      val dup = cl.keys.exists(i => i < j && cl(i) == cl(j) &&
        qcos(vs(i), vs(j)) >= 0.45)
      if (dup) Some(j) else None
    }.toSet
    val expected = cl.filterNot { case (id, _) => dropped(id) }
    val got = graft.SparkEntry.queries("dedup_semantic")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // survivors must be a strict subset at this scale (some dup found)
    assert(got.size < vs.size)
  }

  /** Quantized cells loaded once for the PCA-family replays. */
  private lazy val pcaCells: Array[(Long, Seq[Long])] =
    graft.ops.Dedup.qEmb(spark, sf)
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))

  /** JVM replay of the identical integer power-iteration trajectory over
    * the quantized cells (BigInt = the DECIMAL(38,0)/HUGEINT domain).
    */
  private lazy val pcaLoadings: Array[BigInt] = {
    val cells = pcaCells
    val nn = BigInt(cells.length)
    val dims = cells.head._2.length
    val s12 = Array.ofDim[BigInt](dims, dims)
    val sv = Array.fill(dims)(BigInt(0))
    for (i <- 0 until dims; j <- 0 until dims) s12(i)(j) = BigInt(0)
    cells.foreach { case (_, q) =>
      for (i <- 0 until dims) {
        sv(i) += q(i)
        for (j <- 0 until dims) s12(i)(j) += BigInt(q(i)) * q(j)
      }
    }
    val c = Array.tabulate(dims, dims)((i, j) => nn * s12(i)(j) - sv(i) * sv(j))
    val g = c.flatten.map(_.abs).max / 1000000 + 1
    val cr = c.map(_.map(v => (if (v < 0) -1 else 1) * (v.abs / g)))
    var x = Array.fill(dims)(BigInt(1000000))
    for (_ <- 1 to 3) {
      val y = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cr(i)(j) * x(j)).sum)
      val mx = y.map(_.abs).max.max(BigInt(1))
      x = y.map(v => (if (v < 0) -1 else 1) * (v.abs * 1000000 / mx))
    }
    x
  }

  test("pca power iteration: max-norm invariant and a JVM-side replay") {
    val got = graft.SparkEntry.queries("emb_pca_power")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 64)
    // after max-norm rescaling the dominant component is exactly ±1e6
    assert(got.values.map(math.abs).max === 1000000L)
    val want =
      pcaLoadings.indices.map(i => i.toLong -> pcaLoadings(i).toLong).toMap
    assert(got === want)
  }

  test("ivf-pq composes the two indexes: same cell, JVM-replayed ADC top-k") {
    val cells = graft.ops.Similarity.ivfCells(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = pcaCells.toMap // (vec_id -> quantized components)
    // fixed ~256-entry PQ codebook: every cstep-th vector, cstep ∝ n
    val cstep = math.max(1L, (vecs.size + 255L) / 256L)
    val centIds = vecs.keys.filter(_ % cstep == 0).toSeq.sorted
    // subspace squared distance of v's m-th 16-dim block to centroid c's
    def subD2(v: Seq[Long], c: Seq[Long], m: Int): Long =
      (m * 16 until (m + 1) * 16).map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
    val queries = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    val want = queries.flatMap { q =>
      val cand = vecs.keys.filter(c => c != q && cells(c) == cells(q))
      val adc = cand.map { c =>
        c -> (0 until 4).map(m => subD2(vecs(q), vecs(centIds.minBy(cv =>
          subD2(vecs(c), vecs(cv), m) * 4096 + cv / cstep)), m)).sum
      }.toSeq
      adc.sortBy { case (c, d) => (d, c) }.take(5).zipWithIndex
        .map { case ((c, d), i) => (q, c, d, (i + 1).toLong) }
    }
    val got = graft.SparkEntry.queries("sim_ivfpq_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq === want)
    // the composition actually pruned: every match shares the query cell
    got.foreach { case (q, c, _, _) => assert(cells(q) === cells(c)) }
    assert(got.nonEmpty)
  }

  test("hard negatives: same cell, different label, exact top-3 order") {
    val cells = graft.ops.Similarity.ivfCells(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = pcaCells.toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(v => v * v).sum.toDouble)
      val nb = math.sqrt(b.map(v => v * v).sum.toDouble)
      dot.toDouble / (na * nb)
    }
    val want = vecs.keys.filter(_ % 50 == 0).toSeq.sorted.flatMap { q =>
      vecs.keys
        .filter(c => cells(c) == cells(q) && labels(c) != labels(q))
        .map(c => (c, cos(vecs(q), vecs(c))))
        .toSeq.sortBy { case (c, s) => (-s, c) }.take(3).zipWithIndex
        .map { case ((c, _), i) => (q, c, i + 1) }
    }
    val got = graft.SparkEntry.queries("sim_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(5)))
    assert(got.toSeq === want)
    // every mined negative really is differently labeled, same cell
    graft.SparkEntry.queries("sim_hard_negatives")(spark, sf)
      .collect().foreach { r =>
        assert(r.getInt(1) !== r.getInt(3))
        assert(cells(r.getLong(0)) === cells(r.getLong(2)))
      }
  }

  test("top-1 residual shares replay exactly and sit in [0, 1]") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val x = pcaLoadings
    val xx = x.map(v => v * v).sum
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // per-vector share with the query's exact arithmetic: integer
    // tp/n2/xx, one double conversion per factor, round at 1e-6
    val shares = pcaCells.map { case (vid, q) =>
      val tp = q.indices.map(i => BigInt(q(i)) * x(i)).sum
      val n2 = q.map(v => BigInt(v) * v).sum
      labels(vid) -> r6((tp * tp).toDouble / (n2.toDouble * xx.toDouble))
    }
    val want = shares.groupBy(_._1).map { case (lab, vs) =>
      val ss = vs.map(_._2)
      val avg = r6(ss.map(BigDecimal(_).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / ss.length)
      lab -> ((ss.length.toLong, avg, ss.max))
    }
    val got = graft.SparkEntry.queries("emb_top1_residual")(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got === want)
    got.values.foreach { case (_, avg, mx) =>
      assert(avg >= 0.0 && avg <= 1.0 && mx >= avg && mx <= 1.0)
    }
    // every corpus vector is accounted for in exactly one label row
    assert(got.values.map(_._1).sum === pcaCells.length.toLong)
  }

  test("PQ encode-artifact storage regime boundary: shipped corpora " +
      "sit on the committed side of the in-heap / DISK_ONLY ceiling") {
    // the N×M×K encode frame is in-heap through sf10 (the committed
    // record regime) and DISK_ONLY past PqInHeapMaxRows (the sf30
    // warm-probe OOM fix) — pin the shipped corpora against the
    // constant so embedding-count drift cannot silently flip a
    // committed bench regime's storage path (the DedupSpec convention)
    // absent scale dirs cancel loudly instead of silently passing
    // (r14 ADVICE #1 — the DedupSpec convention)
    def vecs(dir: String): Option[Long] = {
      val p = new java.io.File(s"$dir/embeddings.parquet")
      if (p.exists()) Some(spark.read.parquet(p.getPath).count())
      else None
    }
    // mirrors the memo's own estimate: K derived from the cstep
    // construction (ceil(n / ceil(n/256)) ≤ 256), not the 256 bound
    def estRows(n: Long): Long = {
      val cstep = math.max(1L, (n + 255L) / 256L)
      n * 8L * ((n + cstep - 1L) / cstep)
    }
    val missing = Seq.newBuilder[String]
    Seq(sf -> "sf0.001", "testdata-gen/sf1" -> "sf1",
        "testdata-gen/sf10" -> "sf10").foreach { case (dir, label) =>
      vecs(dir) match {
        case Some(n) =>
          assert(estRows(n) <= graft.ops.Similarity.PqInHeapMaxRows,
            s"$label encode frame ${estRows(n)} rows crossed the in-heap " +
              "ceiling — committed records through sf10 are in-heap")
        case None => missing += label
      }
    }
    vecs("testdata-gen/sf30") match {
      case Some(n) =>
        assert(estRows(n) > graft.ops.Similarity.PqInHeapMaxRows,
          s"sf30 encode frame ${estRows(n)} rows fell under the ceiling — " +
            "sf30 scale records are DISK_ONLY measurements")
      case None => missing += "sf30"
    }
    val miss = missing.result()
    if (miss.nonEmpty) cancel("scale dirs not generated in this " +
      s"checkout — boundary pin NOT checked for: ${miss.mkString(", ")}")
  }
}

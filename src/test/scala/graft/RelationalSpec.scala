package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per group") {
    val exact = graft.SparkEntry.queries("agg_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"group $k: approx $ap vs exact $ex")
    }
  }

  test("top-k is invariant under input repartitioning") {
    val base = graft.sources.Tables.t(spark, sf, "lineitem")
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10).collect().toSeq
    assert(topk(base) === topk(base.repartition(13)))
  }

  test("rollup row count = groups + subtotals + grand total") {
    val detail = graft.SparkEntry.queries("agg_rollup")(spark, sf).collect()
    val nGrand = detail.count(r => r.isNullAt(0) && r.isNullAt(1))
    val nSub = detail.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val nLeaf = detail.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(nGrand === 1)
    assert(detail.length === nGrand + nSub + nLeaf)
    // subtotal level: one row per region present
    assert(nSub === 5)
  }

  test("full outer join keeps keys present on either side") {
    val out = graft.SparkEntry.queries("join_full_nation")(spark, sf)
    assert(out.filter(col("nationkey").isNull).count() === 0)
    val nKeys = out.count()
    val cKeys = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey")).distinct().count()
    assert(nKeys >= cKeys)
  }

  test("scan with selective filter pushes predicates into parquet scan") {
    val df = graft.SparkEntry.queries("scan_pushdown")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") ||
      plan.contains("LessThan(l_quantity"), plan.take(2000))
  }

  test("profile_columns scans the table once and its stats are consistent") {
    val df = graft.SparkEntry.queries("profile_columns")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(1) === 0L, s"${r.getString(0)} nulls")     // testdata has none
      assert(r.getLong(2) > 0L, s"${r.getString(0)} distinct")
      assert(r.getDouble(3) <= r.getDouble(4), s"${r.getString(0)} min<=max")
    }
    // one pass: exactly one scan of lineitem in the FINAL plan (the AQE
    // string repeats the tree under "== Initial Plan ==" — cut it off)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("lineitem\\.parquet".r.findAllIn(plan).length <= 1, plan.take(2000))
  }

  test("q9 plans broadcast dims, one shuffle join, and a pushed name filter") {
    val df = graft.SparkEntry.queries("q9_profit_share")(spark, sf)
    df.count() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the p_name LIKE filter must reach the part scan, not sit above a join
    assert(plan.contains("StringContains(p_name,bolt)"), plan.take(2000))
    // shares sum to 1 per year
    val shares = df.groupBy(col("o_year"))
      .agg(sum(col("year_share")).as("s")).collect()
    assert(shares.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-3))
  }

  test("z-order buckets bound both dimensions (the data-skipping property)") {
    val got = graft.SparkEntry.queries("zorder_layout")(spark, sf).collect()
    // zbucket = zval >> 6 fixes every bit above the low 6 interleaved
    // ones, leaving each dimension only its low 3 bits free: any bucket
    // spans < 8 in BOTH qty and fortnight — the per-file min/max
    // tightness that makes z-ordered stats prune either predicate.
    got.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 8, s"qty span in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) < 8, s"fn span in bucket ${r.getLong(0)}")
    }
    val total = got.map(_.getLong(1)).sum
    val rows = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total === rows)
  }

  test("bloom prefilter is lossless and actually prunes the fact side") {
    val bloomed = graft.SparkEntry.queries("join_bloom_prefilter")(spark, sf)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val plain = orders
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // exact parity: the residual semi join absorbs every false positive
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    // and the plan must show the bit-test filter UNDER the semi join —
    // the scan-side reduction is real, not post-join decoration.
    val plan = bloomed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("element_at"), plan.take(3000))
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(plan.indexOf("element_at") > plan.indexOf("LeftSemi"),
      "bloom filter should sit below (print after) the semi join")
  }

  test("Catalyst's injected runtime bloom filter fires on a shuffle join") {
    // the optimizer-owned twin of join_bloom_prefilter: when a shuffle
    // join's build side carries a selective filter, Catalyst can inject
    // a BloomFilterAggregate/might_contain pair itself — no hand-built
    // bit array. Thresholds are sized for 100 TB (10 MB creation side /
    // 10 GB scan side), so at test scale they must be lowered to see
    // the rewrite; the pin is that the engine's config path and plan
    // shape work, with exact result parity against the un-filtered join.
    // creationSideThreshold is an UPPER bound (the build side must be
    // small enough to collect into a bloom filter) — only the
    // application-side floor needs lowering at test scale
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // the rule only fires on a PROBABLE shuffle join, judged by size
      // not by hint — at test scale the dim is auto-broadcastable, so
      // broadcast must be off for the join to qualify
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val dim = spark.read.parquet(s"$sf/customer.parquet")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
      val q = orders.hint("merge")
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan.take(3000))
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      val want = orders
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q18 aggregates lineitem before any join touches it") {
    val df = graft.SparkEntry.queries("q18_top_buyers")(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the HAVING-filtered aggregate must sit below both joins: no join
    // operator may appear between the lineitem scan and the first
    // HashAggregate (cheap structural proxy: the aggregate on sum_qty
    // exists, and lineitem is scanned exactly once).
    assert("lineitem\\.parquet".r.findAllIn(plan).length <= 1, plan.take(2000))
    assert(plan.contains("sum_qty"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(5) > 250L))
  }

  test("market basket pairs and lift match a brute-force recompute") {
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val nOrders = byOrder.size.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = byOrder.values.flatMap { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    val want = pairN.toSeq.map { case ((a, b), n) =>
      val lift = BigDecimal(n * nOrders.toDouble / (itemN(a) * itemN(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, n, lift)
    }.sortBy { case (a, b, n, _) => (-n, a, b) }.take(100)
    val got = SparkEntry.queries("orders_market_basket")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bag set ops respect multiplicities; right join covers all parts") {
    val p = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "P").groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F").groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inter = SparkEntry.queries("set_intersect_all")(spark, sf)
      .groupBy(col("o_custkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diff = SparkEntry.queries("set_except_all")(spark, sf)
      .groupBy(col("o_custkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (p.keySet ++ f.keySet).foreach { k =>
      val (np, nf) = (p.getOrElse(k, 0L), f.getOrElse(k, 0L))
      assert(inter.getOrElse(k, 0L) === math.min(np, nf), k)
      assert(diff.getOrElse(k, 0L) === math.max(0L, np - nf), k)
    }
    val rj = SparkEntry.queries("join_right_parts")(spark, sf)
    assert(rj.count() ===
      spark.read.parquet(s"$sf/part.parquet").count())
  }

  test("grouping_id distinguishes subtotal levels of the rollup") {
    val rows = SparkEntry.queries("agg_grouping_id")(spark, sf)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3)))
    // gid 0 = leaf, 1 = priority subtotal, 3 = grand total
    assert(rows.map(_._4).toSet === Set(0L, 1L, 3L))
    val grand = rows.filter(_._4 == 3L)
    assert(grand.length === 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(grand.head._3 === nOrders)
    assert(rows.filter(_._4 == 0L).map(_._3).sum === nOrders)
    // a NULL inside gid=0 rows would be data, not subtotal — none here,
    // but the gid column is what makes that distinction expressible
    rows.filter(_._4 == 1L).foreach(r => assert(r._2.isEmpty, r))
  }

  test("rfm quartiles balance and metrics match a brute-force recompute") {
    val rows = SparkEntry.queries("orders_rfm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate, r.getLong(2)))
    val horizon = java.time.LocalDate.of(2002, 1, 1)
    val byCust = orders.groupBy(_._1)
    assert(rows.length === byCust.size)
    rows.foreach { case (ck, rec, freq, mon, rs, fs, ms, seg) =>
      val os = byCust(ck)
      assert(freq === os.length.toLong, ck)
      assert(mon === os.map(_._3).sum, ck)
      val last = os.map(_._2).maxBy(_.toEpochDay)
      assert(rec === java.time.temporal.ChronoUnit.DAYS.between(last, horizon), ck)
      assert(Seq(rs, fs, ms).forall(x => x >= 1 && x <= 4), ck)
      assert(seg === s"$rs$fs$ms", ck)
    }
    // each score's quartiles are balanced to within one customer
    Seq(5, 6).foreach { i =>
      val sizes = rows.groupBy(_.productElement(i - 1)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("concurrency curve peak matches a JVM sweep line") {
    val sessions = SparkEntry.queries("events_sessions")(spark, sf)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val deltas = (sessions.map(s => (s._1, 1L)) ++
      sessions.map(s => (s._2 + 1, -1L))).sortBy(d => (d._1, d._2))
    var run = 0L
    val curve = deltas.map { case (at, d) => run += d; (at, run) }
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val want = curve.groupBy { case (at, _) =>
      fmt.format(java.time.Instant.ofEpochSecond(at / 1000000))
    }.view.mapValues(v => (v.map(_._2).max, v.length.toLong)).toMap
    val got = SparkEntry.queries("events_concurrency_curve")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === want)
  }

  test("referential audit reports full row counts and zero orphans") {
    val rows = SparkEntry.queries("audit_referential")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.size === 7)
    // the generated testdata is referentially intact
    assert(rows.values.forall(_._2 === 0L), rows.toString)
    val li = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows("lineitem_orders")._1 === li)
    assert(rows("lineitem_part")._1 === li)
  }

  test("histogram buckets partition the order total mass") {
    val rows = SparkEntry.queries("agg_histogram")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(rows.map(_._3).sum === orders.count())
    rows.foreach { case (lo, hi, _) => assert(hi === lo + 50000L) }
    // every order total falls inside its claimed bucket
    val (mn, mx) = (rows.map(_._1).min, rows.map(_._2).max)
    val range = orders.agg(min(col("o_totalprice")), max(col("o_totalprice")))
      .head()
    assert(range.getDouble(0) >= mn && range.getDouble(1) < mx)
  }

  test("fuzzy pairs are exactly the blocked close name pairs") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select("p_name").distinct().collect().map(_.getString(0))
    val want = (for {
      a <- names; b <- names
      if a < b && a.head == b.head && lev(a, b) <= 3
    } yield (a, b, lev(a, b).toLong)).sortBy(p => (p._1, p._2)).toSeq
    val got = SparkEntry.queries("fuzzy_join_parts")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("pagerank micro-rank trajectory matches a JVM replay") {
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // note: .filter(...).keys, NOT .collect { case (p, _) => p } — collect
    // on a Map with a tuple-valued function rebuilds a Map and silently
    // dedupes pairs by first element
    val pairs = baskets.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    val n = nodes.size.toLong
    var ru = nodes.map(_ -> 1000000L / n).toMap
    (1 to 3).foreach { _ =>
      val in = edges.groupBy(_._2)
      ru = nodes.map { v =>
        v -> (150000L / n +
          85L * in(v).map { case (s, _) => ru(s) / deg(s) }.sum / 100L)
      }.toMap
    }
    val want = ru.toSeq.sortBy { case (v, r) => (-r, v) }.take(50)
    val got = SparkEntry.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("link prediction replays brute-force and proposes only non-edges") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = baskets.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cand = adj.groupBy(_._1).values.flatMap { nbrs =>
      val ns = nbrs.map(_._2).toSeq.sorted
      for (i <- ns.indices; j <- i + 1 until ns.length) yield (ns(i), ns(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (p, _) => !pairs.contains(p) }
    val want = cand.toSeq.map { case ((u, w), cn) =>
      (u, w, cn, r6(cn.toDouble / (deg(u) + deg(w) - cn).toDouble))
    }.sortBy { case (u, w, cn, j) => (-cn, -j, u, w) }.take(30)
    val got = SparkEntry.queries("graph_link_prediction")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === want)
    assert(got.nonEmpty)
    got.foreach { case (u, w, _, _) => assert(!pairs.contains((u, w))) }
  }

  test("q13 histogram masses add up to the customer count") {
    val rows = SparkEntry.queries("q13_order_dist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_._2).sum === nCust)
    // order mass: Σ c_count·custdist = total orders (every order has a
    // customer in this data)
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(r => r._1 * r._2).sum === nOrders)
  }

  test("q7 trade matrix is cross-nation only with positive revenue") {
    val rows = SparkEntry.queries("q7_nation_volume")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 != r._2))
    assert(rows.forall(_._4 > 0L))
    // cross-check one cell against a brute-force recompute
    val (sn, cn, yr, rev) = rows.head
    val li = spark.sql(s"""
      SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
      FROM parquet.`$sf/lineitem.parquet`
      JOIN parquet.`$sf/supplier.parquet` ON l_suppkey = s_suppkey
      JOIN parquet.`$sf/nation.parquet` n1 ON s_nationkey = n1.n_nationkey
      JOIN parquet.`$sf/orders.parquet` ON l_orderkey = o_orderkey
      JOIN parquet.`$sf/customer.parquet` ON o_custkey = c_custkey
      JOIN parquet.`$sf/nation.parquet` n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name = '$sn' AND n2.n_name = '$cn'
        AND year(l_shipdate) = $yr""").head().getLong(0)
    assert(li === rev)
  }

  test("profile_drift matches a brute-force two-window recount") {
    val boundary = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getString(1),
        r.getDouble(2)))
    val binned = ev.flatMap { case (ts, et, v) =>
      val isA = ts.isBefore(boundary)
      Seq(("event_type", et, isA),
        ("value_bin", "v" + math.floor(v / 50).toLong, isA))
    }
    val counts = binned.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> ((xs.count(_._3).toLong, xs.count(!_._3).toLong))
    }
    val tots = counts.toSeq.groupBy(_._1._1).map { case (dim, xs) =>
      dim -> ((xs.map(_._2._1).sum, xs.map(_._2._2).sum))
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("profile_drift")(spark, sf).collect()
    assert(got.length === counts.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (na, nb) = counts(k)
      val (ta, tb) = tots(k._1)
      assert(r.getLong(2) === na, s"$k n_a")
      assert(r.getLong(3) === nb, s"$k n_b")
      val (pa, pb) = (na.toDouble / ta, nb.toDouble / tb)
      assert(r.getDouble(4) === r6(pa), s"$k share_a")
      assert(r.getDouble(6) === r6(math.abs(pa - pb)), s"$k tv_drift")
      assert(r.getDouble(7) === r6((pa - pb) * (pa - pb) / ((pa + pb) / 2)),
        s"$k chi2_drift")
    }
    // both windows saw every dimension: totals cover the full event count
    assert(tots("event_type")._1 + tots("event_type")._2 === ev.length.toLong)
  }

  test("exact global quantiles equal the sorted-array selection") {
    val cents = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_extendedprice").collect()
      .map(r => math.round(r.getDouble(0) * 100)).sorted
    val n = cents.length
    val want = Seq(0.25, 0.50, 0.75, 0.99).map { q =>
      q -> cents(math.max(1, math.ceil(q * n).toLong).toInt - 1)
    }
    val got = SparkEntry.queries("agg_exact_quantiles_global")(spark, sf)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toSeq
    assert(got === want)
  }

  test("label propagation replays a brute-force 3-round modal update") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairs = li.groupBy(_._1).values.toSeq.flatMap { b =>
      val ps = b.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = sym.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (v, nbs) =>
        val cnt = nbs.map(lbl).groupBy(identity)
          .map { case (l, xs) => l -> xs.size }
        v -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.groupBy(_._2).map { case (c, m) =>
      c -> ((m.size.toLong, m.keys.min, m.keys.max))
    }
    val got = SparkEntry.queries("graph_label_propagation")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    // communities found: propagation coarsens the initial id labels
    assert(got.size < adj.size)
  }
}

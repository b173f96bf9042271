package graft

import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("as-of join matches a brute-force per-purchase scan") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = evs.filter(_._3 == "view").groupBy(_._2)
    val expected = evs.filter(_._3 == "purchase").map { case (id, u, _, us) =>
      val prior = views.getOrElse(u, Array.empty).filter(_._4 <= us)
      val best = if (prior.isEmpty) None
        else Some(prior.maxBy(v => (v._4, v._1)))
      id -> best.map(v => (v._1, us - v._4))
    }.toMap
    val got = graft.SparkEntry.queries("events_asof_join")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some((r.getLong(2), r.getLong(3))))).toMap
    assert(got === expected)
  }

  test("sessionization: every gap inside a session is <= 30 min") {
    val sess = graft.SparkEntry.queries("events_sessions")(spark, sf)
      .select("user_id", "session_no", "session_start_us", "session_end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sessions of one user are disjoint and ordered with >= 30min gaps
    // (a gap of exactly 30 min closes a session — session_window
    // half-open-interval semantics)
    val gapUs = 30L * 60 * 1000000
    sess.groupBy(_._1).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array((_, _, _, prevEnd), (_, _, nextStart, _)) =>
          assert(nextStart - prevEnd >= gapUs)
        case _ =>
      }
    }
  }

  test("funnel stages are monotone and match a JVM-side replay") {
    val winUs = 24L * 3600L * 1000000L
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    var nV = 0L; var nC = 0L; var nP = 0L
    byUser.values.foreach { es =>
      val v = es.filter(_._2 == "view").map(_._3)
      if (v.nonEmpty) {
        nV += 1
        val vUs = v.min
        val c = es.filter(e => e._2 == "click" && e._3 > vUs && e._3 <= vUs + winUs).map(_._3)
        if (c.nonEmpty) {
          nC += 1
          val cUs = c.min
          if (es.exists(e => e._2 == "purchase" && e._3 > cUs && e._3 <= cUs + winUs)) nP += 1
        }
      }
    }
    val got = graft.SparkEntry.queries("events_funnel")(spark, sf).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((nV, nC, nP)))
    assert(got.getLong(0) >= got.getLong(1) && got.getLong(1) >= got.getLong(2))
  }

  test("retention matches a JVM-side cohort replay") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / lit(604800L)).as("week"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = evs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = evs.map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    val got = graft.SparkEntry.queries("events_retention")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
    // offset-0 cohort sizes partition the user base
    val offset0 = got.collect { case ((_, 0L), n) => n }.sum
    assert(offset0 === cohort.size.toLong)
  }

  test("cdc upsert: incremental base+delta merge equals full recompute") {
    val merged = graft.SparkEntry.queries("events_cdc_upsert")(spark, sf)
    // full recompute, independently formulated (groupBy max_by)
    val full = graft.sources.Tables.t(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max_by(col("event_id"),
          struct(col("ts"), col("event_id"))).as("last_event_id"),
        max(unix_micros(col("ts"))).as("last_us"),
        max_by(col("value"),
          struct(col("ts"), col("event_id"))).as("last_value"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // exactly one state row per observed key
    val nKeys = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(merged.count() === nKeys)
  }

  test("linear attribution matches a brute-force per-purchase split") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val winUs = 3L * 24 * 3600 * 1000000L
    val touches = evs.filter(e => e._3 == "view" || e._3 == "click")
      .groupBy(_._2)
    val credited = evs.filter(_._3 == "purchase").flatMap {
      case (_, u, _, pts, value) =>
        val w = touches.getOrElse(u, Array.empty)
          .filter(t => t._4 < pts && t._4 >= pts - winUs)
        w.map(t => (t._3, value / w.length))
    }
    val want = credited.groupBy(_._1).view.mapValues { cs =>
      (cs.length.toLong,
        BigDecimal(cs.map(c => BigDecimal(c._2).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = SparkEntry.queries("events_attribution")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === want)
  }

  test("bot-detection rate and gap CV match a JVM recompute") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = evs.groupBy(_._1).collect {
      case (u, rows) if rows.length >= 3 &&
        rows.map(_._3).max > rows.map(_._3).min =>
        val sorted = rows.sortBy(e => (e._3, e._2)).map(_._3)
        val gaps = sorted.sliding(2).map { case Array(a, b) => b - a }.toSeq
        val k = gaps.length.toDouble
        val mean = gaps.sum / k
        val varp = gaps.map(g => g.toDouble * g).sum / k - mean * mean
        val span = (sorted.last - sorted.head).toDouble
        u -> (rows.length.toLong,
          r6(rows.length / (span / 6.0e7)),
          r6(if (varp > 0) math.sqrt(varp) / mean else 0.0))
    }
    val got = SparkEntry.queries("events_bot_detection")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (u, (n, rate, cv)) =>
      val (wn, wrate, wcv) = want(u)
      assert(n === wn, u)
      assert(math.abs(rate - wrate) < 2e-6, u)
      assert(math.abs(cv - wcv) < 2e-6, u)
    }
  }

  test("ab test arms partition users and z matches a JVM recompute") {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val conv = evs.groupBy(_._1).view.mapValues(_.exists(e =>
      e._2 == "purchase" && e._3 > 200.0)).toMap
    val byArm = conv.keys.groupBy(u => h32(s"exp1:$u") % 2)
    val (na, ca) = (byArm(0L).size.toLong, byArm(0L).count(conv).toLong)
    val (nb, cb) = (byArm(1L).size.toLong, byArm(1L).count(conv).toLong)
    val r = SparkEntry.queries("events_ab_test")(spark, sf).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ===
      ((na, ca, nb, cb)))
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pp = (ca + cb).toDouble / (na + nb)
    if (pp > 0 && pp < 1) {
      val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      assert(r.getDouble(6) ===
        BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    } else assert(r.isNullAt(6))
  }

  test("top paths are the true trigram counts") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(e => (e._3, e._2)).map(_._4).sliding(3)
        .collect { case Array(a, b, c) => s"$a>$b>$c" }
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    val got = SparkEntry.queries("events_top_paths")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("session overlap counts match a brute-force interval scan") {
    val sessions = SparkEntry.queries("events_sessions")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = SparkEntry.queries("events_session_overlap")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size === sessions.length)
    sessions.foreach { case (u, sn, st, en) =>
      val nc = sessions.count { case (u2, sn2, st2, en2) =>
        (u2, sn2) != (u, sn) && st <= en2 && st2 <= en
      }
      assert(got((u, sn)) === ((st, en, nc.toLong)), s"session ($u,$sn)")
    }
  }

  test("markov transition rows are probability distributions over true counts") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(e => (e._3, e._2)).map(_._4).sliding(2)
        .collect { case Array(a, b) => (a, b) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("events_markov_transitions")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.view.mapValues(_._1).toMap === want)
    // each from_type row of the matrix sums to ~1
    got.groupBy(_._1._1).foreach { case (ft, cells) =>
      assert(math.abs(cells.values.map(_._2).sum - 1.0) < 1e-4, ft)
    }
  }

  test("scd2 intervals tile each key's timeline with one open version") {
    val rows = SparkEntry.queries("events_scd2_history")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getBoolean(7)))
    val nEvents = graft.sources.Tables.t(spark, sf, "events").count()
    assert(rows.length === nEvents)
    rows.groupBy(r => (r._1, r._2)).foreach { case (key, vs) =>
      val sorted = vs.sortBy(_._3)
      // versions are consecutive from 1
      assert(sorted.map(_._3).toSeq === (1L to sorted.length).toSeq, key)
      // each interval closes exactly at the next version's start
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4), key)
        case _ =>
      }
      // exactly the last version is open and flagged current
      assert(sorted.count(_._6) === 1 && sorted.last._6, key)
      assert(sorted.last._5.isEmpty, key)
    }
  }

  test("anomaly z-scores match a brute-force trailing-window recompute") {
    val daily = graft.sources.Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = daily.groupBy(_._1).flatMap { case (ty, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.flatMap { i =>
        val wnd = sorted.slice(math.max(0, i - 7), i).map(_._3)
        if (wnd.length != 7) None
        else {
          val s1 = wnd.sum.toDouble
          val mean = s1 / 7.0
          val variance = (wnd.map(n => n.toDouble * n).sum - s1 * s1 / 7.0) / 6.0
          if (variance <= 0) None
          else Some((ty, sorted(i)._2) ->
            BigDecimal((sorted(i)._3 - mean) / math.sqrt(variance))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }
    val got = SparkEntry.queries("events_anomaly_zscore")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    assert(got === want.toMap)
    assert(got.nonEmpty)
  }

  test("time-weighted average equals the step-function integral") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = evs.groupBy(_._1).collect {
      case (u, rows) if rows.map(_._3).distinct.length > 1 =>
        val sorted = rows.sortBy(e => (e._3, e._2))
        val wsum = sorted.sliding(2).collect { case Array(a, b) =>
          BigDecimal(a._4 * (b._3 - a._3).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
        val span = (sorted.last._3 - sorted.head._3).toDouble
        u -> (rows.length.toLong, BigDecimal(wsum / span)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("events_time_weighted")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === want)
  }

  test("incremental rollup equals the full-history recompute") {
    // brute-force full aggregation with the same exact-decimal contract
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val want = evs.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      k -> ((rows.length.toLong,
        rows.map(e => BigDecimal(e._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
    }
    val got = SparkEntry.queries("events_incremental_rollup")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === want)
    // the merge actually exercised both sides of the cutoff
    assert(got.keys.exists(_._2 < "2024-01-20"))
    assert(got.keys.exists(_._2 >= "2024-01-20"))
  }

  test("snapshot diff emits exactly the keys whose latest version moved") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cutoffUs = java.time.LocalDateTime.parse("2024-01-20T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    def latest(rows: Seq[(Long, String, Long, Long)]): Option[Long] =
      rows.sortBy(e => (-e._4, -e._3)).headOption.map(_._3)
    val want = evs.groupBy(e => (e._1, e._2)).flatMap { case (k, rows) =>
      val nw = latest(rows).get
      val old = latest(rows.filter(_._4 < cutoffUs))
      if (old.contains(nw)) None
      else Some(k -> ((if (old.isEmpty) "insert" else "update", old, nw)))
    }
    val got = SparkEntry.queries("events_snapshot_diff")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4)))).toMap
    assert(got === want)
    // updates occur at this scale (inserts need a key born after the
    // cutoff — present at sf0.01+, not guaranteed in the tiny slice);
    // the change label always agrees with old-version presence
    assert(got.values.exists(_._1 == "update"))
    got.values.foreach { case (chg, old, _) =>
      assert((chg == "insert") === old.isEmpty)
    }
  }

  test("gap-fill interpolation replays brute-force with both edge rules") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .filter(col("value") > 300.0)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assume(evs.nonEmpty, "no high-value events in this slice")
    val daily = evs.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      k -> r6(rows.map(e => BigDecimal(e._3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / rows.length)
    }
    val allDays = {
      val ds = evs.map(_._2)
      val d0 = java.time.LocalDate.parse(ds.min)
      val d1 = java.time.LocalDate.parse(ds.max)
      Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(_.toString).toSeq
    }
    val want = evs.map(_._1).distinct.flatMap { ty =>
      val series = allDays.zipWithIndex.map { case (day, i) =>
        (day, i, daily.get((ty, day)))
      }
      series.map { case (day, i, v) =>
        val filled = v.getOrElse {
          val prev = series.take(i).reverse.find(_._3.isDefined)
          val next = series.drop(i + 1).find(_._3.isDefined)
          (prev, next) match {
            case (Some(p), Some(n)) => r6(p._3.get +
              (n._3.get - p._3.get) * (i - p._2).toDouble / (n._2 - p._2))
            case (Some(p), None) => p._3.get
            case (None, Some(n)) => n._3.get
            case _ => Double.NaN
          }
        }
        (ty, day) -> ((v.isDefined, filled))
      }
    }.toMap
    val got = SparkEntry.queries("events_gap_fill_interp")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getDouble(3)))).toMap
    assert(got === want)
  }

  test("daily ewma fills the calendar spine and replays brute-force") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = evs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val allDays = {
      val ds = evs.map(_._2)
      val d0 = java.time.LocalDate.parse(ds.min)
      val d1 = java.time.LocalDate.parse(ds.max)
      Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(_.toString).toSeq
    }
    val types = evs.map(_._1).distinct
    val want = types.flatMap { ty =>
      val series = allDays.map(day => (day, counts.getOrElse((ty, day), 0L)))
      series.indices.map { i =>
        val lags = (0 to 6).flatMap(j =>
          if (i - j >= 0) Some((1L << (6 - j)) * series(i - j)._2 ->
            (1L << (6 - j))) else None)
        val ewma = r6(lags.map(_._1).sum.toDouble / lags.map(_._2).sum.toDouble)
        (ty, series(i)._1) -> ((series(i)._2, ewma))
      }
    }.toMap
    val got = SparkEntry.queries("events_daily_ewma")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === want)
    // the spine is complete: |types| × |days| rows, gaps included
    assert(got.size === types.length * allDays.length)
  }
}

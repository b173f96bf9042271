package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOf

class AsOfJoinSpec extends SparkSpec {

  test("custom AsOfJoinExec equals the window formulation on events") {
    val viaCustom = SparkEntry.queries("events_asof_custom")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val viaWindow = SparkEntry.queries("events_asof_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaCustom === viaWindow)
  }

  test("the physical plan is the custom exec with one shuffle per side") {
    val df = SparkEntry.queries("events_asof_custom")(spark, sf)
    df.count() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("left rows without a prior right row keep nulls (left semantics)") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 150L, "v1"), (3L, 10L, "v3"))
      .toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // p1: t=100 before v1's 150 -> no match; p2: v1 matches; p3: key 2
    // has no right rows at all -> null.
    assert(got === Map("p1" -> null, "p2" -> "v1", "p3" -> null))
  }

  test("tolerance nulls matches older than the window, keeps in-window") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 300L, "p2"), (1L, 301L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "v1"), (1L, 250L, "v2")).toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", toleranceUs = Some(50L))
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // p1: v1 at gap 10 <= 50 → match; p2: latest is v2 at gap 50 → match
    // (boundary inclusive); p3: gap 51 → null even though v2 exists.
    assert(got === Map("p1" -> "v1", "p2" -> "v2", "p3" -> null))
  }

  test("tolerance(0) still matches equal timestamps") {
    import spark.implicits._
    val l = Seq((7L, 100L, "p")).toDF("k", "t", "tag")
    val r = Seq((7L, 40L, "old"), (7L, 100L, "exact"))
      .toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", toleranceUs = Some(0L))
      .select(col("r_tag")).head().getString(0)
    assert(got === "exact")
  }

  test("equal timestamps match (time <= semantics) and latest wins") {
    import spark.implicits._
    val l = Seq((7L, 100L, "p")).toDF("k", "t", "tag")
    val r = Seq((7L, 40L, "old"), (7L, 100L, "exact"))
      .toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t")
      .select(col("r_tag")).head().getString(0)
    assert(got === "exact")
  }

  test("mismatched pre-shuffle partition counts are re-aligned, not zipped") {
    import spark.implicits._
    // children arrive with 3 vs 7 partitions; the exec's required
    // ClusteredDistributions must force both sides onto one compatible
    // hash partitioning (the doExecute partition-count assertion would
    // fail loudly otherwise).
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag").repartition(3)
    val r = Seq((1L, 150L, "v1"), (3L, 10L, "v3"))
      .toDF("k", "t", "tag").repartition(7)
    val got = AsOf.asOfJoin(l, r, "k", "t")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(got === Map("p1" -> null, "p2" -> "v1", "p3" -> null))
  }

  test("null keys on either side never match") {
    import spark.implicits._
    val l = Seq((Option(5L), 100L, "p1"), (Option.empty[Long], 100L, "pnull"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(5L), 50L, "v1"), (Option.empty[Long], 10L, "vnull"))
      .toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(got === Map("p1" -> "v1", "pnull" -> null))
  }

  test("null left TIME values never match (no 0L unboxing fabrication)") {
    import spark.implicits._
    // without the t-null guard, tnull's time unboxes to 0L and the
    // tolerance check computes 0 - heldTime — with a right row at a
    // NEGATIVE time that would fabricate an in-window match
    val l = Seq((Option(5L), Option(100L), "p1"),
      (Option(5L), Option.empty[Long], "tnull")).toDF("k", "t", "tag")
    val r = Seq((Option(5L), Option(-10L), "v0"),
      (Option(5L), Option(50L), "v1")).toDF("k", "t", "tag")
    val plain = AsOf.asOfJoin(l, r, "k", "t")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(plain === Map("p1" -> "v1", "tnull" -> null))
    val tol = AsOf.asOfJoin(l, r, "k", "t", toleranceUs = Some(20L))
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // p1: held v1 at 50, gap 50 > 20 → null; tnull: guarded → null
    assert(tol === Map("p1" -> null, "tnull" -> null))
  }

  test("forward direction matches the next right row at-or-after") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 150L, "p2"), (1L, 200L, "p3"),
      (2L, 50L, "p4")).toDF("k", "t", "tag")
    val r = Seq((1L, 150L, "v1"), (1L, 180L, "v2"), (3L, 10L, "v3"))
      .toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", direction = "forward")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // p1: next is v1 (150 >= 100); p2: v1 matches EQUAL time and is
    // shared with p1 (cursor not consumed); p3: only v2 remains ahead;
    // p4: key 2 has no right rows.
    assert(got === Map("p1" -> "v1", "p2" -> "v1", "p3" -> null,
      "p4" -> null))
  }

  test("forward tolerance bounds the future window") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 160L, "p2")).toDF("k", "t", "tag")
    val r = Seq((1L, 180L, "v1")).toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", toleranceUs = Some(50L),
        direction = "forward")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // p1: gap 80 > 50 → null; p2: gap 20 → match
    assert(got === Map("p1" -> null, "p2" -> "v1"))
  }

  test("forward: null times and keys never match, null right time skipped") {
    import spark.implicits._
    val l = Seq((Option(5L), Option(100L), "p1"),
      (Option(5L), Option.empty[Long], "tnull"),
      (Option.empty[Long], Option(100L), "knull")).toDF("k", "t", "tag")
    val r = Seq((Option(5L), Option.empty[Long], "vnull"),
      (Option(5L), Option(120L), "v1")).toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", direction = "forward")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(got === Map("p1" -> "v1", "tnull" -> null, "knull" -> null))
  }

  test("forward equals a brute-force scan on the events slice") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = evs.filter(_._3 == "view")
    val want = evs.filter(_._3 == "purchase").map { p =>
      val nxt = views.filter(v => v._2 == p._2 && v._4 >= p._4)
        .sortBy(_._4).headOption
      p._1 -> nxt.map(v => (v._1, v._4 - p._4))
    }.toMap
    val got = SparkEntry.queries("events_asof_forward")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap
    assert(got === want)
    // the forward query actually matches something at this scale
    assert(got.values.exists(_.isDefined))
  }

  test("nearest picks the closer side, ties to backward") {
    import spark.implicits._
    val l = Seq((1L, 100L, "pB"),   // back v1@90 gap 10 < fwd v2@150 gap 50
      (1L, 140L, "pF"),             // back gap 50 > fwd gap 10
      (1L, 120L, "pT"),             // gap 30 both sides → backward v1
      (2L, 10L, "pOnlyF"),          // no backward row for key 2
      (3L, 99L, "pOnlyB"),          // no forward row for key 3
      (4L, 1L, "pNone")).toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "v1"), (1L, 150L, "v2"), (2L, 30L, "v3"),
      (3L, 50L, "v4")).toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", direction = "nearest")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(got === Map("pB" -> "v1", "pF" -> "v2", "pT" -> "v1",
      "pOnlyF" -> "v3", "pOnlyB" -> "v4", "pNone" -> null))
  }

  test("nearest tolerance bounds the absolute gap of the chosen side") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 140L, "p2")).toDF("k", "t", "tag")
    val r = Seq((1L, 60L, "v1"), (1L, 155L, "v2")).toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t", toleranceUs = Some(20L),
        direction = "nearest")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    // p1: nearest is v1 at gap 40 > 20 → null (even though v2 at 55 is
    // also out); p2: nearest is v2 at gap 15 → match
    assert(got === Map("p1" -> null, "p2" -> "v2"))
  }

  test("nearest equals a brute-force scan on the events slice") {
    val evs = graft.sources.Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = evs.filter(_._3 == "view")
    val want = evs.filter(_._3 == "purchase").map { p =>
      val back = views.filter(v => v._2 == p._2 && v._4 <= p._4)
        .sortBy(-_._4).headOption
      val fwd = views.filter(v => v._2 == p._2 && v._4 > p._4)
        .sortBy(_._4).headOption
      val m = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (p._4 - b._4 <= f._4 - p._4) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
      p._1 -> m.map(v => (v._1, p._4 - v._4))
    }.toMap
    val got = SparkEntry.queries("events_asof_nearest")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap
    assert(got === want)
    // some match resolved FORWARD (negative signed gap), or the
    // direction would be indistinguishable from backward here
    assert(got.values.flatten.exists(_._2 < 0))
  }

  test("null right TIME rows are skipped, not group-blocking") {
    import spark.implicits._
    // the null-time right row sorts FIRST in its key group (asc
    // nulls-first); it must be consumed past, or v1 behind it would
    // never be held and p1 would lose a valid match
    val l = Seq((Option(5L), Option(100L), "p1")).toDF("k", "t", "tag")
    val r = Seq((Option(5L), Option.empty[Long], "vnull"),
      (Option(5L), Option(50L), "v1")).toDF("k", "t", "tag")
    val got = AsOf.asOfJoin(l, r, "k", "t")
      .select(col("tag"), col("r_tag"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(got === Map("p1" -> "v1"))
  }
}

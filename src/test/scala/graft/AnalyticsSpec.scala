package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ntile quartiles are balanced within each segment") {
    val rows = q("win_ntile_dist")
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg((max(col("n")) - min(col("n"))).as("spread"))
      .collect()
    // ntile balances group sizes to within one row
    rows.foreach(r => assert(r.getLong(1) <= 1L, r.getString(0)))
  }

  test("percent_rank and cume_dist are in [0,1] with max 1") {
    val agg = q("win_ntile_dist")
      .agg(min(col("pct_rank")), max(col("pct_rank")),
        min(col("cume")), max(col("cume"))).head()
    assert(agg.getDouble(0) === 0.0)
    assert(agg.getDouble(1) === 1.0)
    assert(agg.getDouble(2) > 0.0)
    assert(agg.getDouble(3) === 1.0)
  }

  test("30-day range frame includes exactly the orders in the window") {
    val rows = q("win_frames")
      .select("o_orderkey", "o_custkey", "od", "spend_30d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).as("od"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byCust = orders.groupBy(_._2)
    rows.take(500).foreach { case (_, ck, od, spend) =>
      val expect = byCust(ck).filter(o => o._3 <= od && o._3 >= od - 30)
        .map(o => BigDecimal(o._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(math.abs(spend - expect) < 1e-6, s"cust $ck day $od")
    }
  }

  test("corr is in [-1,1]; covar matches a direct two-pass computation") {
    val rows = q("agg_corr_covar").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getDouble(3)
      assert(corr >= -1.0 && corr <= 1.0, r.getString(0))
    }
    // direct check on one group
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === rows.head.getString(0))
      .select(col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = li.length.toDouble
    val (sq, sp) = (li.map(_._1).sum, li.map(_._2).sum)
    val sqp = li.map(x => x._1 * x._2).sum
    val covar = (sqp - sq * sp / n) / (n - 1)
    assert(math.abs(rows.head.getDouble(2) - covar) < 1e-3)
  }

  test("max_by/min_by pick the customers holding the extreme balances") {
    val got = q("agg_minmax_by").collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_name", "c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1), r.getDouble(2)))
    got.foreach { r =>
      val nk = r.getAs[Number](0).longValue()
      val within = cust.filter(_._1 == nk)
      assert(r.getString(1) === within.maxBy(_._3)._2, s"richest nation $nk")
      assert(r.getString(2) === within.minBy(_._3)._2, s"poorest nation $nk")
    }
  }

  test("count_if + bool aggregates agree with direct filters") {
    val rows = q("agg_bool_countif").collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
    rows.foreach { r =>
      val et = r.getString(0)
      val over = ev.filter(col("event_type") === et && col("value") > 100.0).count()
      assert(r.getLong(2) === over, s"count_if $et")
    }
  }

  test("cross join emits |nation| x |region| rows") {
    assert(q("join_cross").count() === 25L * 5L)
  }

  test("unionByName null-fills the missing supplier column") {
    val df = q("union_by_name")
    val suppNull = df.filter(col("kind") === "supplier" &&
      col("acctbal").isNotNull).count()
    assert(suppNull === 0L)
    val custCnt = spark.read.parquet(s"$sf/customer.parquet").count()
    val supCnt = spark.read.parquet(s"$sf/supplier.parquet").count()
    assert(df.count() === custCnt + supCnt)
  }

  test("unpivot_long is the exact inverse of the pivot (incl zero-fill)") {
    val long = q("unpivot_long")
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(long.count() === users * 5)
    // non-zero rows match the raw groupBy counts
    val nz = long.filter(col("n") > 0)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id", "event_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(nz === raw)
  }

  test("moving median matches a JVM sliding-frame recompute") {
    val daily = graft.sources.Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = daily.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.collect {
        case i if i >= 6 =>
          val frame = sorted.slice(i - 6, i + 1).map(_._3).sorted
          (sorted(i)._1, sorted(i)._2) -> frame(3)
      }
    }.toMap
    val got = SparkEntry.queries("win_moving_median")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("mode and discrete median match a brute-force recompute") {
    val got = q("agg_mode_median").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byFlag = raw.groupBy(_._1)
    assert(got.keySet === byFlag.keySet)
    byFlag.foreach { case (flag, rows) =>
      val qs = rows.map(_._2)
      val counts = qs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // mode: max count, ties to the smallest value
      val mode = counts.toSeq.maxBy { case (v, c) => (c, -v) }
      val sorted = qs.sorted
      // discrete median: smallest value whose cumulative count reaches n/2
      val median = sorted((qs.size - 1) / 2)
      assert(got(flag) === ((mode._1, mode._2, median, qs.size.toLong)), flag)
    }
  }

  test("two-phase salted aggregation equals the unsalted groupBy") {
    val got = q("agg_salted_twophase").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("c"),
        count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === plain)
  }
}

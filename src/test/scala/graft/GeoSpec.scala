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
}

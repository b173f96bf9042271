package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §2.7) computing a 2-D extent + centroid
  * in one pass — the spatial summary arcpy users get from layer extents.
  *
  * Determinism: min/max are order-independent by nature; the centroid
  * numerators accumulate as exact long CENTIFEET (`round(ft*100)`) so
  * the merge tree's shape cannot change the result — the same contract
  * as [[XF.dsum]], expressible in oracle SQL as
  * `SUM(CAST(round(x*100) AS BIGINT))`. One final double division.
  */
object ExtentAgg extends Aggregator[(Double, Double), ExtentBuf, Extent] {

  override def zero: ExtentBuf =
    ExtentBuf(Double.MaxValue, Double.MinValue, Double.MaxValue,
      Double.MinValue, 0L, 0L, 0L)

  override def reduce(b: ExtentBuf, p: (Double, Double)): ExtentBuf =
    ExtentBuf(
      math.min(b.minX, p._1), math.max(b.maxX, p._1),
      math.min(b.minY, p._2), math.max(b.maxY, p._2),
      b.sx + math.round(p._1 * 100.0), b.sy + math.round(p._2 * 100.0),
      b.n + 1)

  override def merge(a: ExtentBuf, b: ExtentBuf): ExtentBuf =
    ExtentBuf(
      math.min(a.minX, b.minX), math.max(a.maxX, b.maxX),
      math.min(a.minY, b.minY), math.max(a.maxY, b.maxY),
      a.sx + b.sx, a.sy + b.sy, a.n + b.n)

  override def finish(b: ExtentBuf): Extent =
    Extent(b.minX, b.maxX, b.minY, b.maxY,
      b.sx.toDouble / 100.0 / b.n, b.sy.toDouble / 100.0 / b.n, b.n)

  override def bufferEncoder: Encoder[ExtentBuf] = Encoders.product[ExtentBuf]
  override def outputEncoder: Encoder[Extent] = Encoders.product[Extent]
}

case class ExtentBuf(minX: Double, maxX: Double, minY: Double,
                     maxY: Double, sx: Long, sy: Long, n: Long)

case class Extent(min_x: Double, max_x: Double, min_y: Double,
                  max_y: Double, centroid_x: Double, centroid_y: Double,
                  n_points: Long)

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Mergeable COUNT-MIN sketch over a long key column
  * (SURVEY.md §2.7 custom-Aggregator tier) — the heavy-hitter frequency
  * summary a 100 TB pipeline keeps when exact per-key counts are too
  * wide to materialize: partials are fixed Depth×Width cell grids that
  * merge by elementwise addition (associative + commutative, so the
  * merge tree's shape cannot change the result), and any key's count is
  * over-estimated by at most ~e·N/Width with high probability, never
  * under-estimated (Cormode & Muthukrishnan, J.Algorithms 55(1)).
  *
  * The row hashes are (a·v + b) mod p mod w with p = 2^31−1 and fixed
  * constants — chosen so the SAME formula runs overflow-free in both the
  * JVM reduce loop and ANSI-mode Column arithmetic ([[CountMin.slotCol]]
  * is the lookup-side twin of [[CountMin.slot]]): (v mod p)·a < 2^62.
  */
object CountMin {
  val Depth = 4
  val Width = 512

  private val P = 2147483647L // 2^31 − 1 (prime)
  private val As = Array(1103515245L, 214013L, 69069L, 1664525L)
  private val Bs = Array(12345L, 2531011L, 362437L, 1013904223L)

  /** Cell column (within row `row`) for key `v` — JVM side. floorMod
    * keeps negative keys in [0, P): plain `%` would return a negative
    * remainder and index outside (or into the WRONG row of) the grid.
    */
  def slot(row: Int, v: Long): Int =
    (((Math.floorMod(v, P) * As(row) + Bs(row)) % P) % Width).toInt

  /** The same hash as a Column expression (estimate lookup side);
    * `pmod` is the Column twin of floorMod.
    */
  def slotCol(row: Int, v: Column): Column =
    ((pmod(v, lit(P)) * As(row) + Bs(row)) % P) % Width

  /** Point estimate for key `v` from a finished sketch's `cells` array:
    * min over the Depth row counters (1-based element_at).
    */
  def estimateCol(cells: Column, v: Column): Column =
    least((0 until Depth).map(r =>
      element_at(cells,
        (lit(r * Width) + slotCol(r, v) + lit(1)).cast(IntegerType))): _*)
}

case class CmsBuf(cells: Array[Long])

object CountMinAgg extends Aggregator[Long, CmsBuf, CmsBuf] {
  import CountMin._

  override def zero: CmsBuf = CmsBuf(new Array[Long](Depth * Width))

  override def reduce(b: CmsBuf, v: Long): CmsBuf = {
    var r = 0
    while (r < Depth) { b.cells(r * Width + slot(r, v)) += 1L; r += 1 }
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
    a
  }

  override def finish(b: CmsBuf): CmsBuf = b

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
}

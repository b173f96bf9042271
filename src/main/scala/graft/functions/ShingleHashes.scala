package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting the DISTINCT 32-bit shingle hashes of a
  * space-tokenized text: one output row per distinct k-token shingle,
  * hash = first 8 hex chars of md5(shingle) parsed base-16 (identical to
  * [[XF.h32]] / its DuckDB twin, so oracle queries reproduce it).
  *
  * This replaces the built-in composition
  * `explode(array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i, k)))))`, which evaluates four interpreted
  * higher-order lambdas and allocates a slice array PER SHINGLE —
  * measured ~5x slower than this single per-row loop. Generators run
  * once per input row (GenerateExec), so plain JVM code here costs one
  * virtual call per document, not per token.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("s", LongType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // limit -1 keeps trailing empty tokens — matching Spark SQL's
    // split() and DuckDB's string_split (the char-overload drops them)
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < k) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
      toks.length - k + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // first 4 md5 bytes as unsigned big-endian = first 8 hex chars
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      if (seen.add(h)) out += InternalRow(h)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graft.bridge.{column, expression}
  def apply(text: Column, k: Int): Column =
    column(new ShingleHashes(expression(text), k))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen array kernels for the similarity/dedup hot path.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0, _+_)` is
  * semantically right but physically wrong at scale: higher-order
  * functions interpret their lambda per element and `zip_with`
  * materializes an intermediate array per row. These expressions compile
  * to a tight scalar loop inside whole-stage codegen — no allocation, no
  * virtual calls — which is what a 100-TB ANN scan needs.
  */
object ArrayExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Exact integer dot product of two BIGINT arrays. */
  def longDot(a: Column, b: Column): Column =
    column(LongDot(expression(a), expression(b)))

  /** Float-array cosine in one fused pass (library API; oracle-compared
    * queries use the quantized-integer path instead, see
    * [[graft.ops.Dedup]] determinism notes).
    */
  def floatCosine(a: Column, b: Column): Column =
    column(FloatCosine(expression(a), expression(b)))

  /** Quantize-and-dot in one fused pass: Σ floor(aᵢ·2²⁰)·floor(bᵢ·2²⁰)
    * over two FLOAT arrays. Equals `longDot(qvec(a), qvec(b))` without
    * ever materializing the quantized long arrays — embeddings stay
    * float through the whole plan (half the shuffle bytes) and the
    * interpreted `transform` lambda disappears from the hot path.
    */
  def quantDot(a: Column, b: Column): Column =
    column(QuantDot(expression(a), expression(b)))

  /** Duplicated-k-gram instance fraction of a token array in ONE fused
    * pass (the Gopher repetition statistic behind
    * `text_dup_ngram_mass`): fraction of the m−k+1 k-gram instances
    * whose gram occurs ≥ 2× within the array.
    */
  def dupGramFrac(tokens: Column, k: Int): Column =
    column(DupGramFrac(expression(tokens), k))

  /** |a ∩ b| of two ascending-sorted distinct BIGINT arrays — the
    * two-pointer set-similarity verification kernel.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}

/** dot(a, b) over ArrayType(LongType) — exact, overflow-free for the
  * |x| <= 2^21 quantized range (20 fractional bits + sign), 64 elements.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) over ArrayType(FloatType): fused dot + norms, one pass,
  * double accumulators. NaN when either norm is zero (matches the
  * mathematical domain; callers filter zero vectors).
  */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_float_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = (double) $a.getFloat($i);
         |  double yv = (double) $b.getFloat($i);
         |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused quantize+dot over two ArrayType(FloatType) columns:
  * Σ floor(aᵢ·2²⁰)·floor(bᵢ·2²⁰), exact BIGINT accumulation.
  *
  * Bit-identical to the two-step `qvec` → `LongDot` path (floor on the
  * double-widened float is the same operation DuckDB's
  * `list_transform(... floor(CAST(x AS DOUBLE) * 1048576.0) ...)` oracle
  * performs). Overflow-free for |x| ≤ 2 (|q| ≤ 2²¹, 64-element dim:
  * Σ ≤ 2⁴⁸). Array elements are assumed non-null (embedding vectors);
  * a null ARRAY yields null via nullSafeEval.
  */
case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quant_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(x.getFloat(i).toDouble * 1048576.0).toLong *
        math.floor(y.getFloat(i).toDouble * 1048576.0).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qa = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0);
         |  long $qb = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0);
         |  $acc += $qa * $qb;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Duplicated-k-gram instance fraction over ArrayType(StringType) — the
  * Gopher-style within-document repetition statistic as ONE tight JVM
  * loop: 64-bit XXH64 token hashes, FNV-combined k-gram keys, sort,
  * run-length count of instances in ≥2 runs, divided by m−k+1. Returns
  * 0.0 when fewer than k tokens (no instances).
  *
  * Why a native Expression: the built-in formulation (zip_with shifted
  * slices + a run-length aggregate() over the sorted hash array) is
  * semantically identical but interpreted — lambdas evaluate per
  * element, no whole-stage codegen, and every expression-tree
  * occurrence re-evaluates its chain (measured ~0.4 ms/row; this
  * kernel is the same answer at a ~10× lower constant with zero
  * intermediate arrays beyond the two hash buffers).
  *
  * Hash-collision note: gram keys are 64-bit mixes of 64-bit token
  * hashes, so a false duplicate within a document needs a ~2⁻⁶⁴·m²
  * event — the DuckDB oracle groups RAW gram strings, so a collision
  * would surface as a hash mismatch, not pass silently.
  */
case class DupGramFrac(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dup_gram_frac"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    DupGramFrac.compute(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DupGramFrac.compute($a, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object DupGramFrac {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** The shared interpreted/codegen kernel (static-forwarder-callable
    * from generated Java). Null tokens hash as the empty string.
    */
  def compute(arr: ArrayData, k: Int): Double = {
    val m = arr.numElements()
    val g = m - k + 1
    if (g <= 0) return 0.0
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      th(i) =
        if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
      i += 1
    }
    val gh = new Array[Long](g)
    i = 0
    while (i < g) {
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var j = 0
      while (j < k) { h = (h ^ th(i + j)) * 1099511628211L; j += 1 }
      // final avalanche (Murmur3 fmix64)
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      gh(i) = h
      i += 1
    }
    java.util.Arrays.sort(gh)
    var dup = 0
    var run = 1
    i = 1
    while (i <= g) {
      if (i < g && gh(i) == gh(i - 1)) run += 1
      else { if (run >= 2) dup += run; run = 1 }
      i += 1
    }
    dup.toDouble / g.toDouble
  }
}

/** |a ∩ b| over two ASCENDING-SORTED array<bigint> columns — the
  * set-similarity verification kernel (Jaccard / containment / S-curve
  * calibration): one two-pointer merge pass, no hash set, no
  * intermediate array. The built-in `size(array_intersect(a, b))`
  * allocates and probes a hash set per pair; over PPJoin candidate
  * volumes the merge is the shape that survives 100 TB verification.
  *
  * Input contract: both arrays sorted ascending with distinct elements
  * (the `array_sort(collect_set(...))` doc-set artifact). VALIDATED
  * while scanning — an unsorted input throws rather than silently
  * undercounting (the loud-failure discipline; the check is a
  * predictable branch on data already in registers).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  private def unsorted(): Nothing = throw new IllegalArgumentException(
    "graft_sorted_intersect_count: input array not sorted " +
      "strictly ascending (sorted + distinct elements required)")

  /** Two-pointer merge intersection count with in-scan STRICT-order
    * validation (shared by the interpreted and codegen paths). The
    * check enforces the FULL input contract — sorted ascending AND
    * distinct — because a duplicated element silently changes the
    * semantics (the merge counts duplicate matches, overcounting
    * relative to set-intersection). The strict comparison applies
    * only from each array's second element on (`i > 0` / `j > 0`),
    * so Long.MinValue is a legal first element.
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0L
    var pa = Long.MinValue; var pb = Long.MinValue
    while (i < na && j < nb) {
      val xa = a.getLong(i); val xb = b.getLong(j)
      if ((i > 0 && xa <= pa) || (j > 0 && xb <= pb)) unsorted()
      if (xa == xb) { cnt += 1; pa = xa; pb = xb; i += 1; j += 1 }
      else if (xa < xb) { pa = xa; i += 1 }
      else { pb = xb; j += 1 }
    }
    // the merge can exit before visiting every element — finish the
    // order scan over both tails so an invalid input ALWAYS throws
    // (exactly one full pass of each array in total)
    while (i < na) {
      val xa = a.getLong(i)
      if (i > 0 && xa <= pa) unsorted()
      pa = xa; i += 1
    }
    while (j < nb) {
      val xb = b.getLong(j)
      if (j > 0 && xb <= pb) unsorted()
      pb = xb; j += 1
    }
    cnt
  }
}

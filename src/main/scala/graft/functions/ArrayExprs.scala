package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

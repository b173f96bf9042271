package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.functions.ArrayExprs

/** Property-based tests (ScalaCheck, fixed seed — fully deterministic)
  * for the hand-rolled Catalyst kernels. Example-based specs pin known
  * values (ArrayExprsSpec); these pin the ALGEBRA over arbitrary inputs,
  * and — the Spark-specific bug class — that the whole-stage-codegen
  * path (`doGenCode`, exercised through a DataFrame) computes exactly
  * what the interpreted path (`nullSafeEval`, exercised through scalar
  * reference reimplementations here) computes: the two are separate
  * implementations of every kernel and can silently drift.
  */
class KernelPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(Seed(0xC0FFEEL))

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // reference (third) implementations, deliberately written differently
  private def refLongDot(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def refQuant(v: Float): Long =
    math.floor(v.toDouble * 1048576.0).toLong
  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = a.take(b.length).map(x => x.toDouble * x.toDouble).sum
    val nb = b.take(a.length).map(y => y.toDouble * y.toDouble).sum
    dot / math.sqrt(na * nb)
  }

  // quantized-range inputs: |x| ≤ 2^21 per element (the documented
  // overflow-free domain), lengths 0-64, possibly unequal
  private val longVec: Gen[List[Long]] = for {
    n <- Gen.choose(0, 64)
    xs <- Gen.listOfN(n, Gen.choose(-(1L << 21), 1L << 21))
  } yield xs
  private val floatVec: Gen[List[Float]] = for {
    n <- Gen.choose(0, 64)
    xs <- Gen.listOfN(n, Gen.choose(-2.0f, 2.0f))
  } yield xs
  private val floatVecNZ: Gen[List[Float]] = floatVec
    .map(xs => if (xs.exists(_ != 0.0f)) xs else List(1.0f))

  /** Run a batch of input pairs through the codegen path of `kernel`
    * (DataFrame projection — whole-stage codegen compiles doGenCode)
    * and return the outputs in input order.
    */
  private def viaCodegen[T](pairs: Seq[(Seq[T], Seq[T])], elem: DataType,
      kernel: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Array[Any] = {
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("a", ArrayType(elem, containsNull = false)),
      StructField("b", ArrayType(elem, containsNull = false))))
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => Row(i, a, b) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      .select(col("i"), kernel(col("a"), col("b")).as("v"))
      .orderBy(col("i")).collect().map(_.get(1))
  }

  test("LongDot: codegen == reference over the quantized domain") {
    val pairs = Gen.listOfN(300, Gen.zip(longVec, longVec))
      .apply(Gen.Parameters.default, Seed(1L)).get
    val got = viaCodegen(pairs, LongType, ArrayExprs.longDot)
    pairs.zip(got).foreach { case ((a, b), v) =>
      val n = math.min(a.length, b.length)
      assert(v === refLongDot(a.take(n), b.take(n)))
    }
  }

  test("QuantDot: codegen == floor-quantize-then-dot reference") {
    val pairs = Gen.listOfN(300, Gen.zip(floatVec, floatVec))
      .apply(Gen.Parameters.default, Seed(2L)).get
    val got = viaCodegen(pairs, FloatType, ArrayExprs.quantDot)
    pairs.zip(got).foreach { case ((a, b), v) =>
      val n = math.min(a.length, b.length)
      assert(v === refLongDot(a.take(n).map(refQuant), b.take(n).map(refQuant)))
    }
  }

  test("FloatCosine: codegen == reference, and bounded when defined") {
    val pairs = Gen.listOfN(300, Gen.zip(floatVecNZ, floatVecNZ))
      .apply(Gen.Parameters.default, Seed(3L)).get
    val got = viaCodegen(pairs, FloatType, ArrayExprs.floatCosine)
    pairs.zip(got).foreach { case ((a, b), v) =>
      val d = v.asInstanceOf[Double]
      val ref = refCosine(a, b)
      if (ref.isNaN) assert(d.isNaN)
      else {
        assert(d === ref) // same double ops in same order — exact
        assert(d >= -1.0000001 && d <= 1.0000001)
      }
    }
  }

  test("QuantDot(a, a) via codegen is the non-negative exact square sum") {
    val vecs = Gen.listOfN(200, floatVec)
      .apply(Gen.Parameters.default, Seed(6L)).get
    val got = viaCodegen(vecs.map(v => (v, v)), FloatType, ArrayExprs.quantDot)
    vecs.zip(got).foreach { case (a, v) =>
      val sq = a.map(refQuant).map(x => x * x).sum
      assert(v === sq)
      assert(v.asInstanceOf[Long] >= 0L)
    }
  }

  test("LongDot is symmetric and linear in its first argument (scalacheck)") {
    check("longdot-algebra") {
      Prop.forAll(longVec, longVec) { (a, b) =>
        val n = math.min(a.length, b.length)
        val (x, y) = (a.take(n), b.take(n))
        refLongDot(x, y) == refLongDot(y, x) &&
          refLongDot(x.map(_ * 2L), y) == 2L * refLongDot(x, y)
      }
    }
  }

  test("quantization error bound: |cosine(quant) - cosine(float)| small") {
    // the determinism contract (ops/Dedup.scala quantized scheme) only
    // helps if the quantized ranking tracks the float one; 2^-20 per
    // element over unit-scale 64-dim vectors keeps the cosine within 1e-4
    val pairs = Gen.listOfN(200,
        Gen.zip(floatVecNZ.suchThat(_.nonEmpty), floatVecNZ.suchThat(_.nonEmpty)))
      .apply(Gen.Parameters.default, Seed(4L)).get
    pairs.foreach { case (a0, b0) =>
      val n = math.max(a0.length, b0.length)
      val a = a0.padTo(n, 0.0f); val b = b0.padTo(n, 0.0f)
      val qa = a.map(refQuant); val qb = b.map(refQuant)
      val qna = math.sqrt(refLongDot(qa, qa).toDouble)
      val qnb = math.sqrt(refLongDot(qb, qb).toDouble)
      if (qna > 1024 && qnb > 1024) { // skip near-zero vectors (quantization dominates)
        val qcos = refLongDot(qa, qb).toDouble / (qna * qnb)
        val fcos = refCosine(a, b)
        assert(math.abs(qcos - fcos) < 1e-4,
          s"quantized cosine drifted: $qcos vs $fcos")
      }
    }
  }

  test("h32: Spark column path == local MD5 reference on arbitrary strings") {
    import spark.implicits._
    val strs = Gen.listOfN(300, Gen.asciiPrintableStr)
      .apply(Gen.Parameters.default, Seed(5L)).get.distinct
    val got = strs.toDF("s")
      .select(col("s"), graft.functions.XF.h32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    strs.foreach { s =>
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val ref = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      assert(got(s) === ref, s"h32 mismatch for '$s'")
    }
  }

  test("DupGramFrac: codegen == raw-string gram-count reference") {
    // reference works on the RAW GRAM STRINGS (no hashing at all), so a
    // kernel hash collision or run-length slip cannot cancel out
    def refFrac(ws: Seq[String], k: Int): Double = {
      val grams = ws.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) 0.0
      else {
        val cnt = grams.groupBy(identity).view.mapValues(_.size)
        cnt.values.filter(_ >= 2).sum.toDouble / grams.size
      }
    }
    // small vocab forces real duplicate structure; lengths 0-40
    val tokGen: Gen[List[String]] = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "x y", ""))
    } yield xs
    val docs = Gen.listOfN(300, tokGen)
      .apply(Gen.Parameters.default, Seed(4L)).get
    for (k <- Seq(2, 3)) {
      val schema = StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("ws", ArrayType(StringType, containsNull = false))))
      val rows = docs.zipWithIndex.map { case (ws, i) => Row(i, ws) }
      val got = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), schema)
        .select(col("i"), ArrayExprs.dupGramFrac(col("ws"), k).as("v"))
        .orderBy(col("i")).collect().map(_.getDouble(1))
      docs.zip(got).foreach { case (ws, v) =>
        assert(math.abs(v - refFrac(ws, k)) < 1e-12,
          s"k=$k ws=${ws.take(8)}...")
      }
    }
    // the interpreted path (nullSafeEval) computes the same value
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    docs.take(50).foreach { ws =>
      val ad = ArrayData.toArrayData(
        ws.map(UTF8String.fromString).toArray)
      assert(math.abs(graft.functions.DupGramFrac.compute(ad, 2) -
        refFrac(ws, 2)) < 1e-12)
    }
  }

  test("SortedIntersectCount: codegen == set intersection; unsorted fails loudly") {
    // sorted-distinct arrays over a small value domain → real overlap
    val sortedVec: Gen[List[Long]] = for {
      n <- Gen.choose(0, 50)
      xs <- Gen.listOfN(n, Gen.choose(0L, 80L))
    } yield xs.distinct.sorted
    val pairs = Gen.listOfN(300, Gen.zip(sortedVec, sortedVec))
      .apply(Gen.Parameters.default, Seed(5L)).get
    val got = viaCodegen(pairs, LongType, ArrayExprs.sortedIntersectCount)
    pairs.zip(got).foreach { case ((a, b), v) =>
      assert(v === (a.toSet intersect b.toSet).size.toLong,
        s"a=${a.take(8)} b=${b.take(8)}")
    }
    // the in-scan sortedness validation throws instead of undercounting
    import org.apache.spark.sql.catalyst.util.ArrayData
    val bad = ArrayData.toArrayData(Array(5L, 3L, 4L))
    val ok = ArrayData.toArrayData(Array(3L, 4L, 5L))
    intercept[IllegalArgumentException] {
      graft.functions.SortedIntersectCount.compute(bad, ok)
    }
    assert(graft.functions.SortedIntersectCount.compute(ok, ok) === 3L)
    // round 9: the check enforces the FULL contract — sorted AND
    // distinct. A duplicated element would silently overcount vs
    // set-intersection semantics, so it throws too...
    val dup = ArrayData.toArrayData(Array(3L, 3L, 5L))
    intercept[IllegalArgumentException] {
      graft.functions.SortedIntersectCount.compute(dup, ok)
    }
    intercept[IllegalArgumentException] {
      graft.functions.SortedIntersectCount.compute(ok, dup)
    }
    // ... including when the duplicate sits past the merge exit, in
    // the tail-scan region
    val dupTail = ArrayData.toArrayData(Array(9L, 11L, 11L))
    intercept[IllegalArgumentException] {
      graft.functions.SortedIntersectCount.compute(
        ArrayData.toArrayData(Array(1L)), dupTail)
    }
    // ... while Long.MinValue stays legal as a FIRST element
    val minFirst = ArrayData.toArrayData(Array(Long.MinValue, 3L))
    assert(graft.functions.SortedIntersectCount.compute(minFirst, ok) === 1L)
  }
}

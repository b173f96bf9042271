package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayExprs

class ArrayExprsSpec extends SparkSpec {

  test("LongDot equals the higher-order-function formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((
      Seq.fill(64)(rnd.nextLong() % 1000000L),
      Seq.fill(64)(rnd.nextLong() % 1000000L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      ArrayExprs.longDot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("ref"))
    assert(got.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("LongDot runs inside whole-stage codegen on a parquet scan") {
    // a LocalRelation would be constant-folded at plan time; a file scan
    // forces a real codegen stage around the expression.
    val q = graft.ops.Dedup.qEmb(spark, sf)
      .select(col("vec_id"), col("n2"))
    assert(q.count() > 0)
    // "*(n)" marks a WholeStageCodegen stage in the plan rendering; the
    // kernel's Project must carry it.
    val plan = q.queryExecution.executedPlan.toString
    val dotLine = plan.linesIterator.find(_.contains("graft_long_dot"))
    assert(dotLine.exists(_.contains("*(")), plan)
  }

  test("QuantDot equals the two-step qvec -> LongDot formulation") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(
        ArrayExprs.quantDot(col("a.embedding"), col("b.embedding")).as("fused"),
        graft.functions.ArrayExprs.longDot(
          graft.ops.Dedup.qvec(col("a.embedding")),
          graft.ops.Dedup.qvec(col("b.embedding"))).as("twostep"))
    assert(pairs.filter(col("fused") =!= col("twostep")).count() === 0)
  }

  test("FloatCosine matches a plain-JVM cosine") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = Array.fill(32)(rnd.nextFloat() - 0.5f)
    val b = Array.fill(32)(rnd.nextFloat() - 0.5f)
    def cosJvm: Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (k <- a.indices) {
        d += a(k).toDouble * b(k); na += a(k).toDouble * a(k)
        nb += b(k).toDouble * b(k)
      }
      d / math.sqrt(na * nb)
    }
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(ArrayExprs.floatCosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - cosJvm) < 1e-12)
  }

  test("kernels are SQL-callable via GraftExtensions registration") {
    import spark.implicits._
    Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .createOrReplaceTempView("dot_in")
    val viaSql = spark.sql("SELECT graft_long_dot(a, b) FROM dot_in")
      .head().getLong(0)
    assert(viaSql === 11L)
  }

  test("null inputs propagate to null output") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("a", "b")
      .select(ArrayExprs.longDot(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }
}

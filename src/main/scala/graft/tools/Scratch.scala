package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Ad-hoc timing experiments (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("32")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val ws = split(col("text"), " ")
    def sh = t(spark, sf, "documents")
      .filter(size(ws) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(0), size(ws) - 3),
          i => concat_ws(" ", slice(ws, i + lit(1), lit(3)))))).as("s"))

    time("warmup")(t(spark, sf, "documents").queryExecution.toRdd.count())
    time("shingleDf")(sh.queryExecution.toRdd.count())
    time("shingle-freq")(sh.groupBy(col("s")).count().queryExecution.toRdd.count())
    time("docSets")(sh.groupBy(col("doc_id"))
      .agg(collect_set(col("s")).as("ss"), count(lit(1)).as("n"))
      .queryExecution.toRdd.count())
    time("naive-invidx-pairs")(
      sh.select(col("doc_id").as("i"), col("s"))
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
        .queryExecution.toRdd.count())
    time("full-query")(
      graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}

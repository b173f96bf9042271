package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  test("stubDecode is deterministic and unit-ranged") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val a = Multimodal.stubDecode(payload)
    val b = Multimodal.stubDecode(payload)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
    assert(a.forall(f => f >= 0f && f < 1f))
  }

  test("decodeFeatures preserves rows and emits the declared schema") {
    val media = Multimodal.media(spark, sf)
    val out = Multimodal.decodeFeatures(media)
    assert(out.schema === StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false)))))
    assert(out.count() === media.count())
    val row = out.orderBy(col("doc_id")).head()
    assert(row.getSeq[Float](1).length === 8)
  }

  test("frame sampling never materializes skipped frames") {
    val out = graft.SparkEntry.queries("mm_frame_sample")(spark, sf)
    val frames = out.select(col("frame_no")).distinct()
      .collect().map(_.getLong(0))
    assert(frames.forall(_ % 4 === 0))
  }

  test("media metadata mime partition is total") {
    val counts = Multimodal.media(spark, sf)
      .groupBy(col("mime")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("image/png", "audio/wav", "video/mp4")))
    assert(counts.values.sum ===
      spark.read.parquet(s"$sf/documents.parquet").count())
  }
}

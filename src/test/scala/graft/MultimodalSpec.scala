package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing: schema, per-partition decode, frame sampling,
  * metadata pruning — with the stub decoder standing in for real codecs.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "img-one".getBytes("UTF-8"), Row("png", 640, 480, 0L)),
      Row(2L, "img-one".getBytes("UTF-8"), Row("png", 640, 480, 0L)), // same bytes
      Row(3L, "vid".getBytes("UTF-8"), Row("mp4", 1920, 1080, 2500L)),
      Row(4L, null, Row("png", 100, 100, 0L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("extractFeatures: fixed-dim vectors, deterministic per content, null-safe") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 8)
    assert(out.schema("features").dataType.typeName == "array")
    val feats = out.select($"media_id", $"features").as[(Long, Option[Seq[Float]])]
      .collect().toMap
    assert(feats(1L).get.size == 8)
    assert(feats(1L) == feats(2L)) // same bytes → same features
    assert(feats(3L) != feats(1L))
    assert(feats(4L).isEmpty) // null content → null features, no crash
  }

  test("extractFeatures preserves partitioning (no shuffle in the plan)") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"unexpected shuffle:\n$plan")
    assert(out.rdd.getNumPartitions == mediaDf.rdd.getNumPartitions)
  }

  test("sampleFrames: one row per offset, zero-duration rows dropped") {
    val out = Multimodal.sampleFrames(mediaDf, everyMs = 1000)
      .select($"media_id", $"frame_ms").as[(Long, Long)].collect().toSet
    assert(out == Set((3L, 0L), (3L, 1000L), (3L, 2000L)))
  }

  test("filterByMeta prunes without reading content") {
    val out = Multimodal.filterByMeta(mediaDf, "png", minWidth = 200)
    assert(out.select("media_id").as[Long].collect().toSeq == Seq(1L, 2L))
  }

  test("features feed the vector ops end-to-end (multimodal → ANN path)") {
    val out = Multimodal.extractFeatures(mediaDf.filter($"content".isNotNull), dim = 8)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val qv = out.filter($"vec_id" === 1).select($"embedding".as("__qv"))
    val topk = graft.functions.VectorOps
      .bruteForceTopK(out, "embedding", "vec_id", qv, k = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(topk.toSet == Set(1L, 2L)) // identical content ranks together
  }
}

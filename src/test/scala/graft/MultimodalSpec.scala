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

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // the canonical 67-byte 1x1 transparent PNG — a complete real file
  private val png1x1 = hx(
    "89504E470D0A1A0A0000000D4948445200000001000000010806000000" +
      "1F15C4890000000A49444154789C63000100000500010D0A2DB4" +
      "0000000049454E44AE426082")
  // real JPEG header: SOI, 16-byte APP0/JFIF, a COM segment ("hello"),
  // then SOF0 with height 256, width 200 — the parser must SCAN past two
  // variable-length segments to find it
  private val jpeg256x200 = hx(
    "FFD8" + "FFE000104A46494600010100000100010000" +
      "FFFE000768656C6C6F" +
      "FFC00011" + "08" + "0100" + "00C8" + "03011100021101031101")
  private val gif3x5 = hx("474946383961" + "0300" + "0500" + "F7000000")

  test("ImageHeaders parses real PNG/JPEG/GIF bytes; total on garbage") {
    assert(Multimodal.ImageHeaders.parse(png1x1) == (("png", 1, 1)))
    assert(Multimodal.ImageHeaders.parse(jpeg256x200) == (("jpeg", 200, 256)))
    assert(Multimodal.ImageHeaders.parse(gif3x5) == (("gif", 3, 5)))
    // GIF87a variant
    assert(Multimodal.ImageHeaders.parse(hx("474946383761" + "1000" + "2000"))
      == (("gif", 16, 32)))
    assert(Multimodal.ImageHeaders.parse(null) == (("unknown", -1, -1)))
    assert(Multimodal.ImageHeaders.parse(Array.empty[Byte]) == (("unknown", -1, -1)))
    assert(Multimodal.ImageHeaders.parse(hx("DEADBEEF")) == (("unknown", -1, -1)))
    // truncations: PNG signature alone, JPEG SOI+APP0 marker alone — the
    // parser must fall through to unknown, never throw
    assert(Multimodal.ImageHeaders.parse(hx("89504E470D0A1A0A")) == (("unknown", -1, -1)))
    assert(Multimodal.ImageHeaders.parse(hx("FFD8FFE0")) == (("unknown", -1, -1)))
  }

  test("decodeImageMeta: distributed decode, partition-preserving, null-safe") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    val rows = Seq(Row(1L, png1x1), Row(2L, jpeg256x200), Row(3L, gif3x5),
      Row(4L, "not an image".getBytes("UTF-8")), Row(5L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Multimodal.decodeImageMeta(df)
    assert(!out.queryExecution.executedPlan.toString.toLowerCase.contains("exchange"))
    val got = out.select($"media_id", $"fmt", $"width", $"height")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "png", 1L, 1L),
      (2L, "jpeg", 200L, 256L),
      (3L, "gif", 3L, 5L),
      (4L, "unknown", -1L, -1L),
      (5L, "unknown", -1L, -1L)))
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

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

  test("AudioHeaders parses real WAV chunk lists; total on garbage") {
    // canonical 44-byte mono 8kHz 16-bit PCM header, 4 data bytes:
    // byteRate 16000, dataSize 4 → duration 0 ms
    val wav = hx("52494646" + "28000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "04000000" + "AABBCCDD")
    assert(Multimodal.AudioHeaders.parse(wav) == (("wav", 1, 8000L, 0L)))
    // stereo 16kHz with a LIST chunk BEFORE fmt — scan order independence;
    // dataSize 64000 = exactly 1 s at byteRate 64000
    val wav2 = hx("52494646" + "00000000" + "57415645" +
      "4C495354" + "04000000" + "494E464F" +
      "666D7420" + "10000000" + "0100" + "0200" + "803E0000" + "00FA0000" + "0400" + "1000" +
      "64617461" + "00FA0000")
    assert(Multimodal.AudioHeaders.parse(wav2) == (("wav", 2, 16000L, 1000L)))
    assert(Multimodal.AudioHeaders.parse(hx("DEADBEEF")) == (("unknown", -1, -1L, -1L)))
    assert(Multimodal.AudioHeaders.parse(null) == (("unknown", -1, -1L, -1L)))
    // RIFF but not WAVE (an AVI) → unknown
    assert(Multimodal.AudioHeaders.parse(
      hx("52494646" + "00000000" + "41564920")) == (("unknown", -1, -1L, -1L)))
  }

  test("VideoHeaders walks ISO-BMFF boxes to mvhd; v0 and v1; total on garbage") {
    def mvhdV0(ts: Long, dur: Long): String = {
      val tail = "00010000" + "0100" + "0" * 20 + "0" * 72 + "0" * 48 + "00000002"
      f"0000006C6D766864" + "00000000" + "00000000" + "00000000" +
        f"$ts%08X" + f"$dur%08X" + tail
    }
    // ftyp + free + moov>mvhd v0: timescale 600, duration 1200 units → 2000 ms
    val mp4 = hx("0000001066747970" + "69736F6D" + "00000000" +
      "0000000866726565" + "000000746D6F6F76" + mvhdV0(600, 1200))
    assert(Multimodal.VideoHeaders.parse(mp4) == (("mp4", 600L, 2000L)))
    // mvhd VERSION 1: 64-bit times; box = 8 + 112 = 120, moov = 128
    val v1 = "000000786D766864" + "01000000" +
      "0000000000000000" + "0000000000000000" +  // ctime/mtime 64-bit
      "000003E8" +                                // timescale 1000
      "0000000000002710" +                        // duration 10000 → 10000 ms
      "00010000" + "0100" + "0" * 20 + "0" * 72 + "0" * 48 + "00000002"
    val mp4v1 = hx("0000001066747970" + "69736F6D" + "00000000" +
      "000000806D6F6F76" + v1)
    assert(Multimodal.VideoHeaders.parse(mp4v1) == (("mp4", 1000L, 10000L)))
    assert(Multimodal.VideoHeaders.parse(hx("DEADBEEFDEADBEEF")) == (("unknown", -1L, -1L)))
    assert(Multimodal.VideoHeaders.parse(null) == (("unknown", -1L, -1L)))
    // truncated after ftyp → unknown, no throw
    assert(Multimodal.VideoHeaders.parse(
      hx("0000001066747970" + "69736F6D" + "00000000")) == (("unknown", -1L, -1L)))
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

  test("mediaNearDup: identical payloads pair at hamming 0, one-byte edits stay near, strangers drop") {
    val base = Array.tabulate(256)(i => (i % 251).toByte)
    val oneByteOff = base.clone(); oneByteOff(100) = (oneByteOff(100) + 1).toByte
    val stranger = Array.tabulate(256)(i => ((i * 37 + 11) % 256).toByte)
    val blobs = Seq(
      (1L, base), (2L, base.clone()),      // exact copies
      (3L, oneByteOff),                    // near-dup (few grams differ)
      (4L, stranger),                      // unrelated bytes
      (5L, Array[Byte](1, 2))              // shorter than one gram: no tokens
    ).toDF("media_id", "content")
    val pairs = Multimodal.mediaNearDup(blobs, "media_id", "content",
      maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((1L, 2L)).contains(0L), pairs.mkString(","))
    // a single flipped byte perturbs <= gramBytes*2-1 of ~250 grams:
    // sketch moves a little, stays within the hamming<=3 verify
    assert(byPair.contains((1L, 3L)) && byPair((1L, 3L)) > 0L, pairs.mkString(","))
    // unrelated payloads never pair; the sub-gram blob pairs with nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), pairs.mkString(","))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), pairs.mkString(","))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Sink

/** Sink layout: partition directories, in-file clustering, lossless
  * round-trip, dynamic-partition idempotence.
  */
class SinkSpec extends SparkTestBase {
  import spark.implicits._

  test("clustered write: partition dirs + sorted files + lossless round-trip") {
    val out = Files.createTempDirectory("sink").toString + "/lineitem"
    val src = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    Sink.writeClustered(src, out,
      partitionCols = Seq("l_returnflag"), sortCols = Seq("l_orderkey"))

    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("l_returnflag="))
    assert(dirs.toSet == Set("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))

    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    // partition pruning: reading one flag touches only its directory
    val pruned = back.filter($"l_returnflag" === "A")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(!scan.contains("l_returnflag=N"), "pruning failed")

    // clustering: rows inside each file are sorted by l_orderkey
    import org.apache.spark.sql.expressions.Window
    val misordered = spark.read.parquet(out)
      .withColumn("__file", input_file_name())
      .withColumn("__prev", lag($"l_orderkey", 1).over(
        Window.partitionBy($"__file").orderBy(monotonically_increasing_id())))
      .filter($"__prev" > $"l_orderkey")
    assert(misordered.count() == 0)
  }

  test("jsonl export: sharded dirs, gzip files, round-trips through a json reader") {
    val out = Files.createTempDirectory("sinkjsonl").toString + "/export"
    val docs = Seq(
      (1L, "shard0", "hello \"world\""), // quote forces JSON escaping
      (2L, "shard0", "zweite zeile"),
      (3L, "shard1", "other shard"))
      .toDF("doc_id", "shard", "text")
    Sink.writeJsonl(docs, out, "shard")
    // layout: one directory per shard, files gzip-compressed
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("shard=shard0", "shard=shard1"))
    val gz = new java.io.File(out + "/shard=shard0").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(gz.nonEmpty, "shard files must be gzip jsonl")
    // round trip: schema and values survive, including escaped quotes
    val back = spark.read.json(out).select("doc_id", "shard", "text")
      .as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "shard0", "hello \"world\""),
      (2L, "shard0", "zweite zeile"), (3L, "shard1", "other shard")))
  }

  test("dynamic partition overwrite rewrites only the written partition") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val out = Files.createTempDirectory("sinkdyn").toString + "/t"
    val v1 = Seq(("a", 1), ("b", 2)).toDF("part", "v")
    Sink.writeClustered(v1, out, Seq("part"), Seq("v"))
    val v2 = Seq(("a", 99)).toDF("part", "v") // only partition a rewritten
    Sink.writeClustered(v2, out, Seq("part"), Seq("v"))
    val back = spark.read.parquet(out).as[(Int, String)].collect().toSet
    assert(back == Set((99, "a"), (2, "b")))
  }
}

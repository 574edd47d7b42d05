package graft

import java.sql.Date

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Ingest

/** Round-14: ORC export/import face — source-format coverage with the
  * same declared-schema and pushdown discipline as the parquet path.
  */
class OrcSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(
      java.nio.file.Files.createTempDirectory("orc_spec_").toFile, name).toString

  test("round trip preserves rows, types, nulls, and dates exactly") {
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(Date.valueOf("2024-03-01"))),
      (2L, None, None, None),
      (3L, Some("gamma"), Some(-0.25), Some(Date.valueOf("1999-12-31"))))
      .toDF("id", "name", "score", "d")
    val path = tmp("rt")
    Ingest.writeOrc(df, path)
    val back = Ingest.readOrc(spark, path, df.schema)
    // file reads are nullable by Spark convention — names/types must match
    def widened(s: StructType) = StructType(s.map(_.copy(nullable = true)))
    assert(widened(back.schema) == widened(df.schema))
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("an empty export reads back as zero typed rows (totality contract)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val path = tmp("empty")
    Ingest.writeOrc(df, path)
    val back = Ingest.readOrc(spark, path, schema)
    assert(back.count() == 0L)
    assert(back.schema == schema)
  }

  test("filters push into the ORC scan and the read schema is pruned") {
    val df = (1L to 100L).map(i => (i, s"n$i", i * 2.0))
      .toDF("id", "name", "v")
    val path = tmp("push")
    Ingest.writeOrc(df, path)
    val q = Ingest.readOrc(spark, path, df.schema)
      .filter(col("id") > 90L)
      .select("id", "v")
    val scans = q.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val meta = scans.head.metadata
    assert(meta("PushedFilters").contains("GreaterThan(id,90)"),
      s"pushed: ${meta("PushedFilters")}")
    assert(!meta("ReadSchema").contains("name"),
      s"unpruned read schema: ${meta("ReadSchema")}")
    assert(q.count() == 10L)
  }

  test("orc_roundtrip_agg matches the parquet-derived aggregate on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("orc_roundtrip_agg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 25)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        graft.ops.Relational.decimalSum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }
}

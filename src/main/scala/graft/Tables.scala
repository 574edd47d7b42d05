package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Harness-contract table loader: one parquet file per table under the
  * scale-factor dir (/root/repo/TESTDATA.md). All declared queries read
  * exclusively through this so the scan path is uniform (vectorized parquet
  * reader, pushdown-friendly).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events") loadEvents(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via the
    * legacy conf and convert to a microsecond TimestampType column
    * (integral divide — exact for the harness data, which carries no
    * sub-microsecond component).
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}

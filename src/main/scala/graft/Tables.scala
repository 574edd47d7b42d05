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

  // Relation-metadata cache, the role a catalog/metastore plays for real
  // tables: `spark.read.parquet` re-lists the directory and re-reads the
  // footer schema on EVERY call, and the slate calls load() a couple of
  // times per query over immutable inputs (the harness testdata is
  // read-only by contract, so the captured file listing cannot go stale).
  // Caching the DataFrame handle (the analyzed relation — NOT the data; no
  // persist here) removes that repeated driver-side metadata work. Outer
  // map is WEAKLY keyed by session identity, so a stopped session's
  // relations are GC-eligible with it instead of pinning SparkSession +
  // analyzed plans for the JVM's lifetime (test suites and repeated tool
  // mains create many sessions per JVM).
  private val relations =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val perSession = relations.synchronized {
      var m = relations.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        relations.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((sfDir, table), { _ =>
      if (table == "events") loadEvents(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$table.parquet")
    })
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

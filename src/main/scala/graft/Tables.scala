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
  // persist here) removes that repeated driver-side metadata work.
  // Eviction is EXPLICIT, not weak-reference based: the cached DataFrames
  // strongly reference their own SparkSession (Dataset → QueryExecution →
  // session), so a WeakHashMap keyed by session could never reclaim an
  // entry — the value pins the key (the WeakHashMap javadoc's classic
  // self-referencing-value trap). Instead every load() drops entries whose
  // SparkContext is stopped, so stopped sessions + analyzed plans are
  // freed on the next cache touch (test suites and repeated tool mains
  // create many sessions per JVM).
  private val relations =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val it = relations.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    val perSession = relations.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
    perSession.computeIfAbsent((sfDir, table), { _ =>
      if (table == "events") loadEvents(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$table.parquet")
    })
  }

  /** Register every harness table as a temp view so the engine's FULL
    * surface is reachable through plain `spark.sql(...)` — the way the
    * reference's users issue queries (its two embedded SQL statements,
    * /root/reference/main.py:80-84 and main.py:311-315, run against
    * warehouse tables by name). Schema qualifiers (`custom.`) map to the
    * bare view name; SqlSurfaceSpec runs the reference's statements
    * verbatim-modulo-qualifier and checks parity with the DataFrame ops.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

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

package graft.ops

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY.md §2.9 C8): the reference's actual warehouse
  * is an RDBMS selected by dialect at runtime
  * (/root/reference/config.py:68-86 — mssql | postgres | sqlite behind one
  * interface). Spark's JDBC connector is that interface here: dialect
  * resolution, type mapping, and quoting come from the driver class +
  * URL, so swapping engines is a URL change, exactly like the reference's
  * `DB_TYPE` switch.
  *
  * Scale posture: `partitionColumn`/`lowerBound`/`upperBound`/
  * `numPartitions` turn the read into parallel range-partitioned scans —
  * without them a JDBC read is ONE task pulling the whole table through
  * one connection, which is the classic 100 TB mistake. Writes fan out
  * one connection per partition; `batchsize` amortizes round trips.
  */
object Jdbc {

  /** Append `df` to a JDBC table (the reference's `sql.insert_into`,
    * /root/reference/main.py:62,111). Caller controls partition count —
    * each partition opens one connection.
    */
  def appendTable(df: DataFrame, url: String, table: String,
                  props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Atomic-intent overwrite (the reference's drop-and-reload,
    * /root/reference/main.py:38-46, as truncate+load).
    */
  def overwriteTable(df: DataFrame, url: String, table: String,
                     props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** Plain single-connection read — fine for dimension-sized tables only. */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent scans of
    * `[lowerBound, upperBound)` strides on `partitionColumn`. This is the
    * form every fact-sized JDBC read must use.
    */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lowerBound: Long,
                           upperBound: Long, numPartitions: Int,
                           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Pushdown query read (the reference's watermark probe,
    * /root/reference/main.py:251-267, runs DB-side): wrap arbitrary SQL as
    * a derived table so the database computes it, not Spark.
    */
  def readQuery(spark: SparkSession, url: String, sql: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, s"($sql) q", props)
}

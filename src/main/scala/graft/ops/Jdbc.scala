package graft.ops

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.{DataType, StructType}

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

  // ---- dialect surface (the reference's DB_TYPE switch made explicit) --

  /** Resolve Spark's [[JdbcDialect]] for a URL — the layer that owns
    * identifier quoting and type mapping across the reference's dialect
    * set (/root/reference/config.py:68-86: mssql | postgres | sqlite; the
    * sandboxed spec baseline is embedded Derby on the generic dialect).
    *
    * Dialect quirks a cross-dialect deploy must respect (all handled by
    * the resolved dialect, documented here because only Derby is
    * integration-tested in this sandbox):
    *  - **postgres** folds UNQUOTED identifiers to lowercase (a table
    *    created as `Events` is queried as `events` unless quoted);
    *    quoting is `"..."`; StringType maps to TEXT, BinaryType to BYTEA,
    *    ByteType widens to SMALLINT (no TINYINT), DoubleType is FLOAT8.
    *  - **mssql** quoting is also `"..."` under Spark's dialect (not the
    *    T-SQL-native `[...]` — both are accepted server-side with
    *    QUOTED_IDENTIFIER ON, the connection default); StringType maps to
    *    NVARCHAR(MAX) (so no index on a raw string column), BooleanType
    *    to BIT, TimestampType to DATETIME (3.33 ms resolution — NOT the
    *    microsecond DATETIME2; sub-ms watermark comparisons must round).
    *  - **sqlite/derby (generic dialect)**: `"..."` quoting, TEXT/CLOB
    *    strings, and — the reference's own wart (§7.5) — sqlite has no
    *    real timestamp type, so watermarks round-trip as ISO strings.
    */
  def dialectFor(url: String): JdbcDialect = JdbcDialects.get(url)

  /** Dialect-correct quoted identifier (SQL-text path, no connection). */
  def quoteIdent(url: String, ident: String): String =
    dialectFor(url).quoteIdentifier(ident)

  /** Dialect-correct DDL type string for a Catalyst type (SQL-text path):
    * the dialect's own mapping first, Spark's common JDBC fallback
    * otherwise — the same resolution order the JDBC writer uses when it
    * builds CREATE TABLE statements.
    */
  def ddlType(url: String, dt: DataType): String =
    dialectFor(url).getJDBCType(dt)
      .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
        .getCommonJDBCType(dt))
      .getOrElse(throw new IllegalArgumentException(
        s"no JDBC type for $dt under ${dialectFor(url).getClass.getSimpleName}"))
      .databaseTypeDefinition

  /** The CREATE TABLE column list the JDBC writer would emit for `schema`
    * on `url` — quoting and types both dialect-resolved. Exposed so specs
    * (and operators that pre-create tables with extra DDL, e.g. the
    * reference's index hints) can exercise the exact SQL text per dialect
    * without a live connection.
    */
  def createColumnsSql(url: String, schema: StructType): String =
    schema.fields.map(f =>
      s"${quoteIdent(url, f.name)} ${ddlType(url, f.dataType)}" +
        (if (f.nullable) "" else " NOT NULL")).mkString(", ")
}

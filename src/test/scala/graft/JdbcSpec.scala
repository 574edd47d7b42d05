package graft

import org.apache.spark.sql.functions._

import graft.ops.Jdbc

/** C8: JDBC source/sink round-trip against embedded Derby (in-memory, no
  * server) — the Spark analog of the reference's dialect-switched RDBMS
  * warehouse (/root/reference/config.py:68-86). Derby ships with Spark, so
  * this exercises the real JDBC write path (CREATE TABLE + batched
  * INSERTs) and read path (dialect type mapping, partitioned scans,
  * pushdown queries) with zero external services.
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write-then-read round-trip preserves rows and types") {
    val df = Seq(
      (1L, "ada", 3.5), (2L, "bob", 1.25), (3L, "eve", 9.75))
      .toDF("id", "name", "score")
    Jdbc.overwriteTable(df, url, "people")
    val back = Jdbc.readTable(spark, url, "people")
    assert(back.count() == 3)
    val rows = back.select($"id", $"name", $"score")
      .as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "ada", 3.5), (2L, "bob", 1.25), (3L, "eve", 9.75)))
  }

  test("append accumulates; overwrite replaces (drop-and-reload semantics)") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    Jdbc.overwriteTable(a, url, "acc")
    Jdbc.appendTable(b, url, "acc")
    assert(Jdbc.readTable(spark, url, "acc").count() == 2)
    Jdbc.overwriteTable(a, url, "acc") // reference main.py:38-46 reload
    assert(Jdbc.readTable(spark, url, "acc").count() == 1)
  }

  test("partitioned read fans out over range strides (no single-connection scan)") {
    val df = spark.range(0, 1000).select($"id", ($"id" % 7).as("bucket"))
    Jdbc.overwriteTable(df, url, "wide")
    val back = Jdbc.readTablePartitioned(spark, url, "wide",
      partitionColumn = "id", lowerBound = 0, upperBound = 1000, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    assert(back.agg(sum($"id")).as[Long].head() == 499500L)
  }

  test("pushdown query runs DB-side (watermark-probe shape, main.py:251-267)") {
    val df = Seq((1L, "2023-08-01"), (2L, "2023-08-03"), (3L, "2023-08-02"))
      .toDF("id", "run_date")
    Jdbc.overwriteTable(df, url, "loads")
    // Spark's JDBC writer creates quoted (case-exact) columns; Derby folds
    // unquoted identifiers to uppercase, so the pushdown SQL quotes them —
    // the kind of dialect wart the reference's per-engine classes absorb.
    // (and Derby maps StringType to CLOB, which MAX rejects — cast DB-side)
    val max = Jdbc.readQuery(spark, url,
        """SELECT MAX(CAST("run_date" AS VARCHAR(10))) AS "watermark" FROM loads""")
      .as[String].head()
    assert(max == "2023-08-03")
  }

  test("dialect surface: quoting and DDL types resolve per URL (postgres/mssql/derby)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("note", StringType),
      StructField("ok", BooleanType),
      StructField("ts", TimestampType)))
    val pg = "jdbc:postgresql://host/db"
    val ms = "jdbc:sqlserver://host;databaseName=db"
    val derby = "jdbc:derby:memory:dialects"
    // postgres: TEXT strings, BOOLEAN stays boolean, "..." quoting
    assert(Jdbc.quoteIdent(pg, "run_date") == "\"run_date\"")
    assert(Jdbc.ddlType(pg, StringType) == "TEXT")
    assert(Jdbc.ddlType(pg, ByteType).toUpperCase.contains("SMALLINT")) // no TINYINT
    // mssql: NVARCHAR(MAX) strings, BIT booleans, DATETIME timestamps
    assert(Jdbc.ddlType(ms, StringType).toUpperCase.startsWith("NVARCHAR"))
    assert(Jdbc.ddlType(ms, BooleanType).toUpperCase == "BIT")
    assert(Jdbc.ddlType(ms, TimestampType).toUpperCase.startsWith("DATETIME"))
    // generic (derby/sqlite): common fallback types, "..." quoting
    assert(Jdbc.quoteIdent(derby, "run_date") == "\"run_date\"")
    assert(Jdbc.ddlType(derby, LongType).toUpperCase.contains("BIGINT"))
    // the exact CREATE TABLE column text per dialect — the SQL-text path
    // the writer emits, exercised with no live connection
    val pgCols = Jdbc.createColumnsSql(pg, schema)
    assert(pgCols.contains("\"id\"") && pgCols.contains("NOT NULL"), pgCols)
    assert(pgCols.contains("TEXT"), pgCols)
    val msCols = Jdbc.createColumnsSql(ms, schema)
    assert(msCols.toUpperCase.contains("NVARCHAR") &&
      msCols.toUpperCase.contains("BIT"), msCols)
    // and Derby accepts its own generated DDL end-to-end (live check)
    val stmtUrl = "jdbc:derby:memory:dialectddl;create=true"
    val conn = java.sql.DriverManager.getConnection(stmtUrl)
    try {
      conn.createStatement().execute(
        s"CREATE TABLE ddl_probe (${Jdbc.createColumnsSql(stmtUrl, schema)})")
      val rs = conn.getMetaData.getColumns(null, null, "DDL_PROBE", null)
      val cols = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("COLUMN_NAME")).toList
      assert(cols.map(_.toLowerCase).toSet == Set("id", "note", "ok", "ts"))
    } finally conn.close()
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Ingest-side schema discipline (SURVEY.md §2.1, §1.3): fixed-column
  * reindex projection, JSON flattening with null defaults. These replace the
  * reference's inferred-per-page pandas schemas with declared StructTypes.
  */
object Ingest {

  /** Fixed-column projection with null-fill — the reference's
    * `users.reindex(columns=USER_COLUMNS)` (/root/reference/main.py:65,
    * column list /root/reference/config.py:28-42): keep exactly the target
    * schema's columns in order; absent columns become typed nulls, extra
    * columns are dropped.
    */
  def reindexTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.map { f: StructField =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Read JSON-lines with a DECLARED schema and corrupt-record capture:
    * schema inference is banned at scale (it is a full extra pass over
    * 100 TB and it drifts run to run); PERMISSIVE mode + a corrupt-record
    * column quarantines bad lines as data instead of failing the job or
    * silently dropping them — the caller splits on
    * `_corrupt_record IS NULL` and routes the rest to a dead-letter sink.
    */
  def readJsonLines(spark: org.apache.spark.sql.SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV with declared schema, header, and the same corrupt-record
    * quarantine contract as [[readJsonLines]].
    */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** ORC export — the columnar interchange format for engines that don't
    * speak parquet (Hive/Trino warehouses). Declared-schema discipline as
    * everywhere: the files carry the DataFrame's exact schema, zstd
    * compressed, and a read through [[readOrc]] restores it without
    * inference. Like parquet, ORC scans take predicate pushdown and column
    * pruning (OrcSpec audits `PushedFilters`), so an ORC-resident corpus
    * keeps the same 100 TB scan posture as a parquet one.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  /** ORC read with declared schema — no footer-sampling inference job, and
    * an empty export reads back as zero typed rows (the same totality
    * contract as [[SlateStore]]'s `_schema` sidecar reads).
    */
  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Flatten selected fields out of a JSON string column with null defaults —
    * the reference's meeting-settings flatten (`.get(field)` → None,
    * /root/reference/main.py:324-334). `get_json_object` is null-safe by
    * construction: absent path or malformed JSON yields null.
    * Paths are given as (jsonPath, outName, castTo).
    */
  def flattenJson(df: DataFrame, jsonCol: String,
                  fields: Seq[(String, String, String)]): DataFrame = {
    val extracted = fields.map { case (path, name, castTo) =>
      // try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
      // THROWS on a present-but-malformed value, which would break the
      // documented null-default contract for bad payloads.
      get_json_object(col(jsonCol), path).try_cast(castTo).as(name)
    }
    df.select(df.columns.map(col).toIndexedSeq ++ extracted: _*)
  }
}

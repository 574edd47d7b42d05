package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parquet sink discipline (SURVEY.md §2.1 S7/S8 upgraded for scale).
  *
  * The reference's two write modes — append inserts and drop-then-reload
  * (/root/reference/main.py:38-46,66) — become atomic overwrite and
  * partition-clustered layout here. Layout rules that matter at 100 TB:
  * partition directories on the keys queries filter by (partition pruning),
  * rows sorted within files on the secondary access key (parquet min/max
  * row-group pruning), and bounded file sizes so a single task never
  * produces a multi-GB file.
  */
object Sink {

  /** Atomic snapshot replacement — no reader ever observes the missing or
    * partial table the reference's drop-then-load window exposes.
    */
  def overwriteSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned, clustered write: one shuffle to co-locate partition
    * values, an in-partition sort for row-group pruning on `sortCols`, and
    * a file-size cap. With `spark.sql.sources.partitionOverwriteMode=
    * dynamic`, overwrite replaces only the partitions present in `df` —
    * the idempotent-retry write used by the incremental pipeline.
    */
  def writeClustered(df: DataFrame, path: String,
                     partitionCols: Seq[String], sortCols: Seq[String],
                     maxRecordsPerFile: Long = 5000000L): Unit = {
    // Sort prefix = partition columns: FileFormatWriter requires rows
    // ordered by partition keys before writing; satisfying that ordering
    // here makes it skip its own (secondary-order-destroying) sort, so the
    // sortCols clustering actually survives into the files.
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** JSONL (newline-delimited JSON) export — the interchange format LLM
    * training-data consumers actually ingest (one document object per
    * line, gzip per shard). `shardCol` drives both the directory layout
    * (partition pruning for consumers that read a subset) and the shard
    * boundaries [[graft.ops.LlmOps.packSequences]] planned; `maxRecords
    * PerFile` caps shard size so a downstream loader never sees a
    * multi-GB line file. Same atomic-overwrite discipline as the parquet
    * sinks.
    */
  def writeJsonl(df: DataFrame, path: String, shardCol: String,
                 maxRecordsPerFile: Long = 1000000L,
                 compress: Boolean = true): Unit = {
    val w = df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol))
      .write
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }
}

package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Sink

/** STREAMING face of the store changefeed (round 17): the versioned
  * tables [[Sink]] commits become a Structured Streaming source —
  * Delta's "stream from a table" shape on the engine's own
  * pointer-commit store. Each micro-batch serves the commits that
  * landed since the last checkpointed offset, read DELTA-SIZED from
  * their manifests ([[Sink.changesForPair]]): inserted rows from new
  * data segments, deleted keys from delete segments, tagged
  * `_change_type` ('insert' | 'delete') and `_commit_number` (the
  * table's absolute 0-based commit number — stable across restarts and
  * retention GC, which is what makes it checkpointable).
  *
  * {{{
  *   spark.readStream
  *     .format("graft-changefeed")   // registered via META-INF/services
  *     .option("path", tableDir)
  *     .option("fromCommit", "earliest")   // | "latest" (default) | "<n>"
  *     .load()
  * }}}
  *
  * `fromCommit`: `latest` (default) streams only commits after source
  * creation; `earliest` bootstraps with the OLDEST RETAINED snapshot as
  * inserts (its cumulative content — Delta `startingVersion` semantics)
  * then replays every retained commit; a number starts just after that
  * commit. Retention contract: `retain` at publish time must cover the
  * consumer's maximum lag — a GC'd version inside an unserved range
  * fails the batch (FileNotFoundException), never a silent gap. Commit
  * numbers derive from the supersession markers' monotonic sequence
  * ([[Sink.commitNumbers]]), so tables written before seq-stamped
  * markers (round 14) cannot stream.
  *
  * Offsets are [[LongOffset]]s over commit numbers; the per-batch
  * DataFrame is rewrapped `isStreaming = true` through the internal
  * createDataFrame seam (the FileStreamSource recipe — a v1 source's
  * getBatch plan must read as streaming).
  */
class ChangefeedSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changefeed"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangefeedSource.fullSchema(
      sqlContext.sparkSession, parameters, schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new ChangefeedSource(sqlContext.sparkSession, parameters, schema)
}

object ChangefeedSource {
  private[streaming] def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changefeed: option 'path' (the versioned table dir) is required"))

  /** The TABLE's schema (caller-given, else the live version's `_schema`
    * sidecar, else inferred) — the feed appends its two columns. */
  private[streaming] def tableSchema(spark: SparkSession,
                                     parameters: Map[String, String],
                                     given: Option[StructType]): StructType = {
    val path = tablePath(parameters)
    given.orElse {
      val root = new Path(path)
      Sink.commitNumbers(spark, path).lastOption
        .flatMap { case (_, live) => Sink.storedSchemaOf(spark, root, live) }
    }.getOrElse(Sink.readSnapshot(spark, path).schema)
  }

  private[streaming] def fullSchema(spark: SparkSession,
                                    parameters: Map[String, String],
                                    given: Option[StructType]): StructType =
    StructType(tableSchema(spark, parameters, given).fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_number", LongType, nullable = false)))
}

class ChangefeedSource(spark: SparkSession, parameters: Map[String, String],
                       givenSchema: Option[StructType]) extends Source {
  private val path = ChangefeedSource.tablePath(parameters)
  private val root = new Path(path)
  // resolved once: a stream's shape must not drift mid-query
  private val baseSchema = ChangefeedSource.tableSchema(spark, parameters, givenSchema)
  override val schema: StructType =
    ChangefeedSource.fullSchema(spark, parameters, givenSchema)

  /** The commit number all served changes are strictly AFTER. */
  private val initialExclusive: Long = parameters.get("fromCommit") match {
    case Some("earliest") =>
      Sink.commitNumbers(spark, path).headOption.map(_._1 - 1).getOrElse(-1L)
    case Some("latest") | None =>
      Sink.commitNumbers(spark, path).lastOption.map(_._1).getOrElse(-1L)
    case Some(n) => n.toLong
  }

  override def getOffset: Option[Offset] =
    Sink.commitNumbers(spark, path).lastOption.collect {
      // never move the offset BACKWARD past the start position (a
      // fromCommit ahead of the table, or 'latest' on a table that has
      // not committed again yet): no offset = no batch
      case (liveNo, _) if liveNo > initialExclusive => LongOffset(liveNo)
    }

  private def asLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asLong).getOrElse(initialExclusive)
    val to = asLong(end)
    val numbered = Sink.commitNumbers(spark, path).toMap
    val frames = ((from + 1) to to).flatMap { k =>
      val newer = numbered.getOrElse(k, throw new java.io.FileNotFoundException(
        s"graft-changefeed: commit $k of $path is no longer retained — " +
          "raise `retain` above the consumer's maximum lag"))
      // a missing predecessor is legal exactly once, at the bootstrap
      // edge: the batch serves that version's full content as inserts
      Sink.changesForPair(spark, root, older = numbered.get(k - 1),
        newer = newer, baseSchema)
        .map(_.withColumn("_commit_number", lit(k)))
    }
    val df =
      if (frames.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else frames.reduce(_ unionByName _)
    // a v1 source's getBatch plan must report isStreaming = true — the
    // FileStreamSource recipe: hand the engine the materializable RDD
    // plan rewrapped as a streaming frame
    org.apache.spark.sql.GraftSqlShim.internalCreateDataFrame(
      spark, df.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangefeedSource[$path]"
}

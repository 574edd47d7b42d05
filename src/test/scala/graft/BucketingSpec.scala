package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Round-14: bucketed catalog tables — the write-time shuffle. The layout
  * contract is physical: a join of two tables bucketed on the join key
  * must plan with no exchange and no sort on either side.
  */
class BucketingSpec extends SparkTestBase {

  import spark.implicits._

  private def left = (1L to 200L).map(k => (k, s"p${k % 5}"))
    .toDF("o_orderkey", "o_orderpriority")
  private def right = (1L to 600L).map(i => (i % 200 + 1, i.toDouble, 0.05))
    .toDF("l_orderkey", "l_extendedprice", "l_discount")

  test("co-located join of two bucketed tables plans with zero exchanges and zero sorts") {
    val ord = Bucketing.ensureBucketed(spark, "spec_left", "o_orderkey", 8)(left)
    val li = Bucketing.ensureBucketed(spark, "spec_right", "l_orderkey", 8)(right)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(ord)
        .join(spark.table(li), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.sparkPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"bucketed join still shuffles:\n$plan")
      // one file per bucket (the pre-write repartition) → the scan reports
      // per-bucket sort order and the SMJ's sorts are elided too
      val sorts = plan.collect { case s: SortExec => s }
      assert(sorts.isEmpty, s"bucketed join still sorts:\n$plan")
      // and the layout did not change the rows
      assert(joined.count() == 600L)
    }
  }

  test("raw SQL text over the bucketed catalog names keeps the zero-exchange zero-sort plan (round 15)") {
    // the sql_bucketed_join_revenue face: a reference user typing SQL —
    // not the DataFrame API — must still land on the co-located plan
    val ord = Bucketing.ensureBucketed(spark, "spec_sql_left", "o_orderkey", 8)(left)
    val li = Bucketing.ensureBucketed(spark, "spec_sql_right", "l_orderkey", 8)(right)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = spark.sql(
        s"""SELECT o_orderpriority,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_items
            FROM $ord JOIN $li ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      val plan = q.queryExecution.sparkPlan
      val joinShuffles = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot(_.outputPartitioning.numPartitions == 1) // final ORDER BY
      // the aggregation rides the bucket partitioning too (group key =
      // join key's table side): the ONLY exchanges allowed are the
      // order-by range exchange and the groupBy hash exchange, never a
      // join-side repartition of a fact table
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join:\n$plan")
      val sorts = plan.collect { case s: SortExec => s }
      // join-key sorts are elided (per-bucket sort order); the order-by
      // sort on o_orderpriority is the query's own
      assert(!sorts.exists(_.sortOrder.exists(_.child.toString.contains("orderkey"))),
        s"bucketed SQL join still sorts on the join key:\n$plan")
      assert(!joinShuffles.exists(_.outputPartitioning.toString.contains("orderkey")),
        s"bucketed SQL join still exchanges on the join key:\n$plan")
      // and SQL-text entry did not change the rows vs the DataFrame face
      val df = spark.table(ord)
        .join(spark.table(li), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(graft.ops.Relational.decimalSumProduct(
            col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      val sql = q.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(sql == df)
    }
  }

  test("ensureBucketed memoizes per (session, key): one build, stable name") {
    val builds = new AtomicInteger(0)
    def name = Bucketing.ensureBucketed(spark, "spec_memo", "o_orderkey", 4) {
      builds.incrementAndGet(); left
    }
    val first = name
    val second = name
    assert(first == second)
    assert(builds.get() == 1, "second call must attach, not rebuild")
    assert(spark.table(first).count() == 200L)
  }

  test("keys differing only in sanitized characters get distinct tables") {
    assert(Bucketing.tableIdent("a|b") != Bucketing.tableIdent("a/b"))
    assert(Bucketing.tableIdent("a|b").matches("[a-z0-9_]+"))
  }

  test("two sessions sharing one JVM get distinct catalog tables for the same key") {
    // the in-memory catalog lives in the JVM-wide SharedState: without a
    // session-scoped identifier, session B's Overwrite would yank files
    // under session A's live scan of the same logical table
    val other = spark.newSession()
    val a = Bucketing.ensureBucketed(spark, "spec_xsess", "o_orderkey", 4)(left)
    val b = Bucketing.ensureBucketed(other, "spec_xsess", "o_orderkey", 4)(
      left.limit(10))
    assert(a != b, "session-colliding table identifier")
    assert(spark.table(a).count() == 200L)
    assert(other.table(b).count() == 10L)
  }

  test("bucketed_join_revenue matches the plain-join aggregate on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("bucketed_join_revenue")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        graft.ops.Relational.decimalSumProduct(
          col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }
}

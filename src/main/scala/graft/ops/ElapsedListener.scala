package graft.ops

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Per-query elapsed-time collection from the Spark listener bus — the
  * engine-side analog of the reference's `@elapsed` decorator
  * (/root/reference/timer.py:16-28): timing recorded by the framework
  * around every SQL execution instead of hand-inserted stopwatches, and
  * failures captured explicitly rather than swallowed.
  *
  * Tag a region with [[ElapsedListener.tagged]] (a thread-local Spark
  * property). Attribution works through the bus's own event stream, all
  * delivered in order on one queue:
  *
  *  1. `SparkListenerSQLExecutionStart(executionId)` → start timestamp;
  *  2. `SparkListenerJobStart` — Spark snapshots the submitting thread's
  *     local properties (our tag + `spark.sql.execution.id`) into every
  *     job, which is the only place the caller's thread-locals surface on
  *     the bus → (executionId → tag);
  *  3. `SparkListenerSQLExecutionEnd(executionId)` → duration under the
  *     mapped tag; its `errorMessage` feeds the failure map.
  *
  * Executions that launch no job (pure local plans) report as "untagged".
  * Readers should [[drainTo]] (bounded wait) before reporting — the bus is
  * asynchronous.
  */
class ElapsedListener extends SparkListener {
  private val startMs = new ConcurrentHashMap[Long, Long]()
  private val tagsByExec = new ConcurrentHashMap[Long, String]()
  private val sums = new ConcurrentHashMap[String, Long]()
  private val counts = new ConcurrentHashMap[String, Long]()
  private val fails = new ConcurrentHashMap[String, String]()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val props = js.properties
    if (props != null) {
      val exec = props.getProperty("spark.sql.execution.id")
      val tag = props.getProperty(ElapsedListener.TagKey)
      if (exec != null && tag != null) tagsByExec.put(exec.toLong, tag)
    }
  }

  override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
    case s: SparkListenerSQLExecutionStart =>
      startMs.put(s.executionId, s.time)
    case e: SparkListenerSQLExecutionEnd =>
      val tag = Option(tagsByExec.remove(e.executionId)).getOrElse("untagged")
      Option(startMs.remove(e.executionId)).foreach { t0 =>
        sums.merge(tag, e.time - t0, (a, b) => a + b)
        counts.merge(tag, 1L, (a, b) => a + b)
      }
      e.errorMessage.filter(_.nonEmpty).foreach(msg => fails.put(tag, msg))
    case _ => ()
  }

  /** Total framework-measured ms per tag. */
  def elapsedMs: Map[String, Double] =
    sums.asScala.map { case (k, v) => k -> v.toDouble }.toMap

  /** SQL executions observed per tag. */
  def actionCounts: Map[String, Long] = counts.asScala.toMap

  /** Explicit failure messages per tag (never silently -1). */
  def failures: Map[String, String] = fails.asScala.toMap

  /** Bounded wait until at least `expected` distinct tags have reported
    * (listener bus is async). Returns whether the bar was met.
    */
  def drainTo(expected: Int, timeoutMs: Long = 10000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000
    while (counts.size + fails.size < expected && System.nanoTime() < deadline)
      Thread.sleep(20)
    counts.size + fails.size >= expected
  }
}

object ElapsedListener {
  val TagKey = "graft.query.tag"

  /** Run `f` with every SQL execution inside attributed to `tag`. */
  def tagged[T](spark: SparkSession, tag: String)(f: => T): T = {
    spark.sparkContext.setLocalProperty(TagKey, tag)
    try f finally spark.sparkContext.setLocalProperty(TagKey, null)
  }

  /** Install a fresh listener on the session's context. */
  def install(spark: SparkSession): ElapsedListener = {
    val l = new ElapsedListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def uninstall(spark: SparkSession, l: ElapsedListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}

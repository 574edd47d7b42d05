package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-text surface for versioned-table TIME TRAVEL (VERDICT r15
  * item 4): the table function
  * `snapshot_at('<table_path>', steps_back)` registered through
  * `SparkSessionExtensions.injectTableFunction`, so a SQL-only user can
  * read any retained generation of a [[graft.ops.Sink.overwriteSnapshot]]
  * / segmented table — `VERSION AS OF` semantics on the engine's own
  * pointer-commit store, completing the sql_surface ladder
  * (expressions → aggregates → asof_native TVF → bucketed names → time
  * travel).
  *
  * Unlike [[UnresolvedAsOfJoin]] there is nothing to defer: both
  * arguments are literals, so the builder resolves the snapshot
  * immediately — [[graft.ops.Sink.readSnapshotAt]] pins the exact
  * version dir (manifest-aware: unions data segments, subtracts delete
  * segments) and its ANALYZED plan is planted as the expansion. A
  * beyond-history `steps_back` fails fast at analysis with the store's
  * own FileNotFoundException message, never a partial read.
  */
object SnapshotAtSql {
  /** The injectTableFunction builder: (string literal path, integer
    * literal steps_back). */
  def fromArgs(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2,
      "snapshot_at(table_path, steps_back) takes 2 arguments")
    val path = exprs.head match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"snapshot_at: table_path must be a string literal, got $other")
    }
    val steps = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case Literal(l: Long, LongType) => math.toIntExact(l)
      case other => throw new IllegalArgumentException(
        s"snapshot_at: steps_back must be an integer literal, got $other")
    }
    graft.ops.Sink.readSnapshotAt(SparkSession.active, path, steps)
      .queryExecution.analyzed
  }
}

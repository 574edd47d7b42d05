package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-text surface for the store CHANGEFEED (round 17, the
  * [[SnapshotAtSql]] recipe applied to
  * [[graft.ops.Sink.readChangesSince]]): the table function
  * `changes_since('<table_path>', steps_back)` returns every row the
  * last `steps_back` commits added or removed — the table's columns
  * plus `_change_type` ('insert' | 'delete', key columns populated and
  * the rest null on manifest-derived deletes) and `_commit_step`
  * (1..steps_back, oldest first). Delta's `table_changes(...)` shape
  * for SQL-only incremental consumers; append/patch commits are read
  * delta-sized from the manifests, other boundaries fall back to an
  * exact row diff (see the DataFrame API's scaladoc for the replay
  * contract).
  *
  * Both arguments are literals, so the builder resolves eagerly and a
  * beyond-history `steps_back` fails fast at analysis with the store's
  * own FileNotFoundException message.
  */
object ChangesSinceSql {
  /** The injectTableFunction builder: (string literal path, integer
    * literal steps_back). */
  def fromArgs(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2,
      "changes_since(table_path, steps_back) takes 2 arguments")
    val path = exprs.head match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"changes_since: table_path must be a string literal, got $other")
    }
    val steps = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case Literal(l: Long, LongType) => math.toIntExact(l)
      case other => throw new IllegalArgumentException(
        s"changes_since: steps_back must be an integer literal, got $other")
    }
    graft.ops.Sink.readChangesSince(SparkSession.active, path, steps)
      .queryExecution.analyzed
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, CreateStruct, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the (c) tier of the engine's
  * custom-operator preference order (SURVEY.md §7.4): a whole-operator
  * LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (graft.GraftExtensions).
  *
  * Semantics (same contract as the composed [[graft.ops.AsOfJoin.asOf]],
  * asserted by the parity spec): for every left row, the right row of the
  * SAME key with the greatest `rightTs <= leftTs` (inclusive), null-padded
  * when none exists; null keys and null timestamps never match. Output is
  * `left.output ++ right.output` with the right side forced nullable.
  *
  * Why a physical operator at all, when the union+window composition is
  * already one shuffle: the composition materializes BOTH sides into one
  * sorted window relation — every left row carries null right-payload
  * columns through the sort, and every right row flows through the window
  * frame and is then discarded by the side filter. The merge exec shuffles
  * each side once on its own key, sorts each side independently
  * (`requiredChildOrdering` — Spark plants the sorts), and then streams a
  * two-cursor per-partition merge holding O(1) state: no unioned
  * super-relation, no window frame, no post-filter. Same exchange count,
  * strictly less data through the sorts, and the right side's payload
  * never widens the left rows until the final joined output.
  *
  * Determinism at ties: among right rows at the winning (key, ts), the
  * merge keeps the row with the GREATEST xxhash64 of its full payload —
  * the SAME winner the composed op's `xxhash64(__r)` window tiebreak
  * picks (its frame carries the last row in hash-ascending order), so
  * the two operators agree row-for-row even on duplicate-(key, ts)
  * fixtures with distinct payloads (asserted by the tie parity spec).
  * The tiebreak is value-computed, not sort-planted, so non-orderable
  * payload columns (MapType) are handled and the required ordering is
  * just (key, ts) on both sides.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        forward: Boolean = false,
                        rightTieHash: Option[Attribute] = None)
    extends BinaryNode {
  /** Right payload columns visible to consumers — the pruning rule's
    * injected tie-hash column (a function of the PRE-pruning payload,
    * see [[AsOfJoinPruning]]) rides through the exec but never out. */
  def rightPayload: Seq[Attribute] =
    right.output.filterNot(a => rightTieHash.exists(_.semanticEquals(a)))

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // Catalyst's size-only visitor estimates any unrecognized multi-child
  // node as the PRODUCT of its children's sizes — a petabyte-scale
  // figure that forbids every downstream broadcast of an as-of result
  // at plan time (r12). The honest model: EXACTLY one output row per
  // LEFT row, each carrying one right payload (or nulls), so
  // sizeInBytes = leftSize + |L|·rightRowWidth. The r12 shortcut
  // `leftSize + rightSize` underestimates badly when the left is
  // large/narrow and the right small/wide (|L| ≫ |R|): a downstream
  // join would auto-broadcast a multi-GB as-of result and OOM the
  // driver. |L| comes from the child's rowCount when the visitor
  // propagates one, else leftSize over the schema's default row width;
  // the right row width from rightSize/|R| when |R| is known, else the
  // schema default — both sides of the estimate degrade gracefully to
  // schema-derived widths under size-only stats.
  override def stats: Statistics = {
    val ls = left.stats
    val rs = right.stats
    val lRows: BigInt = ls.rowCount.filter(_ > 0).getOrElse {
      val lWidth = BigInt(left.output.map(_.dataType.defaultSize).sum.max(1))
      (ls.sizeInBytes / lWidth).max(1)
    }
    val rWidth: BigInt = rs.rowCount.filter(_ > 0) match {
      case Some(rr) => (rs.sizeInBytes / rr).max(1)
      case None => BigInt(right.output.map(_.dataType.defaultSize).sum.max(1))
    }
    Statistics(
      sizeInBytes = (ls.sizeInBytes + lRows * rWidth).max(1),
      rowCount = ls.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** `spark.graft.asof.invariantTies` plants an ANALYZED xxhash64 over
    * the full payload struct; Spark's analysis rejects hash expressions
    * over MapType (HASH_MAP_TYPE), while the DEFAULT exec's unanalyzed
    * tiebreak evaluates maps fine — so the opt-in fails fast with an
    * actionable message instead of a generic AnalysisException
    * mid-plan (r14 review fix). */
  private[graft] def requireHashableTiePayload(
      output: Seq[Attribute]): Unit = {
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val bad = output.filter(a => hasMap(a.dataType))
    require(bad.isEmpty,
      "spark.graft.asof.invariantTies=true cannot hash MapType payload " +
        s"column(s) ${bad.map(_.name).mkString(", ")} (Spark forbids hash " +
        "expressions over maps); use the default pruned-tie contract or " +
        "drop the map column from the right side")
  }

  /** Plant the full-payload tie hash under `right` — ONE construction
    * shared by the DataFrame path (AsOfJoin.tieHashedRight) and the SQL
    * TVF path (ResolveAsOfJoin), so the seed / column name / struct
    * shape can never drift apart and break cross-path tie-winner parity
    * (r14 review fix). Fails fast on MapType payloads. */
  private[graft] def plantTieHash(right: LogicalPlan)
      : (LogicalPlan, Attribute) = {
    requireHashableTiePayload(right.output)
    val h = org.apache.spark.sql.catalyst.expressions.Alias(
      XxHash64(Seq(CreateStruct(right.output)), 42L), "__asof_tie")()
    (Project(right.output :+ h, right), h.toAttribute)
  }
}

/** Column pruning for [[AsOfJoinPlan]] (VERDICT r11 item 2). Catalyst's
  * `ColumnPruning` only understands built-in nodes, so without this rule a
  * consumer selecting 2 of 30 right-payload columns still paid full width
  * through BOTH sides' exchanges, sorts, and the parquet scan. The rule
  * rewrites `Project(p, AsOfJoinPlan(l, r))` to keep only `references(p) ∪
  * {keys, timestamps}` on each child; the standard batch then collapses the
  * inserted Projects into the scans (pruned ReadSchema — asserted by
  * AsOfNativeSpec's plan audit). It runs inside the fixed-point operator
  * optimization batch (`injectOptimizerRule`), so it interleaves with
  * CollapseProject/ColumnPruning until stable.
  *
  * Tie-rule contract (r14, closes the r12 LOW finding): the exec's
  * equal-ts tiebreak hashes the right payload AS THE PLAN CARRIES IT,
  * so by DEFAULT the winner after pruning is the greatest xxhash64 of
  * the KEPT columns — fully deterministic for a given projection
  * (input/partition-order independent, asserted by spec), but WHICH
  * indistinguishable-to-the-query tie row backs the visible subset may
  * differ between projections: `asOfNative(...).select(a)` can surface
  * a different tie row's `a` than the unpruned result. This is the
  * documented trade for never scanning the dropped columns — any
  * function of the full payload must READ the full payload, and at
  * scale the pruned columnar scan is the first-order cost (the r12
  * ReadSchema audit below).
  *
  * Consumers that need projection-INVARIANT ties opt in with
  * `spark.graft.asof.invariantTies=true`, honored at CONSTRUCTION time
  * (`AsOfJoin.asOfNative` / the `asof_native` TVF): a computed
  * `__asof_tie` column — xxhash64 of the FULL payload struct, bitwise
  * the value the unpruned exec computes — is planted under the plan
  * and recorded as `rightTieHash`; the exec then breaks ties on that
  * column alone, so any subset select returns the same rows as
  * projecting the full result (asserted by the invariance spec).
  * Construction time, not rule time, because Spark 4's builtin
  * ColumnPruning narrows this node's children generically BEFORE any
  * injected rule fires — by rule time the full payload is already off
  * the plan. The node references the tie column, so every pruning pass
  * keeps it; exchanges and sorts carry only kept-width + 8 bytes, the
  * column never reaches the output, and the cost is the right SCAN
  * reverting to full width (any function of the full payload must read
  * the full payload).
  *
  * This rule itself remains as defense in depth for consumer shapes the
  * builtin generic pruning might skip; on already-narrowed plans it is
  * a fixed-point no-op.
  */
object AsOfJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val required = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.rightKey, j.leftTs, j.rightTs)) ++
        AttributeSet(j.rightTieHash.toSeq)
      val lKeep = j.left.output.filter(required.contains)
      val rKeep = j.right.output.filter(required.contains)
      if (lKeep.length < j.left.output.length ||
          rKeep.length < j.right.output.length)
        Project(projList,
          j.copy(left = Project(lKeep, j.left), right = Project(rKeep, j.right)))
      else p
  }
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinNativeExec(p.leftKey, p.rightKey, p.leftTs, p.rightTs,
        p.forward, p.rightTieHash, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinNativeExec(leftKey: Attribute, rightKey: Attribute,
                              leftTs: Attribute, rightTs: Attribute,
                              forward: Boolean,
                              rightTieHash: Option[Attribute],
                              left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => rightTieHash.exists(_.semanticEquals(a)))
      .map(_.withNullability(true))

  // both sides cluster on their key; EnsureRequirements co-partitions the
  // two ClusteredDistribution children (the standard shuffled-join shape)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // (key, ts) merge order on both sides — ties at equal ts are resolved
  // by the value-computed payload-hash tiebreak in the merge, not by
  // planting more sort columns (which couldn't totalize non-orderable
  // payload types anyway)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in place: the left child's partitioning and
  // ordering survive (what lets a downstream per-key op skip its shuffle)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.semanticEquals(leftKey))
    val lTsIdx = left.output.indexWhere(_.semanticEquals(leftTs))
    val rKeyIdx = right.output.indexWhere(_.semanticEquals(rightKey))
    val rTsIdx = right.output.indexWhere(_.semanticEquals(rightTs))
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
      "as-of join keys must be direct child output attributes")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val nRight = right.output.size

    val outAttrs = output
    // the joined row carries EVERY right child column (including a
    // pruning-injected tie column); the result projection drops what
    // `output` excludes. Right attrs MUST be re-marked nullable here:
    // the projection binds null checks off these, and unmatched lefts
    // join a null-padded right row
    val joinedSchema = left.output ++ right.output.map(_.withNullability(true))
    // tiebreak: the pruning-injected __asof_tie column (hash of the
    // PRE-pruning payload, already codegen-computed in the child
    // Project) when present; else xxhash64 of the right payload struct
    // — bitwise the composed op's xxhash64(__r) window tiebreak (struct
    // hashing is field-recursive and name-blind), bound on the driver
    val tieIdx = rightTieHash.map(h =>
      right.output.indexWhere(_.semanticEquals(h))).getOrElse(-1)
    require(rightTieHash.isEmpty || tieIdx >= 0,
      "as-of tie-hash column must be a direct right-child output attribute")
    val tieHashExpr = if (tieIdx >= 0) null
      else BindReferences.bindReference(
        XxHash64(Seq(CreateStruct(right.output)), 42L), right.output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // downstream operators (shuffles, collect) require UnsafeRow
      val resultProj = UnsafeProjection.create(outAttrs, joinedSchema)
      @inline def tieOf(r: InternalRow): Long =
        if (tieIdx >= 0) r.getLong(tieIdx)
        else tieHashExpr.eval(r).asInstanceOf[Long]

      new Iterator[InternalRow] {
        // the right cursor row and the current candidate are COPIES —
        // Spark's sorters reuse row objects across next() calls
        private var rNext: InternalRow = advanceRight()
        private var cand: InternalRow = null

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            // null key or null ts can never match any left row: skip at
            // the cursor so candidate logic only ever sees usable rows
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTsIdx)) return r.copy()
          }
          null
        }

        override def hasNext: Boolean = lIter.hasNext

        private def nextBackward(l: InternalRow, lk: Any, lts: Any): InternalRow = {
          // a candidate from a previous key group is stale
          if (cand != null && keyOrd.compare(cand.get(rKeyIdx, keyType), lk) != 0)
            cand = null
          var advancing = true
          while (advancing && rNext != null) {
            val kc = keyOrd.compare(rNext.get(rKeyIdx, keyType), lk)
            if (kc < 0) {
              rNext = advanceRight() // earlier key group: consumed, no candidate
            } else if (kc == 0 &&
                tsOrd.compare(rNext.get(rTsIdx, tsType), lts) <= 0) {
              // at-or-before: a strictly later ts always wins; at EQUAL
              // ts the greater payload hash wins (parity with the
              // composed op's hash-ascending window tiebreak)
              if (cand == null ||
                  tsOrd.compare(rNext.get(rTsIdx, tsType),
                    cand.get(rTsIdx, tsType)) != 0 ||
                  tieOf(rNext) > tieOf(cand))
                cand = rNext
              rNext = advanceRight()
            } else {
              advancing = false // future key or future ts: stop, keep cursor
            }
          }
          resultProj(if (cand != null) joined(l, cand) else joined(l, nullRight))
        }

        private def nextForward(l: InternalRow, lk: Any, lts: Any): InternalRow = {
          // the held winner is stale when the key changed or the new left
          // ts passed it; otherwise it is STILL the earliest at-or-after
          // row (left ts only grows, and every right row before the
          // winner was below the previous — hence also this — left ts)
          if (cand != null &&
              (keyOrd.compare(cand.get(rKeyIdx, keyType), lk) != 0 ||
               tsOrd.compare(cand.get(rTsIdx, tsType), lts) < 0))
            cand = null
          if (cand == null) {
            // advance to the first usable right row of this key at-or-
            // after lts; rows passed here are below EVERY future left ts
            var advancing = true
            while (advancing && rNext != null) {
              val kc = keyOrd.compare(rNext.get(rKeyIdx, keyType), lk)
              if (kc < 0 || (kc == 0 &&
                  tsOrd.compare(rNext.get(rTsIdx, tsType), lts) < 0))
                rNext = advanceRight()
              else advancing = false
            }
            if (rNext != null &&
                keyOrd.compare(rNext.get(rKeyIdx, keyType), lk) == 0) {
              // consume the whole equal-ts tie run, keeping the greatest
              // payload hash (parity with the composed forward op's
              // hash-ascending desc-window tiebreak); the losers can
              // never win for any later left either — same run, same rule
              cand = rNext
              rNext = advanceRight()
              while (rNext != null &&
                  keyOrd.compare(rNext.get(rKeyIdx, keyType), lk) == 0 &&
                  tsOrd.compare(rNext.get(rTsIdx, tsType),
                    cand.get(rTsIdx, tsType)) == 0) {
                if (tieOf(rNext) > tieOf(cand))
                  cand = rNext
                rNext = advanceRight()
              }
            }
          }
          resultProj(if (cand != null) joined(l, cand) else joined(l, nullRight))
        }

        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx)) {
            resultProj(joined(l, nullRight))
          } else {
            val lk = l.get(lKeyIdx, keyType)
            val lts = l.get(lTsIdx, tsType)
            if (forward) nextForward(l, lk, lts) else nextBackward(l, lk, lts)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinNativeExec =
    copy(left = newLeft, right = newRight)
}

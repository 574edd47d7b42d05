package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prefix every `levenshtein(a, b) <= k` filter conjunct
  * with the cheap, implied length prune `abs(length(a) - length(b)) <= k`.
  *
  * Soundness: one edit changes a string's length by at most one, so
  * distance ≥ |len(a) − len(b)|; a pair whose lengths differ by more
  * than k can never pass the original predicate, and for every other
  * row the original conjunct still decides — the rewrite never changes
  * results, only evaluation cost.
  *
  * Why a RULE and not a rewrite in the operator: the predicate shows up
  * wherever users write fuzzy joins (SQL, DataFrame, composed views) —
  * an optimizer rule catches every phrasing, the same reason Spark's own
  * LikeSimplification lives in the optimizer. `And` evaluates left to
  * right in codegen, so the O(1) length compare short-circuits the
  * O(len²) dynamic-program for every pruned row; under a join, the
  * conjunct is also eligible for earlier pushdown than the levenshtein
  * itself (it references each side through cheap `Length`).
  *
  * Idempotent by construction: a conjunct is only added when the
  * equivalent prune isn't already present, so the fixed-point batch
  * converges after one application.
  */
object LevenshteinLengthPrune extends Rule[LogicalPlan] {

  // Emit length-of-literal already folded: the optimizer's constant
  // folding would rewrite Length(lit) on the next pass, and the
  // idempotence guard compares structurally — generating the folded form
  // directly keeps guard and generated conjunct in the same shape.
  private def lengthOf(e: Expression): Expression =
    if (e.foldable) Literal.create(Length(e).eval(), Length(e).dataType)
    else Length(e)

  private def pruneOf(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(lengthOf(l), lengthOf(r))), k)

  private def alreadyPruned(conjuncts: Seq[Expression],
                            l: Expression, r: Expression, k: Expression): Boolean =
    conjuncts.exists(_.semanticEquals(pruneOf(l, r, k)))

  private def withPrunes(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val extra = conjuncts.collect {
      case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_, _))
          if !alreadyPruned(conjuncts, l, r, k) => pruneOf(l, r, k)
      case GreaterThanOrEqual(k @ Literal(_, _), Levenshtein(l, r, None))
          if !alreadyPruned(conjuncts, l, r, k) => pruneOf(l, r, k)
      case LessThan(Levenshtein(l, r, None), k @ Literal(_, _))
          if !alreadyPruned(conjuncts, l, r, k) => pruneOf(l, r, k)
      case GreaterThan(k @ Literal(_, _), Levenshtein(l, r, None))
          if !alreadyPruned(conjuncts, l, r, k) => pruneOf(l, r, k)
    }.distinct
    if (extra.isEmpty) None
    else Some((extra ++ conjuncts).reduceLeft(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // both homes of the predicate: a post-join Filter, and the residual
    // join condition Catalyst pushes it into
    case f @ Filter(cond, child) =>
      withPrunes(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      withPrunes(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

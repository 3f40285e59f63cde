package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** The optional classification-pushdown rule SURVEY.md §4 sketches:
  * a filter like
  *
  *   `overall = 'positive'` where
  *   `overall = CASE WHEN score >= 0.1 THEN 'positive'
  *                   WHEN score <= -0.1 THEN 'negative'
  *                   ELSE 'neutral' END`
  *
  * becomes the direct threshold predicate (`score >= 0.1 <=> true`)
  * instead of materializing the label string per row and comparing it.
  * Catalyst has no CASE-unwrapping for non-boolean equality, so this
  * is a genuine gap the engine fills.
  *
  * Null semantics: the rewritten predicate is two-valued (FALSE where
  * the original equality would be NULL — e.g. a CASE with no ELSE, or
  * a NULL literal branch, compared to a label). That substitution is
  * only sound where FALSE and NULL behave identically, i.e. when the
  * equality is a TOP-LEVEL CONJUNCT of the Filter condition (a Filter
  * drops both). Under a surrounding NOT/OR/CASE the two diverge
  * (NOT NULL is NULL → row dropped, NOT FALSE is TRUE → row kept), so
  * the rule rewrites only top-level conjuncts and leaves every nested
  * occurrence untouched.
  */
object SimplifyLabelFilter extends Rule[LogicalPlan] {

  private val MaxBranches = 8

  private def rewrite(cw: CaseWhen, label: Literal): Option[Expression] = {
    val elseV = cw.elseValue.getOrElse(Literal.create(null, cw.dataType))
    val values = cw.branches.map(_._2) :+ elseV
    // only all-literal string outcomes, deterministic conditions
    if (cw.branches.length > MaxBranches) return None
    if (!values.forall(v => v.isInstanceOf[Literal] && v.dataType == StringType)) return None
    if (!cw.branches.forall(_._1.deterministic)) return None

    val taken = cw.branches.map { case (c, _) => EqualNullSafe(c, Literal.TrueLiteral) }
    def pathCond(i: Int): Expression = {
      val notBefore = taken.take(i).map(Not)
      val here = if (i < taken.length) Seq(taken(i)) else Seq.empty
      (notBefore ++ here).reduceOption(And).getOrElse(Literal.TrueLiteral)
    }
    val matching = values.zipWithIndex.collect {
      case (v: Literal, i) if v.value != null && v.value == label.value => pathCond(i)
    }
    Some(matching.reduceOption(Or).getOrElse(Literal.FalseLiteral))
  }

  /** Splits a condition into its AND-ed conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def rewriteConjunct(e: Expression): Expression = e match {
    case eq @ EqualTo(cw: CaseWhen, l: Literal) if l.dataType == StringType =>
      rewrite(cw, l).getOrElse(eq)
    case eq @ EqualTo(l: Literal, cw: CaseWhen) if l.dataType == StringType =>
      rewrite(cw, l).getOrElse(eq)
    case other => other // nested occurrences (NOT/OR/...) stay as-is
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, child) =>
      Filter(conjuncts(cond).map(rewriteConjunct).reduce(And), child)
  }
}

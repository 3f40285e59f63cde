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
  * Null semantics are preserved exactly: a CASE branch with a NULL
  * condition is "not taken", so each branch test is wrapped in
  * null-safe `<=> TRUE`, and the ELSE path is the null-safe negation
  * of every branch — a NULL score still classifies as 'neutral' after
  * the rewrite.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      f.transformExpressions {
        case eq @ EqualTo(cw: CaseWhen, l: Literal) if l.dataType == StringType =>
          rewrite(cw, l).getOrElse(eq)
        case eq @ EqualTo(l: Literal, cw: CaseWhen) if l.dataType == StringType =>
          rewrite(cw, l).getOrElse(eq)
      }
  }
}

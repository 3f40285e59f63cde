package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomAgg, BloomContainsExpr, CosineSimExpr,
  CountMinAgg, CountMinEstimateExpr, LexiconPolarityExpr,
  NfcNormalizeExpr, NfdNormalizeExpr, VaderCompoundExpr}
import org.apache.spark.sql.catalyst.expressions.Literal

/** Cluster-wide registration entry point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the engine's native expressions into every session's
  * function registry (no per-session register() call, no ScalaUDF
  * wrapper), the supported mechanism for third-party Catalyst
  * additions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Builders receive whatever argument list the SQL analyzer parsed;
    * silently dropping extras (exprs.head) would compute a DIFFERENT
    * answer than the user asked for, so wrong arity fails analysis. */
  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vader_compound"),
      new ExpressionInfo(classOf[VaderCompoundExpr].getName, "vader_compound"),
      exprs => { arity("vader_compound", exprs, 1); VaderCompoundExpr(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier("textblob_polarity"),
      new ExpressionInfo(classOf[LexiconPolarityExpr].getName, "textblob_polarity"),
      exprs => { arity("textblob_polarity", exprs, 1); LexiconPolarityExpr(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      exprs => { arity("cosine_sim", exprs, 2); CosineSimExpr(exprs(0), exprs(1)) }))
    // the sketch family on the SQL surface: artifacts build in SQL
    // aggregates and probe as scan-local codegen calls — no UDF tier.
    // Sizes are the library defaults; SQL callers needing others use
    // the Column API (analyzer function signatures are value-only).
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      exprs => { arity("bloom_agg", exprs, 1)
        BloomAgg(exprs.head, numBits = 1 << 20, numHashes = 5) }))
    e.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "bloom_contains"),
      exprs => { arity("bloom_contains", exprs, 2); BloomContainsExpr(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_agg"),
      exprs => {
        // cms_agg(key) or cms_agg(key, weight) — documented two-arg form.
        if (exprs.length < 1 || exprs.length > 2)
          throw new IllegalArgumentException(
            s"cms_agg expects 1 or 2 arguments, got ${exprs.length}")
        val weight = if (exprs.length == 2) exprs(1) else Literal(1L)
        CountMinAgg(exprs.head, weight, depth = 4, width = 1 << 18)
      }))
    e.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CountMinEstimateExpr].getName, "cms_estimate"),
      exprs => { arity("cms_estimate", exprs, 2); CountMinEstimateExpr(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      exprs => { arity("nfc_normalize", exprs, 1); NfcNormalizeExpr(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier("nfd_normalize"),
      new ExpressionInfo(classOf[NfdNormalizeExpr].getName, "nfd_normalize"),
      exprs => { arity("nfd_normalize", exprs, 1); NfdNormalizeExpr(exprs.head) }))
    e.injectOptimizerRule(_ => graft.rules.SimplifyLabelFilter)
    // whole-operator extension point: the as-of join's custom
    // LogicalPlan → SparkPlan strategy (graft.plans.AsOfJoinPhysical)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

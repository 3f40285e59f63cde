package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BloomAgg, BloomContainsExpr, CosineSimExpr,
  CountMinAgg, CountMinEstimateExpr, LexiconPolarityExpr, VaderCompoundExpr}
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

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vader_compound"),
      new ExpressionInfo(classOf[VaderCompoundExpr].getName, "vader_compound"),
      exprs => VaderCompoundExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("textblob_polarity"),
      new ExpressionInfo(classOf[LexiconPolarityExpr].getName, "textblob_polarity"),
      exprs => LexiconPolarityExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      exprs => CosineSimExpr(exprs(0), exprs(1))))
    // the sketch family on the SQL surface: artifacts build in SQL
    // aggregates and probe as scan-local codegen calls — no UDF tier.
    // Sizes are the library defaults; SQL callers needing others use
    // the Column API (analyzer function signatures are value-only).
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      exprs => BloomAgg(exprs.head, numBits = 1 << 20, numHashes = 5)))
    e.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "bloom_contains"),
      exprs => BloomContainsExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_agg"),
      exprs => CountMinAgg(exprs.head, Literal(1L), depth = 4, width = 1 << 18)))
    e.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CountMinEstimateExpr].getName, "cms_estimate"),
      exprs => CountMinEstimateExpr(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => graft.rules.SimplifyLabelFilter)
  }
}

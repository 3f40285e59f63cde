package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimExpr, LexiconPolarityExpr, VaderCompoundExpr}

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
    e.injectOptimizerRule(_ => graft.rules.SimplifyLabelFilter)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's wrapping-64 polynomial hash (base 31 over UTF-16
  * units — the wide `String.hashCode`) as a NATIVE codegen'd
  * expression. This is the one hash family the DuckDB oracle can
  * replay exactly (a HUGEINT wrapping fold — the x08 template), so it
  * keys fingerprints (x08), winnowing grams (q85/q86), hash-keyed
  * ExactSubstr (x29) and CDC cuts (q171); as an `Expression` with
  * `doGenCode` the fingerprint/gram-key projections stay inside
  * whole-stage codegen instead of breaking the span at a Scala UDF
  * (the UnicodeNorm tier — deserialize-to-String cost remains, but
  * the codegen boundary, null bookkeeping, and per-row closure
  * dispatch go away).
  *
  * Identity contract: equals `TextAnalysis.rollingHashOf` on every
  * input (HashExprSpec pins randomized equality), so swapping call
  * sites can never move an oracle. */
object Hash64 {
  /** Wrapping base-31 fold over UTF-16 code units. */
  def hash64(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = h * 31 + str.charAt(i)
      i += 1
    }
    h
  }

  def hash64Col(c: Column): Column =
    GraftBridge.column(Hash64Expr(GraftBridge.expression(c)))
}

case class Hash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override def nullSafeEval(input: Any): Any =
    Hash64.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
    copy(child = newChild)
}

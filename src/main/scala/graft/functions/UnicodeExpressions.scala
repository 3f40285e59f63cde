package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as native codegen'd expressions — the
  * text-normalization stage crawl corpora need BEFORE hashing or
  * deduplicating: the same visible string arrives both precomposed
  * (é = U+00E9) and decomposed (e + U+0301), and every content hash,
  * shingle, and dedup key in the engine treats those as different
  * documents until normalization pins one form.
  *
  * Backed by the JDK's `java.text.Normalizer` (pure JDK, no ICU
  * dependency); `doGenCode` emits the direct static call so the
  * projection stays inside whole-stage codegen (the
  * SentimentExpressions tier). NFC is cross-validated against
  * DuckDB's utf8proc `nfc_normalize` in the q154 oracle — two
  * independent Unicode implementations agreeing byte-for-byte on the
  * composed form.
  */
object UnicodeNorm {
  /** NFC-normalize (compose). */
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** NFD-normalize (decompose) — the accent-strip preprocessor. */
  def nfd(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD))

  def nfcCol(c: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(c)))
  def nfdCol(c: Column): Column =
    GraftBridge.column(NfdNormalizeExpr(GraftBridge.expression(c)))

  /** Accent fold: decompose, drop combining marks, recompose — the
    * deterministic ASCII-ish fold for Latin scripts. */
  def stripAccents(c: Column): Column = {
    import org.apache.spark.sql.functions.{lit, regexp_replace}
    nfcCol(regexp_replace(nfdCol(c), lit("\\p{M}"), lit("")))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

case class NfdNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfd_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfd(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNorm.nfd($c)")

  override protected def withNewChildInternal(newChild: Expression): NfdNormalizeExpr =
    copy(child = newChild)
}

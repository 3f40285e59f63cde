package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sentiment scorers — the codegen
  * tier above a Scala UDF (SURVEY.md §4: the only custom physical work
  * the reference surface justifies).
  *
  * `doGenCode` emits a direct static call, so the expression stays
  * INSIDE whole-stage codegen: no ScalaUDF wrapper, no encoder
  * conversion, no codegen-span break. Null handling comes from
  * `UnaryExpression.nullSafeEval`/`defineCodeGen`.
  */
case class VaderCompoundExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vader_compound"

  override def nullSafeEval(input: Any): Any =
    Vader.compound(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Vader.compound($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): VaderCompoundExpr =
    copy(child = newChild)
}

/** TextBlob-style lexicon polarity as a codegen'd expression. */
case class LexiconPolarityExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "textblob_polarity"

  override def nullSafeEval(input: Any): Any =
    LexiconPolarity.polarity(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LexiconPolarity.polarity($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): LexiconPolarityExpr =
    copy(child = newChild)
}

/** Full VADER struct<neg,neu,pos,compound> as a codegen'd expression. */
case class VaderScoresExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = VaderScoresExpr.schema
  override def prettyName: String = "vader_scores"

  override def nullSafeEval(input: Any): Any =
    Vader.scoresRow(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Vader.scoresRow($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): VaderScoresExpr =
    copy(child = newChild)
}

object VaderScoresExpr {
  import org.apache.spark.sql.types.StructType
  val schema: StructType = new StructType()
    .add("neg", DoubleType).add("neu", DoubleType)
    .add("pos", DoubleType).add("compound", DoubleType)
}

object SentimentExpressions {

  def vaderCompound(c: Column): Column =
    GraftBridge.column(VaderCompoundExpr(GraftBridge.expression(c)))

  def vaderScores(c: Column): Column =
    GraftBridge.column(VaderScoresExpr(GraftBridge.expression(c)))

  def lexiconPolarity(c: Column): Column =
    GraftBridge.column(LexiconPolarityExpr(GraftBridge.expression(c)))

  /** Register the expressions in the session's function registry so
    * `spark.sql` resolves them natively (no ScalaUDF). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vader_compound_native",
      exprs => VaderCompoundExpr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("textblob_polarity_native",
      exprs => LexiconPolarityExpr(exprs.head), "built-in")
  }
}

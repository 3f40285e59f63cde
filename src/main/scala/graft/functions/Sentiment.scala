package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Column-level sentiment functions (SURVEY.md §2 X-1/X-2).
  *
  * UDF wrappers around the pure-Scala [[Vader]] and [[LexiconPolarity]]
  * ports. Scala UDFs here run inside the JVM task (no serde boundary —
  * unlike the reference's per-row Python library calls,
  * dags/sentiment_analysis_dag.py:72-73); the scoring itself is
  * lexicon hash-lookups over a single tokenization pass, so the hot
  * path stays CPU-cache friendly. A codegen'd Catalyst Expression is
  * the planned upgrade once profiling says the UDF boundary matters.
  */
object Sentiment {

  private val vaderUdf = udf { (text: String) =>
    val s = Vader.polarityScores(text)
    (s.neg, s.neu, s.pos, s.compound)
  }

  private val vaderCompoundUdf = udf { (text: String) => Vader.compound(text) }
  private val lexPolarityUdf = udf { (text: String) => LexiconPolarity.polarity(text) }
  // Option-wrapped: NULL text → NULL struct, matching the native
  // nullSafeEval expressions (a bare UDF would receive the null String
  // and score it (0.0, 0.0), making sentiment().polarity disagree
  // with polarity() on null input). Empty text still scores (0.0, 0.0).
  private val lexSentimentUdf = udf { (text: String) =>
    Option(text).map(LexiconPolarity.sentiment) }

  /** X-1: full VADER struct<neg,neu,pos,compound> (native expr). */
  def vaderScores(text: Column): Column =
    SentimentExpressions.vaderScores(text)

  /** UDF-path struct (fallback / equivalence testing). */
  def vaderScoresUdfCol(text: Column): Column =
    vaderUdf(text).cast("struct<neg:double,neu:double,pos:double,compound:double>")

  /** X-1: compound only — the field the reference pipeline consumes.
    * Native Catalyst expression (stays inside whole-stage codegen). */
  def vaderCompound(text: Column): Column =
    SentimentExpressions.vaderCompound(text)

  /** X-2: TextBlob-style lexicon polarity in [-1,1] (native expr). */
  def lexiconPolarity(text: Column): Column =
    SentimentExpressions.lexiconPolarity(text)

  /** X-2 full contract: the BOTH halves of `TextBlob(text).sentiment`
    * as struct<polarity, subjectivity> — the reference reads only
    * `.polarity` (sentiment_analysis_dag.py:73), but the library
    * surface it calls returns the pair, so a user switching engines
    * keeps it. Subjectivity ∈ [0,1]: lexicon-matched assessments
    * averaged, intensifiers counting as assessments (the pattern-en
    * contract — factual text ≈ 0, opinionated ≈ 1). */
  def lexiconSentiment(text: Column): Column =
    lexSentimentUdf(text).cast("struct<polarity:double,subjectivity:double>")

  /** UDF fallbacks (kept for environments that forbid internal APIs). */
  def vaderCompoundUdfCol(text: Column): Column = vaderCompoundUdf(text)
  def lexiconPolarityUdfCol(text: Column): Column = lexPolarityUdf(text)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Score combination + 3-way classification + confidence
  * (SURVEY.md §2 X-3/X-4/X-5).
  *
  * Reference: `avg = (vader_compound + textblob_polarity) / 2`,
  * thresholded at ±0.1 into positive/negative/neutral, confidence =
  * |avg| (dags/sentiment_analysis_dag.py:75-81,91; threshold also
  * .env:42 SENTIMENT_CONFIDENCE_THRESHOLD=0.1).
  */
object Classify {

  val Threshold = 0.1

  /** X-3: average the two engine scores. */
  def combined(vaderCompound: Column, textblobPolarity: Column): Column =
    (vaderCompound + textblobPolarity) / 2

  /** X-4: ±threshold trichotomy. `>=` / `<=` exactly as the reference. */
  def overall(score: Column, threshold: Double = Threshold): Column =
    when(score >= threshold, "positive")
      .when(score <= -threshold, "negative")
      .otherwise("neutral")

  /** X-5: confidence = |score|. */
  def confidence(score: Column): Column = abs(score)

  /** The full sentiment struct (FIXTURES.md A.3). */
  def sentimentStruct(vaderCompound: Column, textblobPolarity: Column): Column = {
    val avg = combined(vaderCompound, textblobPolarity)
    struct(
      overall(avg).as("overall"),
      confidence(avg).as("confidence"),
      vaderCompound.as("vader_compound"),
      textblobPolarity.as("textblob_polarity"))
  }
}

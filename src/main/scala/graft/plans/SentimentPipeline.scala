package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** The reference's §3.3 analysis path as ONE Catalyst plan
  * (dags/sentiment_analysis_dag.py:31-130): extract → score → classify
  * → project, with the XCom/process boundaries collapsed into a single
  * DataFrame chain. Works over the harness `documents` table
  * (FIXTURES.md §C maps doc_id→url-key, text→article text). */
object SentimentPipeline {

  /** validate → sanitize → assemble → sentiment-score → classify. */
  def scored(documents: DataFrame): DataFrame = {
    val clean = Validate.sanitize(
      documents.filter(col("text").isNotNull && length(col("text")) > 0))
    val withText = TextStats.nonEmptyText(
      clean.withColumn("scoring_text",
        TextStats.truncate(trim(col("text")), 500)), "scoring_text")
    withText
      .withColumn("vader_compound",
        graft.functions.Sentiment.vaderCompound(col("scoring_text")))
      .withColumn("textblob_polarity",
        graft.functions.Sentiment.lexiconPolarity(col("scoring_text")))
      .withColumn("sentiment",
        Classify.sentimentStruct(col("vader_compound"), col("textblob_polarity")))
  }

  /** The flagship histogram: sentiment breakdown of the corpus
    * (elasticsearch_handler.py:82-93). */
  def histogram(documents: DataFrame): DataFrame =
    scored(documents)
      .groupBy(col("sentiment.overall").as("overall"))
      .agg(count(lit(1)).as("doc_count"))
}

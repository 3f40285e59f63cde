package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text assembly / truncation / derived stats
  * (SURVEY.md §2 F-9/F-10/F-11, S-13).
  *
  * Reference: scoring text = `title + " " + description + " " +
  * content[:500]` (dags/sentiment_analysis_dag.py:65-67), rows with
  * blank text skipped (dag:69-70), search-doc content truncated to
  * 1000 chars (dag:121); the ES mapping declares — but never computes —
  * `stats.word_count/char_count/has_content`
  * (configs/elasticsearch_config.py:78-84), which we implement.
  */
object TextStats {

  /** F-9: null-safe text assembly with the reference's 500-char
    * content clamp. */
  def assembleText(title: Column, description: Column, content: Column): Column =
    concat_ws(" ",
      coalesce(title, lit("")),
      coalesce(description, lit("")),
      substring(coalesce(content, lit("")), 1, 500))

  /** F-10: drop rows whose assembled text is blank. */
  def nonEmptyText(df: DataFrame, textCol: String): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)

  /** F-11: content truncation for the searchable projection. */
  def truncate(c: Column, n: Int): Column = substring(c, 1, n)

  /** S-13 derived stats columns. */
  def wordCount(text: Column): Column = size(split(trim(text), "\\s+"))
  def charCount(text: Column): Column = length(text)
  def hasContent(text: Column): Column = text.isNotNull && length(text) > 0

  def withStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("word_count", wordCount(t))
      .withColumn("char_count", charCount(t))
      .withColumn("has_content", hasContent(t))
  }
}

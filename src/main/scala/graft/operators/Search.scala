package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The read-side query surface (SURVEY.md §2 Q-1..Q-4, O-1/O-2, A-5).
  *
  * Reference: database/elasticsearch_handler.py —
  * `search_by_sentiment` (:64-69) = term filter + sort by published_at
  * desc + size; `search_by_keyword` (:71-80) = multi_match over
  * [title, content], OR-of-terms, relevance-ranked;
  * `get_sentiment_stats` (:82-93) = terms aggregation.
  *
  * Scale notes: filter+orderBy+limit compiles to
  * `TakeOrderedAndProject` (per-partition top-k, then a k-row merge on
  * the driver — no global sort, no full shuffle). The histogram is a
  * partial+final HashAggregate: the shuffle carries one row per
  * distinct key per partition, not the data.
  */
object Search {

  /** Q-1: term filter + recency sort + top-k. `tiebreak` keeps the
    * result set deterministic when sort keys collide. */
  def bySentiment(df: DataFrame, overallCol: String, sentiment: String,
                  sortCol: String, tiebreak: String, k: Int = 50): DataFrame =
    df.filter(col(overallCol) === sentiment)
      .orderBy(col(sortCol).desc, col(tiebreak))
      .limit(k)

  /** Q-2 relevance score: total occurrences of every query term across
    * the given fields (lowercased substring semantics — the analyzed
    * multi_match upgrade lives in functions.Analyzer). */
  def keywordScore(fields: Seq[Column], terms: Seq[String]): Column =
    fields.flatMap { f =>
      terms.map { t =>
        val lc = lower(f)
        (length(lc) - length(regexp_replace(lc, java.util.regex.Pattern.quote(t.toLowerCase), ""))) / t.length
      }
    }.reduce(_ + _)

  /** Q-2: OR-of-terms keyword search ranked by match count. */
  def byKeyword(df: DataFrame, fields: Seq[String], terms: Seq[String],
                tiebreak: String, k: Int = 50): DataFrame = {
    val score = keywordScore(fields.map(col), terms).cast("int")
    df.withColumn("score", score)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(tiebreak))
      .limit(k)
  }

  /** Q-3/A-5: terms aggregation — the sentiment histogram. */
  def termsAgg(df: DataFrame, field: String): DataFrame =
    df.groupBy(col(field)).agg(count(lit(1)).as("doc_count"))
}

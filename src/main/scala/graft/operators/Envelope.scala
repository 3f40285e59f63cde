package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Envelope / key construction (SURVEY.md §2 F-3/F-4, X-6/X-7).
  *
  * Reference: producers wrap each article as
  * `{source_api, fetched_at: utcnow().isoformat(), article}`
  * (producers/newsapi_producer.py:59-63) with Kafka key
  * `"{source_api}_{url}"` (newsapi_producer.py:65); the search sink
  * keys docs by `md5(url)` falling back to `md5(title)` when the url
  * is empty (dags/sentiment_analysis_dag.py:118,
  * database/elasticsearch_handler.py:95-101).
  */
object Envelope {

  /** X-7: ISO-8601 second-resolution format used across the reference. */
  val IsoFormat = "yyyy-MM-dd'T'HH:mm:ss"

  def isoTimestamp(c: Column): Column = date_format(c, IsoFormat)

  /** F-3: wrap the given article columns into the envelope shape. */
  def wrap(df: DataFrame, sourceApi: String, articleCols: Seq[String]): DataFrame =
    df.select(
      lit(sourceApi).as("source_api"),
      current_timestamp().as("fetched_at"),
      struct(articleCols.map(col): _*).as("article"))

  /** F-4: `key = f"{source}_{url}"` — also the natural shuffle key. */
  def messageKey(sourceApi: Column, url: Column): Column =
    concat(sourceApi, lit("_"), url)

  /** X-6: md5 doc id with title fallback for empty urls. */
  def docId(url: Column, title: Column): Column =
    md5(coalesce(nullif(url, lit("")), title).cast("binary"))
}

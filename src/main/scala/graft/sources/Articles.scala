package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Article-shaped sources (SURVEY.md §1.1, FIXTURES.md §A).
  *
  * The reference ingests two HTTP top-headline feeds (S-1 NewsAPI,
  * S-2 GNews; producers/newsapi_producer.py:17-45,
  * producers/gnews_producer.py:17-46) whose payloads are JSON article
  * lists. In-engine, a fetched payload directory is just a JSON scan
  * with an explicit schema — the union of the two API shapes
  * (newsapi: source{id,name}/author/urlToImage; gnews:
  * source{name,url}/image), validated on title/url/publishedAt only.
  */
object Articles {

  /** A.1 raw article — union of the NewsAPI and GNews shapes. */
  val articleSchema: StructType = StructType(Seq(
    StructField("source", StructType(Seq(
      StructField("id", StringType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("url", StringType, nullable = true))), nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("urlToImage", StringType, nullable = true),
    StructField("image", StringType, nullable = true),
    StructField("publishedAt", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  /** A.2 envelope (Kafka value / raw_news row shape). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("source_api", StringType, nullable = false),
    StructField("fetched_at", TimestampType, nullable = false),
    StructField("article", articleSchema, nullable = true),
    StructField("inserted_at", TimestampType, nullable = true)))

  /** S-1/S-2 harness mode: scan a directory of fetched JSON payloads
    * (one article object per line) with the explicit union schema —
    * schema-on-read, no inference pass. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(articleSchema).json(path)

  /** Flatten an article batch for the validation/scoring operators
    * (the nested struct stays the storage shape; operators see
    * top-level columns). */
  def flatten(articles: DataFrame): DataFrame =
    articles.select(
      col("source"), col("author"), col("title"), col("description"),
      col("url"), col("publishedAt"), col("content"))
}

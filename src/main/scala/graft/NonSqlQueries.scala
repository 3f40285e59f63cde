package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries whose semantics DuckDB cannot replay in ANSI SQL (sentiment
  * scoring, stemming, MinHash/SimHash/LSH, ANN search, multimodal
  * featurization). They still register in [[SparkEntry.queries]] so the
  * driver's rows-only check runs them end-to-end; their correctness
  * lives in the ScalaTest suites (src/test/scala/graft). Populated by
  * the sentiment / dedup / similarity modules. */
object NonSqlQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
}

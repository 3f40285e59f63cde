package graft

import org.apache.spark.sql.functions._

/** Driver-contract smoke: entry() returns rows; the sentiment pipeline
  * produces sane classified output end-to-end on sf0.001. */
class EntrySmokeSpec extends SparkSpec {

  test("entry() histogram is non-empty and covers only valid labels") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("positive", "negative", "neutral")))
    assert(rows.map(_.getLong(1)).sum == 500L)
  }

  test("scored() exposes the full sentiment struct") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val s = plans.SentimentPipeline.scored(docs)
      .select("doc_id", "sentiment.overall", "sentiment.confidence",
        "sentiment.vader_compound", "sentiment.textblob_polarity")
    val r = s.head()
    assert(Set("positive", "negative", "neutral")(r.getString(1)))
    assert(r.getDouble(2) >= 0.0)
  }

  test("every declared oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("vaderScores struct column has named fields") {
    import spark.implicits._
    val df = Seq("I love this, it is great!").toDF("t")
      .select(functions.Sentiment.vaderScores(col("t")).as("s"))
      .select("s.neg", "s.neu", "s.pos", "s.compound")
    val r = df.head()
    assert(r.getDouble(3) > 0.5)
  }
}

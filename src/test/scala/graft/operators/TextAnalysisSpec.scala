package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge cases for the corpus-quality ops the oracles can't surface
  * (the harness corpus has no empty/degenerate docs). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: degenerate docs") {
    val df = Seq(
      (1L, "a a a a"),            // one token repeated
      (2L, "w x y z"),            // all distinct
      (3L, ""),                   // empty
      (4L, "solo")                // single token: no bigrams
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((0.75, 1.0)))  // 1 distinct of 4; "a a" is every bigram
    assert(rows(2L)._1 == 0.0)
    assert(rows(2L)._2 == 1.0 / 3.0)   // 3 distinct bigrams, max count 1
    assert(rows(3L) == ((0.0, 0.0)))
    assert(rows(4L)._2 == 0.0)         // no bigrams -> 0
  }

  test("packIntoBins: bins advance with the running token budget") {
    val docs = (0L until 10L).map(i => (i, Seq.fill(3)("w").mkString(" ")))
      .toDF("doc_id", "text") // 3 tokens each
    val out = TextAnalysis.packIntoBins(docs, "doc_id", "text",
        budgetTokens = 5, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "bin").as[(Long, Long)].collect()
    // cum before doc: 0,3,6,9,... -> bins 0,0,1,1,2,2,3,...
    assert(out.toSeq == (0L until 10L).map(i => (i, i * 3 / 5)))
    // shards partition independently
    val sharded = TextAnalysis.packIntoBins(docs, "doc_id", "text", 5, shards = 2)
    assert(sharded.filter(col("shard") === 0).agg(min("bin")).head().getLong(0) == 0)
    assert(sharded.filter(col("shard") === 1).agg(min("bin")).head().getLong(0) == 0)
  }
}

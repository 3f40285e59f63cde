package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TopKAgg
import graft.sources.Tables

/** Bounded top-k aggregate + batch cosine retrieval built on it. */
class TopKBatchSpec extends SparkSpec {
  import spark.implicits._

  test("topk agg keeps the k best by (score desc, id asc)") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.7), (1L, 13L, 0.9),
      (2L, 20L, 0.1)
    ).toDF("g", "id", "s")
    val r = df.groupBy($"g")
      .agg(TopKAgg.topk($"s", $"id", 2).as("top"))
      .select($"g", $"top".cast("array<struct<id:long,score:double>>"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    // g=1: two 0.9 ties -> id 11 then 13; 0.7 cut
    assert(r(1L) == Seq((11L, 0.9), (13L, 0.9)))
    assert(r(2L) == Seq((20L, 0.1)))
  }

  test("topk agg is partitioning-independent (merge path exercised)") {
    val big = (0L until 1000L).map(i => (i % 7, i, (i % 13).toDouble / 13.0))
      .toDF("g", "id", "s")
    def run(parts: Int) = big.repartition(parts)
      .groupBy($"g").agg(TopKAgg.topk($"s", $"id", 5).as("top"))
      .orderBy($"g").collect().toSeq.map(_.toString)
    assert(run(1) == run(17))
  }

  test("batch top-k agrees with single-query brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val batch = Similarity.topKBatch(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 5L), k = 8)
    val single0 = Similarity.topKBruteForce(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding",
      emb.filter($"vec_id" === 0).select($"embedding".cast("array<double>"))
        .as[Seq[Double]].head(), k = 8)
      .as[(Long, Double)].collect().toSeq
    val batch0 = batch.filter($"query_id" === 0).orderBy($"rank")
      .select($"vec_id", $"cos").as[(Long, Double)].collect().toSeq
    assert(batch0 == single0)
    assert(batch.filter($"query_id" === 5).count() == 8)
  }

  test("ranks are 1..k and ordered by cosine desc") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = Similarity.topKBatch(emb, "vec_id", "embedding",
      queryIds = Seq(3L), k = 6)
      .orderBy($"rank").select($"rank", $"cos")
      .as[(Long, Double)].collect().toSeq
    assert(r.map(_._1) == (1L to 6L))
    assert(r.map(_._2) == r.map(_._2).sorted(Ordering[Double].reverse))
  }
}

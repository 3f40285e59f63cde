package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quality-argmax keeper selection over near-dup clusters. */
class QualityKeeperSpec extends SparkSpec {
  import spark.implicits._

  // cluster {1,2,3} via pairs; 4 is a singleton
  private val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
  private val docs = Seq(
    (1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L)
  ).toDF("doc_id", "quality")

  private def run() =
    Dedup.clusterVerdictsBy(docs, "doc_id", pairs, col("quality"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq

  test("keeper is the score argmax, ties broken by smaller id") {
    // 2 and 3 tie at 9 -> 2 wins; comp label stays the min id (1)
    assert(run() == Seq(
      (1L, 1L, 5L, false),
      (2L, 1L, 9L, true),
      (3L, 1L, 9L, false),
      (4L, 4L, 1L, true)))
  }

  test("singletons always keep") {
    assert(run().filter(_._1 == 4L).head._4)
  }

  test("agrees with min-id verdicts when score is -id") {
    // score = -id makes argmax pick the min id: must equal clusterVerdicts
    val byScore = Dedup.clusterVerdictsBy(docs, "doc_id", pairs, -col("doc_id"))
      .select($"doc_id", $"comp", $"keep")
      .orderBy("doc_id").collect().toSeq
    val expected = Dedup.clusterVerdicts(pairs)
      .withColumnRenamed("id", "doc_id")
    val joined = docs.select($"doc_id").join(expected, Seq("doc_id"), "left")
      .withColumn("comp", coalesce($"comp", $"doc_id"))
      .withColumn("keep", coalesce($"keep", lit(true)))
      .orderBy("doc_id").collect().toSeq
    assert(byScore == joined)
  }

  test("deterministic under input partitioning") {
    val a = Dedup.clusterVerdictsBy(docs.repartition(7), "doc_id",
      pairs.repartition(3), col("quality")).orderBy("doc_id").collect().toSeq
    val b = Dedup.clusterVerdictsBy(docs.coalesce(1), "doc_id",
      pairs.coalesce(1), col("quality")).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import MinHashAgg.{estimateJaccard, minhashAgg}

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val corpusA = Seq(
    "the quick brown fox jumps over the lazy dog",
    "sphinx of black quartz judge my vow").toDF("text")
  private val corpusB = Seq(
    "the quick brown fox jumps over the lazy dog",   // shared doc
    "pack my box with five dozen liquor jugs").toDF("text")

  private def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(minhashAgg(col("text")).as("sig")).as[Seq[Long]].head()

  test("signature is deterministic and sized numHashes") {
    val s1 = sig(corpusA); val s2 = sig(corpusA)
    assert(s1 == s2)
    assert(s1.length == 64)
    assert(s1.forall(_ != Long.MaxValue))
  }

  test("union property: sig(A ∪ B) = elementwise min of sig(A), sig(B)") {
    val sUnion = sig(corpusA.union(corpusB))
    val expected = sig(corpusA).zip(sig(corpusB)).map { case (x, y) => math.min(x, y) }
    assert(sUnion == expected)
  }

  test("jaccard estimate: identical corpora 1.0, disjoint near 0") {
    assert(estimateJaccard(sig(corpusA), sig(corpusA)) == 1.0)
    val disjoint = Seq("completely different words entirely").toDF("text")
    assert(estimateJaccard(sig(corpusA), sig(disjoint)) < 0.2)
    val overlap = estimateJaccard(sig(corpusA), sig(corpusB))
    assert(overlap > 0.2 && overlap < 0.9) // one shared doc of two
  }

  test("grouped: per-source corpus signatures in one scan") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sigs = docs.groupBy(col("source"))
      .agg(minhashAgg(col("text")).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs.size > 1)
    assert(sigs.values.forall(_.length == 64))
  }
}

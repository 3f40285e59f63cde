package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupApproxSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and columnar formats"),
    (4L, "completely different content about spark query engines and columnar format"), // near-dup of 3
    (5L, "an unrelated sentence mentioning databases and distributed systems design")
  ).toDF("doc_id", "text")

  test("shingles: sliding word n-grams, distinct") {
    val sh = corpus.filter($"doc_id" === 5)
      .select(DedupApprox.shingles($"text", 3)).as[Seq[String]].head()
    assert(sh.contains("an unrelated sentence"))
    assert(sh.forall(_.split(" ").length == 3))
  }

  test("minhashPairs finds exactly the planted near-dup pairs") {
    val pairs = DedupApprox.minhashPairs(corpus, "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("minhash jaccard estimate is close to exact") {
    val j = DedupApprox.minhashPairs(corpus, "doc_id", "text", threshold = 0.1)
      .filter($"id_a" === 1 && $"id_b" === 2)
      .select("jaccard").as[Double].head()
    assert(j > 0.6 && j < 1.0) // 11 of 13 shingles shared
  }

  test("simhashPairs finds the near-dups and not the unrelated doc") {
    val pairs = DedupApprox.simhashPairs(corpus, "doc_id", "text",
      maxHamming = 12, chunks = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
    assert(!pairs.contains((1L, 5L)) && !pairs.contains((2L, 5L)))
  }

  test("jaccardPairs is exact") {
    val pairs = DedupApprox.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (3L, 4L)))
    pairs.foreach(p => assert(p._3 > 0.5 && p._3 < 1.0))
  }

  test("identical docs get jaccard 1.0") {
    val dup = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val j = DedupApprox.jaccardPairs(dup, "doc_id", "text", threshold = 0.9)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),     // cos 1 with query
    (2L, Array(0.0f, 1.0f, 0.0f)),     // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)),    // opposite
    (4L, Array(1.0f, 1.0f, 0.0f))      // cos ~0.707
  ).toDF("vec_id", "embedding")

  test("cosine: known geometry") {
    val out = Similarity.topKBruteForce(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), 5).as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0) < 1e-9)
    assert(math.abs(out(2L)) < 1e-9)
    assert(math.abs(out(3L) + 1.0) < 1e-9)
    assert(math.abs(out(4L) - math.sqrt(0.5)) < 1e-9)
  }

  test("top-k order and size") {
    val top2 = Similarity.topKBruteForce(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), 2).as[(Long, Double)].collect()
    assert(top2.length == 2)
    assert(top2.head._1 == 0L || top2.head._1 == 1L) // cos=1 ties broken by id
    assert(top2.map(_._2).toSeq == top2.map(_._2).sorted.reverse.toSeq)
  }

  test("lsh bucket: identical vectors share a bucket; query finds its twin") {
    val planes = Similarity.hyperplanes(3, 4)
    val b = Similarity.withBucket(vecs, "embedding", planes)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(b(0L) == b(1L))
    val top = Similarity.topKLsh(vecs.filter($"vec_id" =!= 0), "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), 3, numPlanes = 4).as[(Long, Double)].collect()
    assert(top.map(_._1).contains(1L))
  }

  test("nearDupPairs finds the identical pair") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, numPlanes = 4, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}

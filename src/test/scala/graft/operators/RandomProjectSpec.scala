package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rademacher JL projection: integer exactness against a hand
  * computation, norm-concentration on real embeddings, scan-local
  * plan shape, and composition with the cosine query path. */
class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hand-computed projection on a unit basis vector") {
    // v = e_3 on the 1e-3 grid -> qv = (0, 0, 1000). Each output
    // comp is just sign(j, 3) * 1000.
    val df = Seq((7L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, "vec_id", "embedding",
      dim = 3, outDim = 4).as[(Long, Long, Long)].collect().sortBy(_._2)
    val signs = Similarity.rademacher(3, 4)
    assert(out.toSeq == signs.zipWithIndex.map { case (row, j) =>
      (7L, (j + 1).toLong, row(2) * 1000L)
    })
  }

  test("deterministic and partition-invariant") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val a = Similarity.randomProject(emb, "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Long)].collect().toSet
    val b = Similarity.randomProject(emb.repartition(11), "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("JL concentration: projected norms track original norms") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val qNorm = emb.select($"vec_id",
        aggregate(transform($"embedding".cast("array<double>"),
          x => floor(x * 1000 + lit(0.5)).cast("long")),
          lit(0L), (a, x) => a + x * x).as("n2"))
      .as[(Long, Long)].collect().toMap
    val pNorm = Similarity.randomProjectVectors(emb, "vec_id", "embedding", 64, 16)
      .select($"vec_id",
        aggregate($"proj", lit(0L), (a, x) => a + x * x).as("p2"))
      .as[(Long, Long)].collect()
    // E[p2] = outDim * n2; the ratio r = p2/(16*n2) concentrates as
    // chi²₁₆/16 — per-vector within loose bounds, mean tightly at 1.
    val ratios = pNorm.collect { case (id, p2) if qNorm(id) > 0 =>
      p2.toDouble / (16.0 * qNorm(id)) }
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"worst ratios: ${ratios.sorted.take(2).mkString(",")} / ${ratios.sorted.takeRight(2).mkString(",")}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.25, s"mean ratio $mean")
  }

  test("scan-local: no Exchange in the physical plan") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val plan = Similarity.randomProject(emb, "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("JL pairwise-distance concentration and cosine rank signal") {
    // What 64 -> 16 actually guarantees on this corpus: the test
    // embeddings are near-isotropic (max pairwise cos 0.48, top-k
    // separations ~0.03), so FINE ranking under a 16-dim projection
    // is mathematically out of reach (JL inner-product noise
    // ~1/sqrt(16) = 0.25 >> 0.03) — a shortlist-recall assertion
    // here would test the corpus, not the operator. The operator's
    // contract is distance CONCENTRATION (ratio ~ chi²₁₆/16 per
    // pair) plus a global rank signal, both asserted.
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val qv = emb.select($"vec_id",
        transform($"embedding".cast("array<double>"),
          x => floor(x * 1000 + lit(0.5)).cast("long")).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    val pv = Similarity.randomProjectVectors(emb, "vec_id", "embedding", 64, 16)
      .select($"vec_id", $"proj").as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
    val others = qv.keys.filter(_ != 0L).toSeq
    val ratios = others.map { id =>
      d2(pv(0L), pv(id)) / (16.0 * d2(qv(0L), qv(id))) }
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"worst: ${ratios.min} / ${ratios.max}")
    // All ratios share vector 0's projection draw, so they are
    // CORRELATED samples — the mean can drift further from 1 than
    // 499 independent pairs would (the independent per-vector norm
    // test above pins the mean tightly; this bound is the honest
    // one for correlated pairs).
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.6, s"mean distance ratio $mean")
    // Rank signal: projected cosine vs exact cosine against query 0
    // correlates well above chance (|corr| under the null is
    // ~1/sqrt(499) = 0.045).
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val ce = others.map(id => cos(qv(0L), qv(id)))
    val cp = others.map(id => cos(pv(0L), pv(id)))
    val (me, mp) = (ce.sum / ce.size, cp.sum / cp.size)
    val corr = ce.zip(cp).map { case (a, b) => (a - me) * (b - mp) }.sum /
      (math.sqrt(ce.map(a => (a - me) * (a - me)).sum) *
        math.sqrt(cp.map(b => (b - mp) * (b - mp)).sum))
    assert(corr > 0.15, s"cosine rank correlation $corr")
  }
}

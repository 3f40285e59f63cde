package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The IVFPQ composition: cells prune, ADC shortlists, refine pays
  * exactness — and with an exhaustive refine budget the whole thing
  * collapses to the plain IVF probe, row for row. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("results come only from the query's probed cells") {
    val cents = Similarity.smallestIdCentroids(emb, "vec_id", "embedding", 8)
    val centSeq = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val probes = Similarity.ivfProbeOf(qv, centSeq, 3).toSet
    val cells = Similarity.ivfPqTopK(emb, "vec_id", "embedding", queryId = 0L,
      numCells = 8, nprobe = 3, k = 10)
      .select($"assigned").distinct().as[Long].collect().toSet
    assert(cells.subsetOf(probes))
  }

  test("exhaustive refine budget ≡ plain IVF probe, row for row") {
    val cents = Similarity.smallestIdCentroids(emb, "vec_id", "embedding", 8)
      .localCheckpoint()
    val n = emb.count().toInt
    val ivf = Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents,
      queryId = 0L, nprobe = 3, k = 10)
      .select($"vec_id".cast("long"), $"assigned", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    // refine×k ≥ corpus ⇒ the ADC shortlist keeps every in-cell
    // candidate ⇒ exact re-rank over the same set the IVF probe ranks
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding", queryId = 0L,
      numCells = 8, nprobe = 3, k = 10, refine = n)
      .select($"vec_id".cast("long"), $"assigned", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    assert(ivfpq == ivf)
  }

  test("default refine budget keeps most of the IVF head (recall)") {
    val cents = Similarity.smallestIdCentroids(emb, "vec_id", "embedding", 8)
      .localCheckpoint()
    val k = 10
    val ivf = Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents,
      queryId = 0L, nprobe = 3, k = k)
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding", queryId = 0L,
      numCells = 8, nprobe = 3, k = k, refine = 8)
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    val recall = (ivf intersect ivfpq).size.toDouble / k
    info(s"IVFPQ vs IVF recall@$k = $recall")
    assert(recall >= 0.5)
  }
}

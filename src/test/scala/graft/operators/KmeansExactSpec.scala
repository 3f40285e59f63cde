package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer-exact Lloyd trainer: hand-traced 1-D run, assignment
  * optimality against the trained centroids, empty-cell survival,
  * partitioning invariance, and the double-centroid adapter's
  * compatibility with the IVF query path. */
class KmeansExactSpec extends SparkSpec {
  import spark.implicits._

  // 1-D corpus on the 1e-3 grid: quantizes to [0, 1, 10, 11].
  private lazy val tiny = Seq(
    (0L, Seq(0.0f)), (1L, Seq(0.001f)), (2L, Seq(0.01f)), (3L, Seq(0.011f))
  ).toDF("vec_id", "embedding")

  test("hand-traced 1-D run: centroids converge to the two pairs") {
    // init c0=[0] c1=[1]; iter1 assigns {0}|{1,10,11} (10 is 100 vs
    // 81 away), means -> c0=[0], c1=floor((2*22+3)/6)=[7]; iter2
    // assigns {0,1}|{10,11}, means -> c0=floor((2*1+2)/4)=[1],
    // c1=floor((2*21+2)/4)=[11]; iter3 is a fixpoint. Final
    // assignment: (0,c0,1) (1,c0,0) (2,c1,1) (3,c1,0).
    val out = Similarity.kmeansExact(tiny, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, 1L), (1L, 0L, 0L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("assignment optimality: every dist is the min over the trained centroids") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.kmeansExactState(emb, "vec_id", "embedding", k = 4, iters = 2)
      .as[(Long, Seq[Long])].collect()
    val assigned = Similarity.kmeansExact(emb, "vec_id", "embedding", k = 4, iters = 2)
      .as[(Long, Long, Long)].collect()
    val qvs = emb.select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1000 + lit(0.5))).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    assigned.foreach { case (id, cell, dist) =>
      val best = cents.map { case (cid, cq) =>
        (cq.zip(qvs(id)).map { case (c, x) => (x - c) * (x - c) }.sum, cid)
      }.min
      assert((best._1, best._2) == ((dist, cell)), s"vec $id")
    }
  }

  test("empty cell keeps its previous centroid; ties break to the smallest cid") {
    // three identical points, k=2: both init centroids equal, every
    // point ties and lands in cell 0; cell 1 never gets members but
    // survives in the state table.
    val same = Seq((0L, Seq(0.005f)), (1L, Seq(0.005f)), (2L, Seq(0.005f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansExact(same, "vec_id", "embedding", k = 2, iters = 2)
    assert(out.select("cell").distinct().as[Long].collect().toSeq == Seq(0L))
    val state = Similarity.kmeansExactState(same, "vec_id", "embedding", k = 2, iters = 2)
    assert(state.count() == 2)
  }

  test("deterministic under repartitioning") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Similarity.kmeansExact(emb, "vec_id", "embedding", k = 4, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Similarity.kmeansExact(emb.repartition(7), "vec_id", "embedding",
        k = 4, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("kmeansExactCentroids feeds ivfTopKWith") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.kmeansExactCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val hits = Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents,
      queryId = 0L, nprobe = 2, k = 5)
    assert(hits.count() == 5)
  }
}

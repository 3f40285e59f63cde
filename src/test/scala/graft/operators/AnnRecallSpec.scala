package graft.operators

import graft.SparkSpec

/** recallAgainst: set-overlap accounting, extra approximate hits
  * ignored, per-query isolation. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  test("overlap and recall per query; spurious approx rows ignored") {
    val truth = Seq((0L, 10L), (0L, 11L), (0L, 12L), (0L, 13L),
      (1L, 20L), (1L, 21L)).toDF("query_id", "vec_id")
    val approx = Seq((0L, 10L), (0L, 12L), (0L, 99L),  // 2 of 4 + noise
      (1L, 20L), (1L, 21L), (1L, 22L)).toDF("query_id", "vec_id")
    val out = Similarity.recallAgainst(truth, approx, "vec_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((4L, 2L, 500000L)))
    assert(out(1L) == ((2L, 2L, 1000000L)))
  }

  test("end-to-end: IVF probe recall against exact top-k on a grid") {
    // 40 vectors on a ring; IVF with 8 centroids / 3 probes should
    // recover most of the exact top-10 for query 0
    val vecs = (0 until 40).map { i =>
      val a = 2 * math.Pi * i / 40.0
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("vec_id", "embedding")
    val truth = Similarity.topKBatch(vecs, "vec_id", "embedding",
      Seq(0L), 10).select($"query_id", $"vec_id")
    val approx = Similarity.ivfTopK(vecs, "vec_id", "embedding", 0L,
        numCentroids = 8, nprobe = 3, k = 10)
      .select(org.apache.spark.sql.functions.lit(0L).as("query_id"),
        $"vec_id")
    val r = Similarity.recallAgainst(truth, approx, "vec_id").collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getLong(3) >= 500000L,   // ring geometry: ≥ half recovered
      s"recall ${r.getLong(3)}")
  }
}

package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables

/** FAISS-IVFPQ at rest: the cell-partitioned layout with PQ codes in
  * every row, so a probe is (1) partition pruning, (2) an ADC pass
  * reading only (id, codes) — m bytes per row — and (3) an exact
  * refine of shortlist ids. Each reduction is asserted as a PLAN/I-O
  * property, and the whole path is row-identical to the in-memory
  * [[Similarity.ivfPqTopKWith]] on the same model tables. */
class IvfPqAtRestSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val cents = Similarity
    .smallestIdCentroids(emb, "vec_id", "embedding", numCentroids = 8)
    .localCheckpoint()
  private lazy val codebook = Similarity
    .pqTrain(emb, "vec_id", "embedding", m = 8, k = 16)
    .localCheckpoint()

  private lazy val layout: String = {
    val out = Files.createTempDirectory("graft_ivfpq_rest").toString
    Similarity.writeIvfPqPartitioned(emb, "vec_id", "embedding",
      cents, codebook, out)
    out
  }

  private lazy val qv: Seq[Double] = emb.filter($"vec_id" === 0L)
    .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
  private lazy val centSeq = cents.collect()
    .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
  private lazy val probes = Similarity.ivfProbeOf(qv, centSeq, nprobe = 3)

  test("layout: codes ride next to cell, no rows lost") {
    val back = spark.read.parquet(layout)
    assert(back.count() == emb.count())
    assert(back.columns.contains("codes") && back.columns.contains("cell"))
    val lens = back.select(org.apache.spark.sql.functions.size($"codes"))
      .distinct().as[Int].collect()
    assert(lens.sameElements(Array(8)))
  }

  test("ADC phase prunes cells AND reads only (id, codes) — never the vector") {
    val shortlist = Similarity.pqShortlistAtRest(spark, layout, "vec_id",
      codebook, qv, probes, excludeId = 0L, n = 80)
    val plan = shortlist.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter in:\n$plan")
    // m-bytes-per-row claim: the scan's ReadSchema carries the codes
    // column and the dim×8-byte embedding column appears NOWHERE in
    // the shortlist plan
    assert(plan.contains("codes"), s"codes not read in:\n$plan")
    assert(!plan.contains("embedding"),
      s"vector column read during the ADC phase:\n$plan")
  }

  test("at-rest IVFPQ == in-memory ivfPqTopKWith on the same models, row for row") {
    val inMem = Similarity.ivfPqTopKWith(emb, "vec_id", "embedding",
      cents, codebook, queryId = 0L, nprobe = 3, k = 20, refine = 4)
      .select($"vec_id".cast("long"), $"assigned", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    val atRest = Similarity.ivfPqTopKAtRest(spark, layout, "vec_id",
      "embedding", cents, codebook, queryId = 0L, nprobe = 3, k = 20,
      refine = 4)
      .select($"vec_id".cast("long"), $"assigned", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    assert(atRest.nonEmpty && atRest == inMem)
  }

  test("exhaustive refine over the layout ≡ the plain at-rest IVF probe") {
    // re-ranking every in-cell candidate exactly IS the IVF probe —
    // the codebook can only affect WHICH candidates survive a tight
    // shortlist, so an exhaustive budget erases it
    val n = spark.read.parquet(layout).count().toInt
    val ivfLayout = Files.createTempDirectory("graft_ivf_plain").toString
    Similarity.writeIvfPartitioned(emb, "vec_id", "embedding", cents, ivfLayout)
    val plain = Similarity.ivfTopKAtRest(spark, ivfLayout, "vec_id",
      "embedding", cents, queryId = 0L, nprobe = 3, k = 20)
      .select($"vec_id".cast("long"), $"cos")
      .as[(Long, Double)].collect().toSeq
    val pq = Similarity.ivfPqTopKAtRest(spark, layout, "vec_id",
      "embedding", cents, codebook, queryId = 0L, nprobe = 3, k = 20,
      refine = n)
      .select($"vec_id".cast("long"), $"cos")
      .as[(Long, Double)].collect().toSeq
    assert(pq == plain)
  }
}

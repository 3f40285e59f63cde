package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** IVF partition-at-rest: the corpus written `partitionBy(cell)` via
  * the same assignment expression the in-memory probe uses, so a
  * probe query prunes to `nprobe` cell directories — the Scaladoc's
  * "at rest the corpus partitions by cell" claim as demonstrated
  * behavior, not prose. */
class IvfAtRestSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val cents =
    Similarity.smallestIdCentroids(emb, "vec_id", "embedding", numCentroids = 8)

  private lazy val layout: String = {
    val out = Files.createTempDirectory("graft_ivf_rest").toString
    Similarity.writeIvfPartitioned(emb, "vec_id", "embedding", cents, out)
    out
  }

  test("layout: one directory per non-empty cell, no rows lost") {
    val back = spark.read.parquet(layout)
    assert(back.count() == emb.count())
    val cellDirs = new java.io.File(layout).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty &&
      cellDirs.length == back.select("cell").distinct().count())
  }

  test("probe prunes: PartitionFilters carries the cell predicate") {
    val q = Similarity.ivfTopKAtRest(spark, layout, "vec_id", "embedding",
      cents, queryId = 0L, nprobe = 3, k = 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter in:\n$plan")
  }

  test("probe touches only nprobe cell directories (input_file_name proof)") {
    val nprobe = 3
    // recompute the probe set the operator derives internally
    val centSeq = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val probes = Similarity.ivfProbeOf(qv, centSeq, nprobe).toSet
    // directories actually read by the pruned scan (pre-top-k, so
    // every surviving file shows up)
    val touched = spark.read.parquet(layout)
      .filter($"cell".isin(probes.toSeq: _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
      .map(f => f.split("/").find(_.startsWith("cell=")).get
        .stripPrefix("cell=").toLong).toSet
    assert(touched == probes, s"read $touched, probes were $probes")
    // and cells exist beyond the probed ones — pruning had something to skip
    val allCells = spark.read.parquet(layout)
      .select($"cell".cast("long")).distinct().as[Long].collect().toSet
    assert((allCells -- probes).nonEmpty)
  }

  test("at-rest top-k matches the in-memory IVF probe exactly") {
    val inMem = Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents,
      queryId = 0L, nprobe = 3, k = 20)
      .select($"vec_id".cast("long"), $"assigned", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    val atRest = Similarity.ivfTopKAtRest(spark, layout, "vec_id", "embedding",
      cents, queryId = 0L, nprobe = 3, k = 20)
      .select($"vec_id".cast("long"), $"assigned", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    assert(atRest == inMem)
  }
}

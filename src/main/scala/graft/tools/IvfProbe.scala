package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Measure the IVF centroid-count / nprobe trade: cell scan fraction
  * and recall@20 vs exact brute force, averaged over several query
  * vectors. Numbers land in SCALING.md's IVF table. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val queryIds = Seq(0L, 11L, 222L, 333L, 444L)

    def exact(qid: Long): Set[Long] = {
      val q = broadcast(emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>").as("qv")))
      emb.filter(col("vec_id") =!= qid).crossJoin(q)
        .select(col("vec_id"),
          Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
        .collect().map(_.getLong(0)).toSet
    }
    val exactTop = queryIds.map(q => q -> exact(q)).toMap
    val n = emb.count() - 1

    for (cells <- Seq(8, 16, 32); nprobe <- Seq(1, 2, 3, cells / 2)) {
      var recall = 0.0
      var scanned = 0L
      for (qid <- queryIds) {
        val r = Similarity.ivfTopK(emb, "vec_id", "embedding", queryId = qid,
          numCentroids = cells, nprobe = nprobe, k = 20)
          .collect().map(_.getLong(0)).toSet
        recall += r.intersect(exactTop(qid)).size.toDouble / 20.0
        // scan volume = corpus rows whose assigned cell is probed; the
        // ivfTopK result doesn't expose it, so recount the filter side
        scanned += Similarity.ivfTopK(emb, "vec_id", "embedding", queryId = qid,
          numCentroids = cells, nprobe = nprobe, k = Int.MaxValue).count()
      }
      val q = queryIds.size
      println(f"[ivfprobe] cells=$cells%3d nprobe=$nprobe%2d scan=${scanned.toDouble / (n * q)}%6.3f recall@20=${recall / q}%5.2f")
    }

    // trained (k-means) vs untrained cells at the same scan budget
    for (cells <- Seq(8, 16); nprobe <- Seq(1, 3)) {
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = cells, iters = 5).localCheckpoint()
      var recall = 0.0
      var scanned = 0L
      for (qid <- queryIds) {
        val r = Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents,
          queryId = qid, nprobe = nprobe, k = 20)
          .collect().map(_.getLong(0)).toSet
        recall += r.intersect(exactTop(qid)).size.toDouble / 20.0
        scanned += Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents,
          queryId = qid, nprobe = nprobe, k = Int.MaxValue).count()
      }
      val q = queryIds.size
      println(f"[ivfprobe] TRAINED cells=$cells%3d nprobe=$nprobe%2d scan=${scanned.toDouble / (n * q)}%6.3f recall@20=${recall / q}%5.2f")
    }
    spark.stop()
  }
}

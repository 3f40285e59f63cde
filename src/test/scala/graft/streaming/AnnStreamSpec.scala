package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables

case class QVec(qid: Long, vec: Seq[Double])

/** Streaming ANN serving path: live query vectors probe the standing
  * cell-assigned corpus (the at-rest IVF layout read back) and must
  * return EXACTLY the batch ivfTopKWith answer — plus effectively-
  * exact ranking across several queries in one micro-batch. */
class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming probe over the at-rest layout ≡ batch ivfTopKWith") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_ivf").toString
    val outDir = s"$dir/out"; val ckDir = s"$dir/ck"; val ivfDir = s"$dir/ivf"

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Similarity.smallestIdCentroids(emb, "vec_id", "embedding", 8)
      .localCheckpoint()
    Similarity.writeIvfPartitioned(emb, "vec_id", "embedding", centroids, ivfDir)
    val corpus = spark.read.parquet(ivfDir).cache()

    val qids = Seq(100L, 250L, 499L)
    val qvecs = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[QVec]
    mem.addData(qids.map(q => QVec(q, qvecs(q))): _*)
    val cands = AnnStream.ivfCandidates(mem.toDF(), "qid", "vec",
      corpus, "vec_id", "embedding", centroids, nprobe = 3)
    val q = AnnStream.topKSink(cands, k = 10, outDir, ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (qid, rs) =>
        qid -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      }
    qids.foreach { qid =>
      val expect = Similarity.ivfTopKWith(emb, "vec_id", "embedding",
          centroids, qid, nprobe = 3, k = 10)
        .select(col("vec_id").cast("long"), col("cos"))
        .as[(Long, Double)].collect().toSeq
      assert(got(qid) == expect, s"query $qid diverged")
    }
  }

  test("a query vector absent from the corpus still ranks (pure serving)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_srv").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Similarity.smallestIdCentroids(emb, "vec_id", "embedding", 8)
      .localCheckpoint()
    val cents = centroids.as[(Long, Seq[Double])].collect().toSeq
    // synthetic query = centroid 0 vector nudged; id far outside corpus
    val qv = cents.head._2.map(_ * 1.01)
    val corpus = Similarity.withCells(emb, "embedding", centroids).cache()

    val mem = MemoryStream[QVec]
    mem.addData(QVec(1000000L, qv))
    val cands = AnnStream.ivfCandidates(mem.toDF(), "qid", "vec",
      corpus, "vec_id", "embedding", centroids, nprobe = 2)
    val q = AnnStream.topKSink(cands, k = 5, s"$dir/out", s"$dir/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.read.parquet(s"$dir/out")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(rows.length == 5)
    assert(rows.map(_._1).forall(_ == 1000000L))
    // ranked best-first with the (cos DESC, id ASC) total order
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

/** x38 maxBucket cap-saturation probe (round-10 verdict task #3): for
  * the exact media frame x38 builds at a given sfDir, reports — per
  * LSH table and per candidate plane count — the bucket-occupancy
  * profile the pair enumeration actually sees: occupied buckets, max
  * occupancy, buckets OVER the cap (those drop, trading recall),
  * members inside dropped buckets, and the Σ s(s−1)/2 candidate-pair
  * count both uncapped and under the cap. The exponent-0.94 sweep row
  * (SCALING.md round 9) is in-bucket pair growth; this measures
  * whether the default cap (4096) saturates at 10× and what one more
  * plane buys.
  *
  * Usage: runMain graft.tools.X38Probe <sfDir> [numPlanes,...]
  */
object X38Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planeCounts: Seq[Int] = args.lift(1)
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(6, 8, 10))
    val maxBucket = 4096
    val numTables = 3
    val spark = Tables.bootstrap(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-x38-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    // the x38 frame verbatim (NonSqlQueries): every fifth doc, each
    // raster once PNG + once JPEG
    val payload = udf((seed: Long, enc: Int) => {
      val raster = Multimodal.synthRaster(seed)
      if (enc == 0) Multimodal.encodePng(raster)
      else Multimodal.encodeJpeg(raster)
    })
    val media = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), explode(array(lit(0), lit(1))).as("enc"))
      .select((col("doc_id") * 2 + col("enc")).cast("long").as("media_id"),
        payload(col("doc_id"), col("enc")).as("payload"))
    val emb = Multimodal.gridEmbedding(media, 4, 4).localCheckpoint()
    val n = emb.count()
    println(s"""{"sf_dir":"$sfDir","n_media":$n,"max_bucket":$maxBucket}""")

    planeCounts.foreach { planes =>
      (0 until numTables).foreach { t =>
        val hp = Similarity.hyperplanes(48, planes, 42L + 1000L * t)
        val occ = Similarity.withBucket(emb, "embedding", hp)
          .groupBy(col("bucket")).agg(count(lit(1)).as("s"))
          .agg(count(lit(1)).as("buckets"), max(col("s")).as("max_occ"),
            sum(when(col("s") > maxBucket, 1L).otherwise(0L)).as("capped_buckets"),
            sum(when(col("s") > maxBucket, col("s")).otherwise(0L)).as("capped_members"),
            sum(col("s") * (col("s") - 1) / 2).as("pairs_uncapped"),
            sum(when(col("s") <= maxBucket, col("s") * (col("s") - 1) / 2)
              .otherwise(0L)).as("pairs_capped"))
          .collect()(0)
        println(s"""{"planes":$planes,"table":$t,"buckets":${occ.getLong(0)},""" +
          s""""max_occ":${occ.getLong(1)},"capped_buckets":${occ.getLong(2)},""" +
          s""""capped_members":${occ.getLong(3)},""" +
          s""""pairs_uncapped":${occ.getAs[Any](4)},"pairs_capped":${occ.getAs[Any](5)}}""")
      }
    }
    spark.stop()
  }
}

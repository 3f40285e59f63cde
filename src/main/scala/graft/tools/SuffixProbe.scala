package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SuffixArray
import graft.sources.Tables

/** Measures the prefix-doubling state sizes backing the q87 analysis
  * in SCALING.md: positions, and distinct rank-pair counts per round
  * (the table each round dense-ranks — bounded by distinct 2^k-grams).
  */
object SuffixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val pos = SuffixArray.doublingRanks(docs, "doc_id", "text", minRun = 2)
      .cache()
    println(s"positions: ${pos.count()}")
    // round-k distinct pairs: run the chain at increasing thresholds
    // and count distinct ranks (== distinct 2^k-grams incl. sentinels).
    Seq(2, 4, 8).foreach { l =>
      val r = SuffixArray.doublingRanks(docs, "doc_id", "text", minRun = l)
      val d = r.agg(countDistinct(col("r"))).head().getLong(0)
      println(s"distinct ${l}-gram ranks: $d")
    }
    spark.stop()
  }
}

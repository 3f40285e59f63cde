package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{Graph, TextAnalysis}
import graft.sources.Tables

/** Decomposes q102's cost: winnow pair derivation vs the iteration
  * loop, on the bench data. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    for (_ <- 1 to 2) {
      val pairs = TextAnalysis.winnowPairs(
        Tables.documents(spark, sfDir), "doc_id", "text", minShared = 1L)
      val n = time("winnowPairs count")(pairs.count())
      println(s"[probe] pairs=$n")
      val cached = time("pairs cache")(
        { val c = pairs.localCheckpoint(); c.count(); c })
      time("pageRank on cached edges")(
        Graph.pageRankUndirected(cached, "id_a", "id_b").count())
      time("q102 end-to-end")(
        Graph.pageRankUndirected(
          TextAnalysis.winnowPairs(Tables.documents(spark, sfDir),
            "doc_id", "text", minShared = 1L), "id_a", "id_b").count())
    }
    spark.stop()
  }
}

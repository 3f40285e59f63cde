package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.InvertedIndex
import graft.sources.Tables

/** Separates the inverted index's BUILD cost (linear in corpus — the
  * one-time/incremental term) from its SERVE cost (posting-list-
  * sized — the term that must stay flat as the corpus grows). Run at
  * two scales and compare the serve rows: that flatness is the whole
  * reason the index exists.
  *
  *   sbt "runMain graft.tools.IndexProbe /root/testdata/sf0.1"
  *   sbt "runMain graft.tools.IndexProbe /tmp/sf1_derived"
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.bootstrap(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    docs.count() // warm-up
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-probe").toString
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("build (corpus-linear)      ")(
      InvertedIndex.writeIndex(docs, "doc_id", Seq("text"), idx))
    val terms = Seq("dup", "window", "scan")
    // min of 3: the serve path is seconds-scale, JIT noise matters
    val serve = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      InvertedIndex.scored(spark, idx, terms)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"serve (posting-list-sized) : $serve%.2f s")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d); docs.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val isBench = col("doc_id") % 97 === 0
    val base = docs.filter(!isBench)
    // stage attribution (each stage includes its upstream)
    val cleaned = TextAnalysis.c4LineCleanText(base, "text", minWords = 3,
      requireTerminalPunct = false)
    time("1 cleaned         ")(cleaned.write.format("noop").mode("overwrite").save())
    val annotated = TextAnalysis.withRepetition(
      TextAnalysis.withQuality(
        TextAnalysis.withLangId(cleaned, "text_clean"), "text_clean"), "text_clean")
    time("2 annotated       ")(annotated.write.format("noop").mode("overwrite").save())
    val pairs = DedupApprox.minhashPairs(
      annotated.select(col("doc_id"), col("text_clean")), "doc_id", "text_clean",
      threshold = 0.5)
    time("3 +minhash pairs  ")(pairs.write.format("noop").mode("overwrite").save())
    val verdicts = Dedup.clusterVerdictsBy(annotated, "doc_id", pairs, col("q_n_tokens"))
    time("4 +CC verdicts    ")(verdicts.write.format("noop").mode("overwrite").save())
    // full q74 and q92 for reference
    time("q74 full          ")(graft.SparkEntry.queries("q74_corpus_funnel")(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("q92 full          ")(graft.SparkEntry.queries("q92_corpus_funnel_ext")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

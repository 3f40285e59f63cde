package graft.tools
import org.apache.spark.sql.SparkSession
object Q87Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d)
    docs.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // stage 1: the chain alone, round by round
    Seq(2, 4, 8).foreach { l =>
      time(s"doublingRanks minRun=$l")(
        graft.operators.SuffixArray.doublingRanks(docs, "doc_id", "text", l).count())
    }
    time("q87 full (stats minRun=8) r1")(
      graft.operators.SuffixArray.dupRunStats(docs, "doc_id", "text", 8)
        .write.format("noop").mode("overwrite").save())
    time("q87 full r2")(
      graft.operators.SuffixArray.dupRunStats(docs, "doc_id", "text", 8)
        .write.format("noop").mode("overwrite").save())
    time("q88 full (profile maxRun=16) r1")(
      graft.operators.SuffixArray.dupRunProfile(docs, "doc_id", "text", 16)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object SubProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d); docs.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def run(): Unit = graft.operators.TextAnalysis.substringDedup(docs, "doc_id", "text", 8)
      .write.format("noop").mode("overwrite").save()
    // warm both paths first, then interleave 3 measured pairs
    run(); spark.conf.set("graft.scan.width", "0"); run()
    (1 to 3).foreach { i =>
      spark.conf.set("graft.scan.width", "32")
      time(s"wide m$i")(run())
      spark.conf.set("graft.scan.width", "0")
      time(s"off  m$i")(run())
    }
    spark.stop()
  }
}

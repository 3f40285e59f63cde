package graft.tools
import org.apache.spark.sql.SparkSession
object Q80Probe {
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
    def q80(): Unit =
      graft.operators.FuzzyJoin.fuzzyTitlePairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    time("q80 scanWide on  r1")(q80()); time("q80 scanWide on  r2")(q80())
    spark.conf.set("graft.scan.width", "0")
    time("q80 scanWide off r1")(q80()); time("q80 scanWide off r2")(q80())
    spark.conf.set("graft.scan.width", "32")
    time("q80 scanWide 32  r3")(q80())
    spark.conf.set("graft.scan.width", "0")
    time("q80 scanWide off r3")(q80())
    spark.stop()
  }
}

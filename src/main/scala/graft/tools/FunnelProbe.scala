package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    graft.sources.Tables.documents(spark, d).count()
    def q74(): Unit = graft.SparkEntry.queries("q74_corpus_funnel")(spark, d)
      .write.format("noop").mode("overwrite").save()
    def q92(): Unit = graft.SparkEntry.queries("q92_corpus_funnel_ext")(spark, d)
      .write.format("noop").mode("overwrite").save()
    time("q74 width=default r1")(q74()); time("q74 width=default r2")(q74())
    time("q92 width=default r1")(q92()); time("q92 width=default r2")(q92())
    spark.conf.set("graft.scan.width", "0")
    time("q74 width=0 (off)  r1")(q74())
    time("q92 width=0 (off)  r1")(q92())
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object Q95Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.1", "/tmp/sf1_derived").foreach { d =>
      val df = graft.SparkEntry.queries("q95_range_join")(spark, d)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Broadcast")).take(6).toSeq
      println(s"=== $d"); joins.foreach(l => println(l.trim.take(120)))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted plans for selected queries (dev tool). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q04_anti_join", "q10_freshness_count",
        "q20_join_star", "q07_topk_recent", "x12_cosine_topk")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

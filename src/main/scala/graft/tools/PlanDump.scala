package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print a query's final (AQE-finalized) physical plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect() // finalize AQE on this QueryExecution (see CodegenAudit)
      println(s"==== $n")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}

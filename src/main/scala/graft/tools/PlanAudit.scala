package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints `explain(formatted)` for the named SparkEntry queries —
  * the plan-shape audit loop (scan pushdown, exchange count,
  * codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.sources.Tables.bootstrap(SparkSession.builder()
      .master("local[4]").appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"\n===== $name =====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

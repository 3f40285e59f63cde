package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pin down the BENCH_r02 x16 regression (0.91 s -> 6.71 s with no
  * query change): time approx_count_distinct at several rsd settings,
  * with and without a preceding warm-up, mirroring Bench's session
  * config exactly. */
object X16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[x16probe] $name%-50s $s%8.3f s"); s
    }

    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val li = Tables.lineitem(spark, sfDir)

    for (run <- 1 to 3; rsd <- Seq(0.05, 0.01)) {
      t(s"run$run rsd=$rsd") {
        li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), rsd).as("a"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // exact-distinct comparison point
    t("exact count_distinct") {
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("a"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Analyzer
import graft.sources.Tables

/** Dev probe: is x04's stem UDF evaluated twice (filter pushdown
  * duplicating the aliased score expression)? */
object X04Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[x04probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val old = docs
      .select(col("doc_id"),
        Analyzer.analyzedMatchCount(col("text"), "sorted merging windows").as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    val fixed = docs
      .select(col("doc_id"),
        Analyzer.analyzedMatchCount(col("text"), "sorted merging windows").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
      .filter(col("score") > 0)

    timed("warmup")(old.collect())
    timed("old (filter pushes into UDF)")(old.collect())
    timed("fixed (filter after top-k)")(fixed.collect())
    timed("old again")(old.collect())
    timed("fixed again")(fixed.collect())
    val a = old.collect().map(_.toString).toSet
    val b = fixed.collect().map(_.toString).toSet
    println(s"[x04probe] results identical: ${a == b} (${a.size} rows)")
    assert(a == b)
  }
}

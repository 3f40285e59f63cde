package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** The 100 TB co-location story, proven on a plan: tables bucketed on
  * the join key join WITHOUT any Exchange (SCALING.md "q20 at real
  * scale wants orders/customer co-partitioned"). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed+sorted tables sort-merge join with zero shuffles") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_b_orders")
    Tables.lineitem(spark, dir).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_b_lineitem")

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_b_orders")
        .join(spark.table("graft_b_lineitem"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // bucket-pruned scan: the join needs no Exchange at all; only the
      // final 1-row aggregation exchanges
      val joinPart = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinPart.contains("Exchange"), plan)
      assert(j.collect().map(_.getLong(1)).sum == 6000L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter($"event_type" === "purchase")
    val scan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters, not a row-level Filter
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), scan)
    val total = spark.read.parquet(dir).count()
    val pruned = q.count()
    assert(pruned > 0 && pruned < total)
  }
}

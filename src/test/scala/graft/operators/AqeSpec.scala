package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Evidence that the engine leans on AQE for runtime re-planning —
  * the mechanism SCALING.md cites for the 100 TB join strategy: plans
  * whose build-side size is unknowable statically (opaque filters)
  * still end up broadcast once runtime shuffle stats reveal a small
  * side, with no hint in the query. */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  test("AQE re-plans a statically-unknown join to broadcast at runtime") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val fact = (1L to 20000L).map(i => (i, i % 97)).toDF("id", "k")
      val dim = (1L to 20000L).map(i => (i, s"d$i")).toDF("did", "name")
        // opaque predicate: stats can't see ~20 rows survive
        .filter(pmod(crc32(col("did").cast("string")), lit(1000)) === 0)
      val joined = fact.join(dim, col("k") === pmod(col("did"), lit(97)))
      joined.collect() // executes → AQE finalizes the plan
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AdaptiveSparkPlan isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}

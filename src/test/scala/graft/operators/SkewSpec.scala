package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew mitigation: salted plans produce EXACTLY the unsalted answer
  * while spreading hot keys, and the salted join's probe side really
  * does fan a viral key over the salt range. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one viral key (90% of rows) + a long tail
  private lazy val skewed = (1L to 2000L)
    .map(i => (if (i <= 1800) "viral" else s"k${i % 40}", i, i % 7))
    .toDF("key", "id", "v")

  private lazy val dim = skewed.select(col("key")).distinct()
    .withColumn("w", length(col("key")).cast("long"))

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, "key")
      .select("key", "id", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", numSalts = 8)
      .select("key", "id", "v", "w")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("the viral key's rows spread over the salt range") {
    val salts = skewed
      .withColumn("__salt",
        pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter(col("key") === "viral")
      .select(col("__salt")).distinct().count()
    assert(salts == 8L, s"viral key used only $salts of 8 salts")
  }

  test("saltedJoin joins on (key, salt), not key alone") {
    val plan = Skew.saltedJoin(skewed, dim, "key", numSalts = 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("saltedAgg equals the plain groupBy") {
    val plain = skewed.groupBy(col("key"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "key", numSalts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}

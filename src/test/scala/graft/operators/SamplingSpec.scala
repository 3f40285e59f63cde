package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 5000L).toDF("id")

  test("sample rate lands near the requested permille and is deterministic") {
    val n1 = Sampling.samplePermille(ids, "id", 100).count()
    val n2 = Sampling.samplePermille(ids, "id", 100).count()
    assert(n1 == n2) // rerun-stable
    assert(math.abs(n1 - 500.0) / 500.0 < 0.2, s"got $n1, want ~500")
  }

  test("split is disjoint and exhaustive") {
    val (train, test) = Sampling.split(ids, "id", 200)
    assert(train.count() + test.count() == 5000)
    assert(train.join(test, "id").isEmpty)
    // monotone: a smaller holdout is a subset of a larger one
    val (_, smaller) = Sampling.split(ids, "id", 100)
    assert(smaller.join(test, Seq("id"), "left_anti").isEmpty)
  }

  test("stratified rates apply per stratum; unlisted strata drop") {
    val df = ids.withColumn("s", when(col("id") % 3 === 0, "a")
      .when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratified(df, "id", "s", Map("a" -> 1000, "b" -> 0))
    assert(out.filter(col("s") === "a").count() == df.filter(col("s") === "a").count())
    assert(out.filter(col("s") === "b").isEmpty)
    assert(out.filter(col("s") === "c").isEmpty)
  }
}

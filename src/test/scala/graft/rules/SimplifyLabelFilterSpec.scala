package graft.rules

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Classify

class SimplifyLabelFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ SimplifyLabelFilter
    try f finally spark.experimental.extraOptimizations = prev
  }

  private val scores =
    Seq(Some(0.5), Some(0.1), Some(0.05), Some(-0.1), Some(-0.9), None)
      .toDF("score")

  test("rewrites label equality into threshold predicates (no CaseWhen left)") {
    withRule {
      val q = scores.withColumn("overall", Classify.overall(col("score")))
        .filter(col("overall") === "positive")
        .select(col("score"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.toLowerCase.contains("case"), optimized)
      assert(q.as[Option[Double]].collect().flatten.toSet == Set(0.5, 0.1))
    }
  }

  test("same rows with and without the rule, for every label incl. NULL score") {
    for (label <- Seq("positive", "negative", "neutral")) {
      val base = scores.withColumn("overall", Classify.overall(col("score")))
        .filter(col("overall") === label).select(col("score"))
      val plain = base.collect().map(Option(_).map(_.get(0))).toSet
      val ruled = withRule {
        scores.withColumn("overall", Classify.overall(col("score")))
          .filter(col("overall") === label).select(col("score"))
          .collect().map(Option(_).map(_.get(0))).toSet
      }
      assert(ruled == plain, s"label=$label")
    }
    // the NULL score must survive as 'neutral' (CASE else-branch)
    withRule {
      val neutral = scores.withColumn("overall", Classify.overall(col("score")))
        .filter(col("overall") === "neutral")
      assert(neutral.filter(col("score").isNull).count() == 1)
    }
  }

  // A CASE with no ELSE yields NULL labels; under NOT, SQL drops those
  // rows (NOT NULL → NULL). A naive rewrite to FALSE would keep them
  // (NOT FALSE → TRUE) — the rule must leave nested equalities alone.
  private def partialLabel =
    when(col("score") >= 0.1, "positive")
      .when(col("score") <= -0.1, "negative") // no otherwise → NULL gap

  test("does NOT rewrite under NOT: no-ELSE CASE `!=` keeps SQL null semantics") {
    val base = scores.withColumn("overall", partialLabel)
      .filter(col("overall") =!= "positive").select(col("score"))
    val plain = base.collect().map(r => Option(r.get(0))).toSet
    val ruled = withRule {
      scores.withColumn("overall", partialLabel)
        .filter(col("overall") =!= "positive").select(col("score"))
        .collect().map(r => Option(r.get(0))).toSet
    }
    assert(ruled == plain)
    // and concretely: the NULL-label rows (0.05 and NULL score) are dropped
    assert(ruled == Set(Some(-0.1), Some(-0.9)))
  }

  test("does NOT rewrite inside OR disjuncts") {
    val cond = (col("overall") === "positive") || col("score").isNull
    val plain = scores.withColumn("overall", partialLabel)
      .filter(cond).count()
    val ruled = withRule {
      scores.withColumn("overall", partialLabel).filter(cond).count()
    }
    assert(ruled == plain)
  }

  test("rewrites each top-level conjunct independently") {
    withRule {
      val q = scores.withColumn("overall", Classify.overall(col("score")))
        .filter(col("overall") === "positive" && col("score") > 0.2)
        .select(col("score"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.toLowerCase.contains("case"), optimized)
      assert(q.as[Option[Double]].collect().flatten.toSet == Set(0.5))
    }
  }
}

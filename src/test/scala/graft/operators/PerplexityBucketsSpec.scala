package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CCNet head/middle/tail selection: holdout train/score split,
  * per-language tercile balance, perplexity ordering across buckets,
  * and the approx scale path's window-free plan + monotone agreement
  * with the exact contract. */
class PerplexityBucketsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val isClean = col("source") === "src0"

  test("clean slice trains, only the rest is bucketed") {
    val out = LmScore.perplexityBuckets(docs, "doc_id", "text", isClean)
    val nClean = docs.filter(isClean).count()
    val nRest = docs.filter(!isClean).count()
    assert(out.count() == nRest && nClean > 0)
    val cleanIds = docs.filter(isClean).select("doc_id").as[Long].collect().toSet
    val outIds = out.select("doc_id").as[Long].collect().toSet
    assert(outIds.intersect(cleanIds).isEmpty)
  }

  test("per-language tercile populations differ by at most one") {
    val out = LmScore.perplexityBuckets(docs, "doc_id", "text", isClean)
    val pops = out.groupBy($"lang", $"bucket").count()
      .groupBy($"lang").agg(min($"count").as("lo"), max($"count").as("hi"))
      .as[(String, Long, Long)].collect()
    assert(pops.nonEmpty)
    pops.foreach { case (lang, lo, hi) => assert(hi - lo <= 1, lang) }
  }

  test("head is at least as probable as tail within every language") {
    val out = LmScore.perplexityBuckets(docs, "doc_id", "text", isClean)
    val stats = out.groupBy($"lang")
      .agg(min(when($"bucket_label" === "head", $"avg_lp_q")).as("head_min"),
        max(when($"bucket_label" === "tail", $"avg_lp_q")).as("tail_max"))
      .as[(String, Option[Double], Option[Double])].collect()
    stats.foreach { case (lang, headMin, tailMax) =>
      for (h <- headMin; t <- tailMax) assert(h >= t, lang)
    }
  }

  test("labels map bucket 1/2/3 to head/middle/tail") {
    val out = LmScore.perplexityBuckets(docs, "doc_id", "text", isClean)
    val m = out.select($"bucket", $"bucket_label").distinct()
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("approx path: no window, no global sort in the physical plan") {
    val plan = LmScore.perplexityBucketsApprox(docs, "doc_id", "text", isClean)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx variant must not window")
    assert(!plan.contains("rangepartitioning"), s"global sort in:\n$plan")
  }

  test("approx buckets are monotone in avg_lp_q within a language") {
    val out = LmScore.perplexityBucketsApprox(docs, "doc_id", "text", isClean)
      .select($"lang", $"avg_lp_q", $"bucket")
      .as[(String, Double, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(-_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, b1), (_, _, b2)) => assert(b1 <= b2)
        case _ =>
      }
    }
    // same doc universe as the exact contract
    assert(out.length ==
      LmScore.perplexityBuckets(docs, "doc_id", "text", isClean).count())
  }

  test("sampled variant: head >= tail within a language, partition-stable") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = LmScore.perplexityBucketsSampled(docs, "doc_id", "text",
        col("source") === "src0")
      .select($"lang", $"avg_lp_q", $"bucket", $"bucket_label").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    // within each language, every head doc scores >= every tail doc
    out.groupBy(_._1).foreach { case (_, rs) =>
      val heads = rs.filter(_._4 == "head").map(_._2)
      val tails = rs.filter(_._4 == "tail").map(_._2)
      if (heads.nonEmpty && tails.nonEmpty)
        assert(heads.min >= tails.max)
      // labels consistent with bucket ids
      rs.foreach { case (_, _, b, l) =>
        assert(l == (if (b == 1) "head" else if (b == 3) "tail" else "middle"))
      }
    }
    val rep = LmScore.perplexityBucketsSampled(docs.repartition(11),
        "doc_id", "text", col("source") === "src0")
      .select($"doc_id", $"bucket").as[(Long, Long)].collect().toSet
    val base = LmScore.perplexityBucketsSampled(docs, "doc_id", "text",
        col("source") === "src0")
      .select($"doc_id", $"bucket").as[(Long, Long)].collect().toSet
    assert(rep == base)
  }
}

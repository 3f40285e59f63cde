package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-engine logistic-regression quality classifier: feature hashing,
  * integer-grid training dynamics, separable-corpus accuracy, and
  * partitioning invariance (the property that makes q66's oracle
  * replay possible at all). */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // separable two-class corpus: class tokens never co-occur
  private lazy val docs = ((0L until 40L).map(i =>
    (i, s"great wonderful excellent item ${i % 7}")) ++
    (100L until 140L).map(i =>
      (i, s"awful terrible broken item ${i % 7}")))
    .toDF("doc_id", "text")

  private val label = col("doc_id") < 100L

  test("hashedFeatures: sparse integer counts in [0, dim)") {
    val f = LogReg.hashedFeatures(docs, "doc_id", "text", dim = 64)
    val range = f.agg(min($"f"), max($"f"), min($"x")).as[(Long, Long, Long)].head()
    assert(range._1 >= 0 && range._2 < 64 && range._3 >= 1)
    // one row per (doc, feature)
    assert(f.groupBy("doc_id", "f").count().filter($"count" =!= 1).count() == 0)
  }

  test("training separates a separable corpus (accuracy 1.0)") {
    val scored = LogReg.trainScore(docs, "doc_id", "text", label,
      dim = 256, iters = 2)
    val acc = scored.filter(($"pred" && $"y" === 1L) || (!$"pred" && $"y" === 0L))
      .count().toDouble / 80
    assert(acc == 1.0, s"accuracy $acc")
    // margins carry real signal, not a constant
    val margins = scored.select($"y", $"margin_q").as[(Long, Long)].collect()
    assert(margins.filter(_._1 == 1L).map(_._2).min >
      margins.filter(_._1 == 0L).map(_._2).max)
  }

  test("weights live on the integer grid and are model-sized") {
    val w = LogReg.train(docs, "doc_id", "text", label, dim = 64, iters = 2)
    assert(w.count() <= 64)
    assert(w.schema("w").dataType.typeName == "long")
    // the positive-class tokens carry positive weight
    val posF = LogReg.featureId(lit("great"), 64)
    val negF = LogReg.featureId(lit("awful"), 64)
    val ids = docs.limit(1).select(posF.as("p"), negF.as("n"))
      .as[(Long, Long)].head()
    val wm = w.as[(Long, Long)].collect().toMap
    assert(wm(ids._1) > 0 && wm(ids._2) < 0)
  }

  test("deterministic under repartitioning (integer sums, no float state)") {
    val a = LogReg.trainScore(docs, "doc_id", "text", label, dim = 64, iters = 2)
      .orderBy("doc_id").collect().toSeq
    val b = LogReg.trainScore(docs.repartition(13), "doc_id", "text", label,
      dim = 64, iters = 2).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}

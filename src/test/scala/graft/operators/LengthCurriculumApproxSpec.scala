package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scale-path curriculum variant (approx-quantile boundaries +
  * scan-local comparison chain) against its exact-ntile twin: same
  * schema, monotone non-overlapping bins, near-decile populations,
  * doc-level agreement on tie-free data, and no global sort in the
  * physical plan — the property that makes it the 100 TB form. */
class LengthCurriculumApproxSpec extends SparkSpec {
  import spark.implicits._

  // 2000 docs with distinct-ish token counts 1..2000 (shuffled order
  // via a multiplicative permutation so input order ≠ length order)
  private lazy val docs = (0 until 2000)
    .map { i =>
      val n = ((i * 733) % 2000) + 1
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }
    .toDF("doc_id", "text")

  test("same output schema as the exact variant") {
    val exact = TextAnalysis.lengthCurriculum(docs, "doc_id", "text")
    val approx = TextAnalysis.lengthCurriculumApprox(docs, "doc_id", "text")
    assert(approx.schema.map(f => (f.name, f.dataType)) ==
      exact.schema.map(f => (f.name, f.dataType)))
  }

  test("bins are monotone and non-overlapping in token counts") {
    val rows = TextAnalysis.lengthCurriculumApprox(docs, "doc_id", "text")
      .orderBy("bin")
      .select($"bin", $"min_tokens", $"max_tokens")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).sameElements(1L to rows.length.toLong))
    rows.sliding(2).foreach {
      case Array((_, _, hiLo), (_, loHi, _)) => assert(hiLo < loHi)
      case _ =>
    }
  }

  test("near-decile populations on a spread-out distribution") {
    val pops = TextAnalysis.lengthCurriculumApprox(docs, "doc_id", "text")
      .select($"n_docs").as[Long].collect()
    assert(pops.sum == 2000)
    assert(pops.length == 10)
    // distinct lengths + accuracy 10000 → sketch is near-exact; allow
    // ±20% of the ideal 200/bin for boundary rounding
    pops.foreach(p => assert(p >= 160 && p <= 240, s"bin pop $p"))
  }

  test("agrees with exact ntile doc-for-doc on tie-free lengths") {
    val approx = TextAnalysis
      .lengthCurriculumApproxAssign(docs, "doc_id", "text")
      .select($"doc_id", $"bin".as("bin_a"))
    val nToks = size(graft.functions.Analyzer.tokenize(coalesce($"text", lit(""))))
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"n_tokens", $"doc_id")
    val exact = docs.select($"doc_id", nToks.as("n_tokens"))
      .withColumn("bin_e", ntile(10).over(w).cast("long"))
      .select($"doc_id", $"bin_e")
    val n = approx.join(exact, "doc_id")
    val agree = n.filter($"bin_a" === $"bin_e").count()
    assert(agree >= (0.9 * 2000).toLong, s"only $agree/2000 agree")
  }

  test("ties at a boundary share a bin (deterministic, length-pure)") {
    // all docs the same length → every doc lands in bin 1
    val same = (0 until 100).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val bins = TextAnalysis.lengthCurriculumApproxAssign(same, "doc_id", "text")
      .select($"bin").distinct().as[Long].collect()
    assert(bins.sameElements(Array(1L)))
  }

  test("null text binned as zero tokens, no doc dropped") {
    val withNull = docs.withColumn("text",
      when($"doc_id" === 7L, lit(null: String)).otherwise($"text"))
    val assign = TextAnalysis
      .lengthCurriculumApproxAssign(withNull, "doc_id", "text")
    assert(assign.count() == 2000)
    val row = assign.filter($"doc_id" === 7L)
      .select($"n_tokens", $"bin").as[(Long, Long)].head()
    assert(row == ((0L, 1L)))
  }

  test("physical plan has no global sort and no window exchange") {
    val plan = TextAnalysis.lengthCurriculumApprox(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx variant must not window")
    // the only exchanges allowed: the sketch agg, the broadcast of the
    // 1-row boundary frame, and the bins-row final agg — never a
    // rangepartitioning (global sort) exchange
    assert(!plan.contains("rangepartitioning"), s"global sort in:\n$plan")
  }

  test("works on the real documents table") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.lengthCurriculumApprox(
      graft.sources.Tables.documents(spark, dir), "doc_id", "text")
    val pops = out.select($"n_docs").as[Long].collect()
    assert(pops.sum > 0 && pops.length >= 2)
  }

  test("sampled variant: monotone bins, partition-stable, covers all docs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.lengthCurriculumSampled(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).sum == docs.count())
    // bins range-disjoint in token counts
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3,
        s"bin ${a._1} max ${a._4} > bin ${b._1} min ${b._3}")
      case _ =>
    }
    val rep = TextAnalysis.lengthCurriculumSampled(docs.repartition(13),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(rep == out.toSet)
  }
}

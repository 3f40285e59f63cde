package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The codegen'd Hash64 expression: identical to the Scala
  * rollingHashOf on every input (including non-ASCII and surrogate
  * pairs — UTF-16 unit semantics), evaluated inside whole-stage
  * codegen, interpreted path agreeing with the generated one. */
class Hash64Spec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  private val samples = Seq("", "a", "scan", "the quick brown fox",
    "café über", "naïve résumé", "🙂 emoji pair", "a" * 300,
    "line\nbreak\ttab", "0123456789' apostrophe")

  test("expression == reference fold on varied inputs (incl. UTF-16 pairs)") {
    val got = samples.toDF("s")
      .select(col("s"), Hash64.hash64Col(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    samples.foreach(s => assert(got(s) == ref(s), s"input '$s'"))
  }

  test("randomized strings == reference (3 seeds)") {
    for (seed <- Seq(19L, 83L, 5555L)) {
      val strs = (0 until 200).map { i =>
        val len = math.abs((i * 2654435761L + seed) % 40).toInt
        (0 until len).map(j =>
          (97 + math.abs((i * 31L + j * 7L + seed) % 26)).toChar).mkString
      }
      val got = strs.toDF("s")
        .select(Hash64.hash64Col(col("s")).as("h")).as[Long].collect().toSeq
      assert(got == strs.map(ref), s"seed $seed")
    }
  }

  test("null propagates; the fingerprint wrapper pins null to 0") {
    val df = Seq(Some("x"), None).toDF("s")
    val hs = df.select(Hash64.hash64Col(col("s"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(hs.toSeq == Seq(Some(ref("x")), None))
    val fps = df.select(
      graft.operators.TextAnalysis.fingerprint(col("s")).as("fp"))
      .as[Long].collect().toSeq
    assert(fps == Seq(ref("x"), 0L))
  }

  test("the projection stays inside whole-stage codegen (no UDF break)") {
    // a local Seq relation folds at optimization time; a file-backed
    // scan forces the real projection
    val dir = java.nio.file.Files.createTempDirectory("graft-h64").toString
    samples.toDF("s").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(Hash64.hash64Col(col("s")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage in this
    // rendering; the projection carrying the hash must be starred
    assert(plan.contains("*(1) Project [graft_hash64"))
    assert(!plan.contains("BatchEvalUDF") && !plan.contains("ScalaUDF"))
    // and the generated path agrees with the data
    val got = df.as[Long].collect().sorted.toSeq
    assert(got == samples.map(ref).sorted)
  }
}

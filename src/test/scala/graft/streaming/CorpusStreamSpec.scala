package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Pii, Sampling, TextAnalysis}

case class Doc(doc_id: Long, text: String)

/** The training-data cleaning chain is stream-compatible: language ID,
  * quality scoring, token counts and repetition stats are stateless
  * projections (scan-local, no shuffle), so the SAME operators that
  * run over a 100 TB batch corpus drop into a readStream → transform
  * → writeStream micro-batch with zero changes — the property that
  * lets one codebase serve both the backfill and the live ingest. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  test("langid + quality + tokens + repetition compose on a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(1L, "the quick brown fox jumps over the lazy dog"),
      Doc(2L, "der hund und die katze sind nicht da"),
      Doc(3L, "spam spam spam spam spam spam"),
      Doc(4L, ""))

    val cleaned = TextAnalysis.withTokenCounts(
      TextAnalysis.withQuality(
        TextAnalysis.withLangId(mem.toDF(), "text"), "text"), "text")
    // the single-pass kernel rewrite made repetitionStats a pure
    // projection — the old explode+groupBy form was NOT appendable
    val rep = TextAnalysis.repetitionStats(mem.toDF(), "doc_id", "text")

    val q1 = cleaned.writeStream.format("memory").queryName("cleaned")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1.awaitTermination()
    // repetitionStats is also a pure projection now — streamable too
    val q2 = rep.writeStream.format("memory").queryName("rep")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val out = spark.table("cleaned").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang_pred"), r.getAs[Long]("q_n_tokens"), r.getAs[Long]("tok_ws"))))
      .toMap
    assert(out(1L)._1 == "en")
    assert(out(2L)._1 == "de")
    assert(out(1L)._2 == 9L)
    assert(out.size == 4)

    val repOut = spark.table("rep").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_unigram_frac")).toMap
    assert(repOut(3L) > 0.8)  // six identical tokens
    assert(repOut(1L) < 0.2)  // "the" repeats once in nine tokens
    assert(repOut(4L) == 0.0)
  }

  test("PII scrub and mixture upsample are stream-compatible too") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(1L, "reach me at jane.doe@example.org or 10.1.2.3"),
      Doc(2L, "nothing sensitive here"))

    // both are stateless projections (PII: codegen'd regexp; upsample:
    // sequence-explode), so they append-stream without watermarks
    val scrubbed = Pii.piiStats(mem.toDF(), "doc_id", "text")
    val mixed = Sampling.upsample(
      mem.toDF().withColumn("stratum", lit("a")),
      "doc_id", "stratum", Map("a" -> 2000))

    val q1 = scrubbed.writeStream.format("memory").queryName("scrubbed")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1.awaitTermination()
    val q2 = mixed.writeStream.format("memory").queryName("mixed")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val pii = spark.table("scrubbed").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_ip")))).toMap
    assert(pii(1L) == ((1L, 1L)))
    assert(pii(2L) == ((0L, 0L)))
    assert(spark.table("mixed").count() == 4L)  // factor 2.0 → 2 copies each
  }
}

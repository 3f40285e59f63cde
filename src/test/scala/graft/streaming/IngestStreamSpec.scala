package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Msg(url: String, title: String, ts: Timestamp)

/** T-1..T-5 semantics via MemoryStream micro-batches (SURVEY.md §5.4):
  * effectively-once landing under duplicate delivery, validation drops,
  * idempotent re-processing. */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("landing is effectively-once under duplicate + redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("graft-land").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    val mem = MemoryStream[Msg]
    mem.addData(
      Msg("https://ex.com/a", "A", ts("2024-01-01 10:00:00")),
      Msg("https://ex.com/a", "A dup", ts("2024-01-01 10:00:01")),   // intra-batch dup key
      Msg("https://ex.com/b", "B", ts("2024-01-01 10:01:00")),
      Msg("", "no url", ts("2024-01-01 10:02:00")),                  // F-1 drop
      Msg("https://ex.com/c", "", ts("2024-01-01 10:03:00")))        // F-1 drop (empty title)

    IngestStream.runLanding(mem.toDF(), "newsapi", "url", "ts",
      target, ckpt, "title").awaitTermination()

    val landed = spark.read.parquet(target)
    assert(landed.select("key").as[String].collect().toSet ==
      Set("newsapi_https://ex.com/a", "newsapi_https://ex.com/b"))

    // redelivery in a later batch: anti-join sink lands nothing new
    mem.addData(Msg("https://ex.com/a", "A again", ts("2024-01-01 10:10:00")),
      Msg("https://ex.com/d", "D", ts("2024-01-01 10:11:00")))
    IngestStream.runLanding(mem.toDF(), "newsapi", "url", "ts",
      target, ckpt, "title").awaitTermination()

    val after = spark.read.parquet(target)
    assert(after.count() == 3)
    assert(after.filter($"key" === "newsapi_https://ex.com/a").count() == 1)
  }

  test("producerTransform shapes the envelope like the reference") {
    val df = Seq(("https://ex.com/x", "T", ts("2024-01-01 00:00:00"))).toDF("url", "title", "ts")
    val out = IngestStream.producerTransform(df, "gnews", "url", "title")
    val r = out.select("source_api", "key").head()
    assert(r.getString(0) == "gnews")
    assert(r.getString(1) == "gnews_https://ex.com/x")
    assert(out.columns.contains("fetched_at"))
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.operators.Multimodal

  test("asMedia + featurize: schema, determinism, and features flow") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.featurize(media, dim = 8)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "n_bytes", "content_hash", "width", "height", "feature"))
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[Seq[Float]]("feature").length == 8))
    // deterministic: same input, same hash/features
    val again = Multimodal.featurize(media, dim = 8).collect()
    assert(rows.map(_.getLong(3)).toSeq == again.map(_.getLong(3)).toSeq)
  }
}

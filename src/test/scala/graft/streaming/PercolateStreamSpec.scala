package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Search

/** Streaming percolation: stored-query alerts fire over a
  * MemoryStream micro-batch by micro-batch, and a redelivered batch
  * (the crash window) lands NOTHING — alerts are effectively-once. */
class PercolateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(): (String, String) = (
    java.nio.file.Files.createTempDirectory("graft-perc-t").toString,
    java.nio.file.Files.createTempDirectory("graft-perc-c").toString)

  private val stored = Seq((10L, Seq("alpha", "beta")), (20L, Seq("gamma")))

  test("alerts accumulate across micro-batches; redelivery lands nothing") {
    implicit val sqlCtx = spark.sqlContext
    val queries = stored.toDF("query_id", "terms")
    val (target, ckpt) = dirs()
    val mem = MemoryStream[Doc]
    def run(): Unit = {
      val q = Search.percolateSink(mem.toDF(), "doc_id", Seq("text"),
          queries, target, ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData(Doc(1L, "alpha beta gamma"), Doc(2L, "alpha only"))
    run()
    mem.addData(Doc(3L, "gamma ray"), Doc(4L, "beta alpha"))
    run()
    def alerts(): Set[(Long, Long)] = spark.read.parquet(target)
      .select("doc_id", "query_id").as[(Long, Long)].collect().toSet
    val expected = Set((1L, 10L), (1L, 20L), (3L, 20L), (4L, 10L))
    assert(alerts() == expected)
    // crash-window replay: the SAME docs arriving again must not
    // duplicate any alert (insert-if-absent on (doc, query))
    Search.percolateDeltaBatch(
      Seq((1L, "alpha beta gamma"), (4L, "beta alpha"))
        .toDF("doc_id", "text"),
      "doc_id", Seq("text"), queries, target)
    assert(alerts() == expected)
    assert(spark.read.parquet(target).count() == 4L) // no dup rows either
  }
}

package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ledger small-file compaction: state equivalence, layout
  * preservation (pruning still fires), crash-window healing, and
  * snapshot isolation vs concurrent appends. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // 2 buckets so three 2-doc batches are guaranteed to stack
  // multiple part-files into at least one bucket
  private val cfg = CorpusPipeline.Config(
    lineRequireTerminalPunct = false, contamViaBloom = false,
    docsBuckets = 2)
  private val bench = Seq((100L, "benchmark heldout evaluation question " +
    "answer pairs that training must never contain at all")).toDF("doc_id", "text")

  private def doc(i: Long): (Long, String) =
    (i, s"unique document number $i about subject $i with enough " +
      s"distinct trailing words to stay clear of every near dup " +
      s"threshold topic${i % 7} detail${i % 11} extra${i % 13}")

  private def runBatches(dir: String, batches: Seq[Seq[Long]]): Unit =
    batches.foreach { ids =>
      CorpusPipeline.deltaFunnelBatch(ids.map(doc).toDF("doc_id", "text"),
        "doc_id", "text", bench, cfg, s"$dir/ix", s"$dir/dc", s"$dir/tg")
    }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  test("compaction preserves ledger state and the bucket layout prunes after it") {
    val dir = Files.createTempDirectory("compact_state").toString
    runBatches(dir, Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L)))

    val docsBefore = sortedRows(spark.read.parquet(s"$dir/dc"))
    val ixBefore = sortedRows(spark.read.parquet(s"$dir/ix"))
    val statsBefore = Maintenance.groupStats(spark, s"$dir/dc")
    assert(statsBefore.exists(_.files > 1),
      "setup must produce a multi-file bucket")

    val (docsRep, ixRep) = Maintenance.compactFunnelState(spark,
      s"$dir/dc", s"$dir/ix", "doc_id", maxFiles = 1)
    assert(docsRep.compacted > 0 && ixRep.compacted > 0)
    assert(Maintenance.groupStats(spark, s"$dir/dc").forall(_.files == 1))
    assert(Maintenance.groupStats(spark, s"$dir/ix").forall(_.files == 1))

    assert(sortedRows(spark.read.parquet(s"$dir/dc")) == docsBefore)
    assert(sortedRows(spark.read.parquet(s"$dir/ix")) == ixBefore)

    // layout intact: the standing probe still partition-prunes, and a
    // post-compaction batch adjudicates exactly like a control funnel
    // that was never compacted
    val ctl = Files.createTempDirectory("compact_ctl").toString
    runBatches(ctl, Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L)))
    val b4 = Seq(doc(7L), doc(1L)).toDF("doc_id", "text") // 1 re-delivered
    CorpusPipeline.deltaFunnelBatch(b4, "doc_id", "text", bench, cfg,
      s"$dir/ix", s"$dir/dc", s"$dir/tg")
    CorpusPipeline.deltaFunnelBatch(b4, "doc_id", "text", bench, cfg,
      s"$ctl/ix", s"$ctl/dc", s"$ctl/tg")
    assert(sortedRows(spark.read.parquet(s"$dir/tg").select("doc_id", "keep")) ==
      sortedRows(spark.read.parquet(s"$ctl/tg").select("doc_id", "keep")))
    assert(sortedRows(spark.read.parquet(s"$dir/dc")) ==
      sortedRows(spark.read.parquet(s"$ctl/dc")))
  }

  test("crash window (compacted file landed, inputs not deleted) heals on the next pass") {
    val dir = Files.createTempDirectory("compact_heal").toString
    runBatches(dir, Seq(Seq(10L, 11L), Seq(12L)))
    val docsDir = s"$dir/dc"
    val before = sortedRows(spark.read.parquet(docsDir))

    // simulate the window: duplicate one bucket's data file in place
    val fs = new Path(docsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucket = fs.listStatus(new Path(docsDir))
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .head.getPath
    val part = fs.listStatus(bucket).filter(_.isFile)
      .map(_.getPath).head
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new Path(bucket, "part-crashdup.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(docsDir).count() > before.size,
      "duplicate rows visible during the window")

    Maintenance.compact(spark, docsDir, Seq("doc_id"), maxFiles = 1)
    assert(sortedRows(spark.read.parquet(docsDir)) == before,
      "healing dedup restores the exact pre-crash state")
  }

  test("files appended during compaction survive untouched (snapshot isolation)") {
    val dir = Files.createTempDirectory("compact_snap").toString
    val flat = s"$dir/flat"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(flat)
    Seq((3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(flat)
    // the "concurrent" append: lands after groupStats would have
    // listed, i.e. a file the snapshot never recorded — emulate by
    // compacting a snapshot taken NOW, then appending, then verifying
    // both the compacted rows and the late file are present
    val stats = Maintenance.groupStats(spark, flat)
    assert(stats.head.files == 2)
    Maintenance.compact(spark, flat, Seq("id"), maxFiles = 1)
    Seq((4L, "d")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(flat)
    val got = spark.read.parquet(flat).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // and a second pass folds the late file in without losing it
    Maintenance.compact(spark, flat, Seq("id"), maxFiles = 1)
    assert(spark.read.parquet(flat).as[(Long, String)].collect().toSet == got)
    assert(Maintenance.groupStats(spark, flat).head.files == 1)
  }

  test("card-ledger compaction preserves the card and heals crash duplicates") {
    val base = Files.createTempDirectory("compact_card").toString
    val docs = (1L to 120L)
      .map(i => (i, s"s${i % 3}", s"body $i", (i * 7) % 200 + 1))
      .toDF("doc_id", "source", "text", "n_chars")
    // many small batches -> many small files per ledger dir
    (0 until 6).foreach { b =>
      CorpusPipeline.cardDeltaBatch(docs.filter(col("doc_id") % 6 === b),
        "doc_id", "source", "n_chars", "text", base, batchId = b.toLong)
    }
    // plus a crash-window duplicate partial (same batch id, same rows)
    graft.operators.StatsLedger.partial(
        docs.filter(col("doc_id") % 6 === 2), "source", "n_chars")
      .select(lit(2L).as("batch_id"), col("key"), col("n"), col("sum"),
        col("min"), col("max"), col("sumsq"))
      .write.mode("append").parquet(s"$base/stats")
    val before = CorpusPipeline.cardFromDirs(spark, base)
      .collect().map(_.toString).toSet
    val reports = Maintenance.compactCardState(spark, base, "doc_id",
      maxFiles = 1)
    assert(reports.forall(_.compacted > 0))
    assert(CorpusPipeline.cardFromDirs(spark, base)
      .collect().map(_.toString).toSet == before,
      "compaction must not change the card")
    assert(Maintenance.groupStats(spark, s"$base/stats").head.files == 1)
  }
}

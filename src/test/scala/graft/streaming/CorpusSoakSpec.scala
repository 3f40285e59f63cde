package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupApprox, Multimodal, Similarity}
import graft.plans.CorpusPipeline

/** Long-haul fault soak of the four corpus/media/ANN sinks the ledger
  * soak does not cover (round-13 VERDICT directive 3):
  * minhashVerdictSink, contamDeltaSink, mediaDeltaSink, ivfIngestSink.
  * Each takes >=150 micro-batches with seeded-random fault injection —
  * same-batch replays (task retry), full redeliveries (source replay
  * after checkpoint loss), TRUE torn writes at every documented crash
  * window (later ledger appends rolled back to their pre-batch file
  * sets, then same-content redelivery — the partials-first/ids-last
  * discipline's real failure mode), and for the single-append sinks a
  * PARTIAL landing (some of the batch's freshly written files deleted
  * before the redelivery, so the per-key anti-join must heal row
  * subsets, not just whole batches) — then asserts the faulted fold
  * equals a fault-free run of the identical batch sequence (for the
  * incremental sinks, whose verdicts depend on delivery order) or the
  * one-shot computation (for the order-free IVF membership).
  *
  * Gated like [[graft.operators.LedgerSoakSpec]]:
  * `GRAFT_SOAK=1 sbt "testOnly graft.streaming.CorpusSoakSpec"`. */
class CorpusSoakSpec extends SparkSpec {

  import spark.implicits._

  private val Batches = 150

  private def soakEnabled(): Unit =
    assume(sys.env.contains("GRAFT_SOAK"),
      "soak suite is opt-in: set GRAFT_SOAK=1")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- torn-write machinery --------------------------------------------

  /** Recursive relative-path file listing (partitioned layouts nest
    * under key=value dirs; empty set if the dir does not exist). */
  private def snapshot(dir: String): Set[String] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File, prefix: String): Seq[String] =
      if (f.isDirectory)
        f.listFiles.toSeq.flatMap(c => walk(c, s"$prefix${c.getName}/"))
      else Seq(prefix.dropRight(1))
    if (!root.exists) Set.empty else walk(root, "").toSet
  }

  /** Roll a dir back to a snapshot: delete every file that appeared
    * since (the crash that lost this ledger's commit). */
  private def rollback(dir: String, before: Set[String]): Unit =
    snapshot(dir).diff(before).foreach { rel =>
      new java.io.File(s"$dir/$rel").delete(); ()
    }

  /** Delete roughly half of the files a batch just wrote (a PARTIAL
    * landing: the task crashed mid-append; deterministic choice). */
  private def tearHalf(dir: String, before: Set[String]): Int = {
    val fresh = snapshot(dir).diff(before).toSeq.sorted
    val victims = fresh.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f }
    victims.foreach(f => new java.io.File(s"$dir/$f").delete())
    victims.size
  }

  // ---- 1. minhash verdict sink -----------------------------------------

  test("minhash verdict sink converges through 150 fault-injected batches") {
    soakEnabled()
    val target = tmp("soak-mh") + "/t"
    val rnd = new scala.util.Random(graft.SoakSeed(0x14c0ffeeL))
    // deterministic verdict rows: overlap re-ships the boundary pairs
    def rows(k: Int): DataFrame = {
      val lo = k * 5
      (lo until lo + 7).map { n =>
        (n.toLong, (n % 50).toLong, ((n * 7) % 100) / 100.0)
      }.toDF("new_id", "idx_id", "jaccard")
    }
    var replays = 0; var partials = 0
    for (k <- 0 until Batches) {
      val before = snapshot(target)
      DedupApprox.minhashVerdictBatch(rows(k), target)
      if (rnd.nextDouble() < 0.15) { // task retry: same content again
        DedupApprox.minhashVerdictBatch(rows(k), target); replays += 1
      }
      if (rnd.nextDouble() < 0.15) { // partial landing + redelivery
        partials += tearHalf(target, before)
        DedupApprox.minhashVerdictBatch(rows(k), target)
      }
    }
    info(s"injected: $replays replays, $partials files torn from landings")
    val expected = (0 until Batches).map(rows).reduce(_ unionByName _)
      .dropDuplicates("new_id", "idx_id")
      .as[(Long, Long, Double)].collect().toSet
    val landed = spark.read.parquet(target)
      .as[(Long, Long, Double)].collect()
    assert(landed.length == landed.toSet.size, "duplicate pair keys landed")
    assert(landed.toSet == expected)
  }

  // ---- 2. decontamination sink -----------------------------------------

  test("contam delta sink converges through 150 fault-injected batches") {
    soakEnabled()
    val vocab = (0 until 120).map(i => s"w$i")
    def text(i: Long): String =
      // rolling 10-token window over the vocab: neighbours share grams
      (0 until 10).map(j => vocab(((i * 3 + j) % 120).toInt)).mkString(" ")
    def docs(k: Int): DataFrame = {
      val lo = k * 4
      (lo until lo + 6).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    }
    val bench = Seq((9000L, text(7) + " " + text(23))).toDF("doc_id", "text")

    def run(base: String, inject: Boolean): (String, String, String) = {
      val (bIdx, sIdx, sDocs, target) =
        (s"$base/bench", s"$base/seen", s"$base/seenDocs", s"$base/target")
      bench.select(explode(
          graft.operators.TextAnalysis.docGramHashes(col("text"), 4)).as("h"))
        .write.mode("overwrite").parquet(bIdx)
      val rnd = new scala.util.Random(graft.SoakSeed(0x5047c14L))
      var replays = 0; var tornBoth = 0; var tornIds = 0
      def step(k: Int): Unit =
        CorpusPipeline.contamDeltaBatch(docs(k), "doc_id", "text",
          bIdx, sIdx, sDocs, target, n = 4)
      for (k <- 0 until Batches) {
        if (inject && rnd.nextDouble() < 0.10) {
          // crash after the verdict landing, before BOTH index commits
          val (b1, b2) = (snapshot(sIdx), snapshot(sDocs))
          step(k); rollback(sIdx, b1); rollback(sDocs, b2); tornBoth += 1
        } else if (inject && rnd.nextDouble() < 0.10) {
          // crash after the gram-index append, before the ids commit
          val b2 = snapshot(sDocs)
          step(k); rollback(sDocs, b2); tornIds += 1
        }
        step(k)
        if (inject && rnd.nextDouble() < 0.15) { step(k); replays += 1 }
      }
      if (inject)
        info(s"injected: $replays replays, $tornBoth torn(index+ids), " +
          s"$tornIds torn(ids-only)")
      (target, sIdx, sDocs)
    }

    val (ft, fi, fd) = run(tmp("soak-contam-fault"), inject = true)
    val (ct, ci, cd) = run(tmp("soak-contam-clean"), inject = false)
    def verdicts(dir: String) = spark.read.parquet(dir)
      .as[(Long, Long, Long, Long)].collect()
    val (fv, cv) = (verdicts(ft), verdicts(ct))
    assert(fv.length == fv.toSet.size, "duplicate verdict rows landed")
    assert(fv.toSet == cv.toSet, "faulted verdicts differ from clean run")
    val (fg, cg) = (spark.read.parquet(fi).distinct().as[Long].collect().toSet,
      spark.read.parquet(ci).distinct().as[Long].collect().toSet)
    assert(fg == cg, "seen-gram index (distinct) differs from clean run")
    val (fids, cids) = (spark.read.parquet(fd).as[Long].collect().toSeq.sorted,
      spark.read.parquet(cd).as[Long].collect().toSeq.sorted)
    assert(fids == cids, "seen-docs ledger differs from clean run")
  }

  // ---- 3. media delta sink ---------------------------------------------

  test("media delta sink converges through 150 fault-injected batches") {
    soakEnabled()
    // batch k: one fresh raster, one JPEG re-encode of an EARLIER
    // batch's raster (dup_standing), one JPEG twin of this batch's
    // fresh raster (dup_delta) — every verdict class exercised every
    // batch, deterministic across the clean and faulted runs
    def batch(k: Int): DataFrame = {
      val fresh = k.toLong
      Seq(
        Media(k * 10L, Multimodal.encodePng(Multimodal.synthRaster(fresh))),
        Media(k * 10L + 1,
          Multimodal.encodeJpeg(Multimodal.synthRaster(fresh))),
        Media(k * 10L + 2, Multimodal.encodeJpeg(
          Multimodal.synthRaster(if (k == 0) 1000L else (k - 1).toLong)))
      ).toDF()
    }
    def run(base: String, inject: Boolean): String = {
      val rnd = new scala.util.Random(graft.SoakSeed(0x4d3d1aL))
      var replays = 0; var tornAll = 0; var tornIds = 0
      def step(k: Int): Unit =
        CorpusPipeline.mediaDeltaBatch(batch(k), "media_id", "payload", base)
      for (k <- 0 until Batches) {
        if (inject && rnd.nextDouble() < 0.10) {
          // crash after verdicts, before signatures + ids
          val (b1, b2) = (snapshot(s"$base/signatures"),
            snapshot(s"$base/seenIds"))
          step(k)
          rollback(s"$base/signatures", b1); rollback(s"$base/seenIds", b2)
          tornAll += 1
        } else if (inject && rnd.nextDouble() < 0.10) {
          // the DOCUMENTED window: signatures landed, ids lost —
          // redelivery re-appends keeper signatures (benign dups)
          val b2 = snapshot(s"$base/seenIds")
          step(k); rollback(s"$base/seenIds", b2); tornIds += 1
        }
        step(k)
        if (inject && rnd.nextDouble() < 0.15) { step(k); replays += 1 }
      }
      if (inject)
        info(s"injected: $replays replays, $tornAll torn(sigs+ids), " +
          s"$tornIds torn(ids-only)")
      base
    }
    val fb = run(tmp("soak-media-fault"), inject = true)
    val cb = run(tmp("soak-media-clean"), inject = false)
    def verdicts(b: String) = spark.read.parquet(s"$b/verdicts")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    val (fv, cv) = (verdicts(fb), verdicts(cb))
    assert(fv.length == fv.toSet.size, "duplicate verdict rows landed")
    assert(fv.toSet == cv.toSet, "faulted verdicts differ from clean run")
    def sigIds(b: String) = spark.read.parquet(s"$b/signatures")
      .select(col("media_id")).distinct().as[Long].collect().toSet
    assert(sigIds(fb) == sigIds(cb),
      "distinct signature membership differs from clean run")
    def seen(b: String) = spark.read.parquet(s"$b/seenIds")
      .as[Long].collect().toSeq.sorted
    assert(seen(fb) == seen(cb), "seen-ids ledger differs from clean run")
  }

  // ---- 4. IVF ingest sink ----------------------------------------------

  test("ivf ingest sink converges through 150 fault-injected batches") {
    soakEnabled()
    val dim = 8
    val centroids = (0L until 4L).map { c =>
      (c, (0 until dim).map(j => if (j % 4 == c) 1.0 else 0.1 * j))
    }.toDF("cid", "cvec").localCheckpoint()
    def vec(i: Long): Seq[Float] =
      (0 until dim).map(j => (((i * 31 + j * 17) % 23) / 10.0f) *
        (if ((i + j) % 2 == 0) 1f else -1f))
    def batch(k: Int): DataFrame = {
      val lo = k * 5
      (lo until lo + 7).map(i => (i.toLong, vec(i.toLong)))
        .toDF("vec_id", "embedding")
    }
    val dir = tmp("soak-ivf") + "/layout"
    val rnd = new scala.util.Random(graft.SoakSeed(0x1fe57L))
    var replays = 0; var partials = 0
    for (k <- 0 until Batches) {
      val before = snapshot(dir)
      Similarity.appendIvfBatch(batch(k), "vec_id", "embedding",
        centroids, dir)
      if (rnd.nextDouble() < 0.15) { // redelivery lands nothing
        Similarity.appendIvfBatch(batch(k), "vec_id", "embedding",
          centroids, dir)
        replays += 1
      }
      if (rnd.nextDouble() < 0.15) { // partial landing + redelivery heals
        partials += tearHalf(dir, before)
        Similarity.appendIvfBatch(batch(k), "vec_id", "embedding",
          centroids, dir)
      }
    }
    info(s"injected: $replays replays, $partials files torn from landings")
    val n = (Batches - 1) * 5 + 7
    val oneShot = Similarity.withCells(
        (0 until n).map(i => (i.toLong, vec(i.toLong)))
          .toDF("vec_id", "embedding"), "embedding", centroids)
      .select(col("vec_id"), col("cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    val landed = spark.read.parquet(dir)
      .select(col("vec_id"), col("cell").cast("long"))
      .as[(Long, Long)].collect()
    assert(landed.length == landed.map(_._1).distinct.length,
      "duplicate vector ids in the layout")
    assert(landed.toMap == oneShot,
      "layout membership differs from the one-shot assignment")
  }
}

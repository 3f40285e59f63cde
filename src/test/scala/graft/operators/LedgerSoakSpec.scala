package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.Tag

import graft.SparkSpec

/** Soak marker tag. The gate is the GRAFT_SOAK env var (an `assume`
  * in each test cancels them in the default `sbt test` run — minutes
  * of fault-injected batches don't belong in the per-commit gate):
  * run explicitly with
  * `GRAFT_SOAK=1 sbt "testOnly graft.operators.LedgerSoakSpec"`. */
object SoakTag extends Tag("graft.Soak")

/** Long-haul soak of the three streaming ledger sinks (round-12
  * VERDICT directive 6): the confusion/calibration/moments ledgers
  * are spec'd on a handful of batches; here each one takes 150
  * micro-batches with seeded-random fault injection EVERY batch —
  * same-batch-id replays (Spark task retry), fresh-batch-id full
  * redeliveries (source replay after checkpoint loss), duplicate
  * partials for committed batches (filesystem-level append retry),
  * TRUE torn writes (partials land, ids commit lost, same-bid
  * redelivery — see [[soak]]), and overlapping batch contents
  * (at-least-once sources re-shipping the boundary rows) —
  * then asserts the folded ledger equals the one-shot computation over
  * the distinct rows, bit-for-bit. The invariant under test is the
  * ledger algebra's convergence under ANY interleaving of the fault
  * classes, not just the single-fault cases the unit specs pin. */
class LedgerSoakSpec extends SparkSpec {

  import spark.implicits._

  private val Batches = 150
  private val PerBatch = 10
  private val Overlap = 3 // rows re-shipped into the next batch

  private def soakEnabled(): Unit =
    assume(sys.env.contains("GRAFT_SOAK"),
      "soak suite is opt-in: set GRAFT_SOAK=1")

  /** Non-hidden files currently in the ids ledger dir (empty set if
    * the dir does not exist yet — batch 0's torn window). */
  private def idFiles(idsDir: String): Set[String] = {
    val d = new java.io.File(idsDir)
    if (!d.exists) Set.empty
    else d.listFiles.map(_.getName).toSet
  }

  /** Drives `deltaBatch` over sliced ids with fault injection; returns
    * the injection counts (replays, redeliveries, dup-partials, torn)
    * for the log. Four fault classes per batch, seeded-random:
    *  - same-batch-id replay (Spark task retry);
    *  - fresh-batch-id full redelivery (source replay after
    *    checkpoint loss);
    *  - duplicate partials for an already-COMMITTED batch (an append
    *    retried at the filesystem layer after both ledger writes
    *    landed);
    *  - a TRUE torn write — the partials-first/ids-never-commit crash
    *    window: run the batch through the real write path, then roll
    *    the ids ledger back to its pre-batch file set (partials
    *    landed, ids commit lost in the crash), then redeliver the
    *    SAME batch id as a restarted stream would — the re-run sees
    *    the rows as fresh and re-appends a bit-identical partial that
    *    the read-side batch_id dedup must heal. */
  private def soak(base: String, partialsDir: String, nRows: Long,
                   deltaBatch: (Seq[Long], Long) => Unit): (Int, Int, Int, Int) = {
    val rnd = new scala.util.Random(graft.SoakSeed(0x5047c3L))
    var replays = 0; var redeliveries = 0; var dupPartials = 0; var torn = 0
    val idsDir = s"$base/seenIds"
    var bid = 0L
    for (k <- 0 until Batches) {
      val lo = k.toLong * PerBatch
      val ids = (lo until math.min(nRows, lo + PerBatch + Overlap))
      if (rnd.nextDouble() < 0.12) { // true torn write + same-bid restart
        val before = idFiles(idsDir)
        deltaBatch(ids, bid)
        // crash between the two appends: ids commit never happened
        new java.io.File(idsDir).listFiles
          .filter(f => !before.contains(f.getName)).foreach(_.delete())
        torn += 1
      }
      deltaBatch(ids, bid)
      if (rnd.nextDouble() < 0.15) { // task retry: same batch id
        deltaBatch(ids, bid); replays += 1
      }
      if (rnd.nextDouble() < 0.15) { // source replay: new batch id
        bid += 1; deltaBatch(ids, bid); redeliveries += 1
      }
      if (rnd.nextDouble() < 0.15) { // dup partials for a committed batch
        val part = spark.read.parquet(s"$base/$partialsDir")
          .filter(col("batch_id") === bid)
        part.write.mode("append").parquet(s"$base/$partialsDir")
        dupPartials += 1
      }
      bid += 1
    }
    (replays, redeliveries, dupPartials, torn)
  }

  test("confusion ledger converges through 150 fault-injected batches",
       SoakTag) {
    soakEnabled()
    val n = (Batches * PerBatch).toLong
    val df = (0L until n).map(i =>
        (i, Seq("a", "b", "c")(((i * 7) % 3).toInt),
            Seq("a", "b", "c")(((i * 5) % 3).toInt)))
      .toDF("id", "truth", "pred").localCheckpoint()
    val oneShot = Eval.confusionMatrix(df, "truth", "pred")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val base = java.nio.file.Files.createTempDirectory("graft-soak-conf").toString
    val (rp, rd, dp, tn) = soak(base, "cells", n, (ids, bid) =>
      Eval.confusionDeltaBatch(df.filter(col("id").isin(ids: _*)),
        "id", "truth", "pred", base, bid))
    info(s"injected: $rp replays, $rd redeliveries, $dp dup-partials, $tn torn writes")
    val folded = Eval.confusionFromDirs(spark, base)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(folded == oneShot)
  }

  test("calibration ledger converges through 150 fault-injected batches",
       SoakTag) {
    soakEnabled()
    val n = (Batches * PerBatch).toLong
    val df = (0L until n).map(i =>
        (i, ((i * 37) % 101) / 100.0, (i * 2654435761L) % 3 != 0))
      .toDF("id", "conf", "ok").localCheckpoint()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    val oneShot = Eval.calibration(df, col("conf"), col("ok"))
      .collect().map(key).toSet
    val base = java.nio.file.Files.createTempDirectory("graft-soak-cal").toString
    val (rp, rd, dp, tn) = soak(base, "cells", n, (ids, bid) =>
      Eval.calibrationDeltaBatch(df.filter(col("id").isin(ids: _*)),
        "id", col("conf"), col("ok"), base, bid))
    info(s"injected: $rp replays, $rd redeliveries, $dp dup-partials, $tn torn writes")
    val folded = Eval.calibrationFromDirs(spark, base).collect().map(key).toSet
    assert(folded == oneShot)
  }

  test("moments ledger converges through 150 fault-injected batches",
       SoakTag) {
    soakEnabled()
    val dim = 4
    val n = (Batches * PerBatch).toLong
    val df = (0L until n).map { i =>
        (i, Array.tabulate(dim)(d => ((i * 31 + d * 17) % 23).toFloat / 10f))
      }.toDF("id", "vec").localCheckpoint()
    val (n1, s1, p1) = Pca.moments(df, "vec", dim)
    val base = java.nio.file.Files.createTempDirectory("graft-soak-mom").toString
    val (rp, rd, dp, tn) = soak(base, "moments", n, (ids, bid) =>
      Pca.momentsDeltaBatch(df.filter(col("id").isin(ids: _*)),
        "id", "vec", dim, base, bid))
    info(s"injected: $rp replays, $rd redeliveries, $dp dup-partials, $tn torn writes")
    val (n2, s2, p2) = Pca.momentsFromDirs(spark, base, dim)
    assert(n2 == n1)
    assert(s2.toSeq == s1.toSeq)
    assert(p2.map(_.toSeq).toSeq == p1.map(_.toSeq).toSeq)
  }
}

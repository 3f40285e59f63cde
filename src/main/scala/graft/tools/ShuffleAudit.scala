package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measures actual shuffle bytes per query (dev tool) — the ground
  * truth behind SCALING.md's "minimize shuffles" claims. Shuffle WRITE
  * bytes are what cross the network at cluster scale; local[] runs
  * produce the same plan and therefore the same bytes. */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val written = new AtomicLong(); val read = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q04_anti_join", "q20_join_star",
        "q42_local_supplier_volume", "x09_minhash_dedup", "x10_simhash_dedup",
        "x11_jaccard_pairs", "x18_dedup_verdicts", "q44_asof_join",
        "q47_repetition", "q48_pack_bins")
    println(f"${"query"}%-28s ${"shuffleWrite"}%14s ${"shuffleRead"}%14s")
    names.foreach { n =>
      written.set(0); read.set(0)
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // listener events drain asynchronously
      println(f"$n%-28s ${written.get}%,14d ${read.get}%,14d")
    }
    spark.stop()
  }
}

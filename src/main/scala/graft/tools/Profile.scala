package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators._

/** Ad-hoc stage profiler for the dedup operators (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())

    val sigs = DedupApprox.withMinhash(docs, "doc_id", "text")
    t("minhash sigs")(sigs.count())

    // band bucket skew
    val rows = 4
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))))
    t("minhash band max bucket")(
      banded.groupBy("pos", "col").count().agg(max("count")).head().getLong(0))
    t("minhash pairs")(DedupApprox.minhashPairs(docs, "doc_id", "text").count())

    val sim = DedupApprox.withSimhash(docs, "doc_id", "text")
    t("simhash sigs")(sim.count())
    val bits = 8; val mask = (1L << bits) - 1
    val simBanded = sim.select(col("doc_id"),
      posexplode(array((0 until 8).map(c =>
        shiftright(col("simhash"), c * bits).bitwiseAND(lit(mask))): _*)))
    t("simhash max bucket")(
      simBanded.groupBy("pos", "col").count().agg(max("count")).head().getLong(0))
    t("simhash pairs")(DedupApprox.simhashPairs(docs, "doc_id", "text",
      maxHamming = 6, chunks = 8).count())

    val inv = docs.select(col("doc_id"),
      explode(DedupApprox.shingles(col("text"), 3)).as("ng"))
    t("jaccard n3 postings sum df^2")(
      inv.groupBy("ng").count().agg(sum(col("count") * col("count"))).head().get(0))
    val inv5 = docs.select(col("doc_id"),
      explode(DedupApprox.shingles(col("text"), 5)).as("ng"))
    t("jaccard n5 postings sum df^2")(
      inv5.groupBy("ng").count().agg(sum(col("count") * col("count"))).head().get(0))
    t("jaccard pairs n3 cap50")(
      DedupApprox.jaccardPairs(docs, "doc_id", "text", 3, 0.5, 50).count())
    t("jaccard pairs n5 cap20")(
      DedupApprox.jaccardPairs(docs, "doc_id", "text", 5, 0.5, 20).count())
    spark.stop()
  }
}

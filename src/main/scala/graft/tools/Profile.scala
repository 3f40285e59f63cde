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
    // force real evaluation of the UDF columns (count() would prune them)
    t("minhash sigs")(sigs.write.format("noop").mode("overwrite").save())
    t("shingles only")(docs.select(
      DedupApprox.shingles(col("text"), 3).as("sh"))
      .write.format("noop").mode("overwrite").save())

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
    // stage breakdown of simhashPairs
    locally {
      val bits = 8; val mask = (1L << bits) - 1
      val keys = (for { i <- 0 until 8; j <- (i + 1) until 8 } yield struct(
        lit(i * 8 + j).as("ck"),
        (shiftright(col("simhash"), i * bits).bitwiseAND(lit(mask)) * (mask + 1) +
          shiftright(col("simhash"), j * bits).bitwiseAND(lit(mask))).as("cv")))
      val banded = sim.select(col("doc_id"), col("simhash"),
          explode(array(keys: _*)).as("k"))
        .select(col("doc_id"), col("simhash"), col("k.ck").as("ck"), col("k.cv").as("cv"))
        .localCheckpoint()
      t("  simhash banded rows")(banded.count())
      val buckets = banded.groupBy("ck", "cv")
        .agg(collect_list(struct(col("doc_id").as("id"), col("simhash").as("sig"))).as("ms"))
        .filter(size(col("ms")).between(2, 2000)).localCheckpoint()
      t("  simhash buckets>=2")(buckets.count())
      t("  simhash bucket max size")(
        buckets.agg(max(size(col("ms")))).head().getInt(0))
      t("  simhash raw pairs")(buckets
        .select(explode(DedupApprox.pairExpand(col("ms"))).as("p")).count())
      t("  simhash deduped pairs")(buckets
        .select(explode(DedupApprox.pairExpand(col("ms"))).as("p"))
        .select(least(col("p.a.id"), col("p.b.id")).as("id_a"),
          greatest(col("p.a.id"), col("p.b.id")).as("id_b"))
        .dropDuplicates("id_a", "id_b").count())
    }
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

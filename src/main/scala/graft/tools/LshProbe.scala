package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Measure the LSH ANN plane-count / multi-probe / multi-table trade:
  * candidates scanned (scan fraction) and recall@20 vs the exact
  * brute-force top-20, for each parameterization. Numbers land in
  * SCALING.md's bucket-count table. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.filter(col("vec_id") =!= 0).count()
    val exact = NonSql(spark, sfDir, "x12")
    println(s"[lshprobe] corpus=$n")

    def recallOf(ids: Set[Long]): Double =
      ids.intersect(exact).size.toDouble / exact.size

    // single-table configs: (planes, maxHamming)
    for ((p, h) <- Seq((4, 1), (8, 1), (8, 2), (12, 1), (16, 1), (16, 2))) {
      val planes = Similarity.hyperplanes(64, p)
      val q = Similarity.withBucket(emb.filter(col("vec_id") === 0), "embedding", planes)
        .select(col("embedding").cast("array<double>").as("qv"), col("bucket").as("qb"))
      val scanned = Similarity.withBucket(emb.filter(col("vec_id") =!= 0), "embedding", planes)
        .crossJoin(broadcast(q))
        .filter(bit_count(col("bucket").bitwiseXOR(col("qb"))) <= h)
      val cands = scanned.count()
      val top = scanned
        .select(col("vec_id"), Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
        .collect().map(_.getLong(0)).toSet
      println(f"[lshprobe] planes=$p%2d H<=$h cand=$cands%5d scan=${cands.toDouble / n}%6.3f recall@20=${recallOf(top)}%5.2f")
    }

    // multi-table: T tables x 8 planes, H<=1 each
    for (t <- Seq(2, 4, 8)) {
      val tables = Similarity.hyperplaneTables(64, 8, t)
      val q = Similarity.withBuckets(emb.filter(col("vec_id") === 0), "embedding", tables)
        .select(col("embedding").cast("array<double>").as("qv") +:
          tables.indices.map(i => col(s"bucket_$i").as(s"qb_$i")): _*)
      val scanned = Similarity.withBuckets(emb.filter(col("vec_id") =!= 0), "embedding", tables)
        .crossJoin(broadcast(q))
        .filter(tables.indices.map(i =>
          bit_count(col(s"bucket_$i").bitwiseXOR(col(s"qb_$i"))) <= 1).reduce(_ || _))
      val cands = scanned.count()
      val top = scanned
        .select(col("vec_id"), Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
        .collect().map(_.getLong(0)).toSet
      println(f"[lshprobe] tables=$t%2d x8p H<=1 cand=$cands%5d scan=${cands.toDouble / n}%6.3f recall@20=${recallOf(top)}%5.2f")
    }
    spark.stop()
  }

  /** exact brute-force top-20 ids. */
  private def NonSql(spark: org.apache.spark.sql.SparkSession, d: String, @annotation.unused tag: String): Set[Long] = {
    val emb = Tables.embeddings(spark, d)
    val query = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv")))
    emb.filter(col("vec_id") =!= 0).crossJoin(query)
      .select(col("vec_id"),
        Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSet
  }
}

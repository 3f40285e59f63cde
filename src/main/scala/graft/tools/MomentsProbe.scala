package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures Pca.moments task cost at realistic embedding dims (the
  * harness table is dim=64; real embedding models are 256-1024). The
  * corpus vector column is widened by tiling the stored dim=64 vector
  * `dim/64` times — same row count, same value distribution, the
  * dim-scaling knob isolated. Compares the MomentsAgg path against the
  * round-7 double-posexplode formulation at each dim. */
object MomentsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.sources.Tables.embeddings(spark, d)
    emb.count()

    def widened(times: Int) =
      emb.select(col("vec_id"),
        flatten(array_repeat(col("embedding"), times)).as("embedding"))

    def posexplodeMoments(dim: Int, times: Int): Unit = {
      // the round-7 formulation, verbatim shape
      val q = widened(times)
        .select(transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000 + lit(0.5)).cast("long")).as("qv"))
        .filter(size(col("qv")) === dim)
      q.select(posexplode(col("qv")).as(Seq("i", "xi")))
        .groupBy(col("i")).agg(sum(col("xi")), count(lit(1))).collect()
      q.select(col("qv"), posexplode(col("qv")).as(Seq("i", "xi")))
        .select(col("i"), col("xi"), posexplode(col("qv")).as(Seq("j", "xj")))
        .groupBy(col("i"), col("j")).agg(sum(col("xi") * col("xj"))).collect()
    }

    def aggMoments(dim: Int, times: Int): Unit =
      graft.operators.Pca.moments(widened(times), "embedding", dim)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    Seq(1, 4, 8).foreach { times =>
      val dim = 64 * times
      time(s"dim=$dim MomentsAgg   ")(aggMoments(dim, times))
      time(s"dim=$dim posexplode r7")(posexplodeMoments(dim, times))
      time(s"dim=$dim MomentsAgg  2")(aggMoments(dim, times))
    }
    spark.stop()
  }
}

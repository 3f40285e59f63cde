package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.sources.Tables

/** Count-min sketch: overestimate-only frequency estimates, mergeable. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: estimate is exact when the table is sparse") {
    val counters = new Array[Long](4 * 1024)
    val keys = (0 until 50).map(i => s"tok-$i")
    // simulate the aggregate's update loop
    keys.foreach { k =>
      val s = UTF8String.fromString(k)
      (0 until 4).foreach { r =>
        counters(r * 1024 + CountMinKernels.rowIndex(1024, r, s)) += 3L
      }
    }
    val art = CountMinKernels.serialize(counters, 4, 1024)
    assert(keys.forall(k =>
      CountMinKernels.estimate(art, UTF8String.fromString(k)) >= 3L))
  }

  test("estimates never underestimate (CMS invariant) on real tokens") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(Analyzer.tokenize(coalesce($"text", lit("")))).as("token"))
    val art = toks.agg(CountMin.cmsAgg($"token", depth = 4, width = 1 << 12)
      .as("a")).head.getAs[Array[Byte]](0)
    val bad = toks.groupBy($"token").agg(count(lit(1)).as("freq"))
      .withColumn("est", CountMin.estimate(lit(art), $"token"))
      .filter($"est" < $"freq")
      .count()
    assert(bad == 0L)
  }

  test("at production width the estimate is exact for this vocab") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(Analyzer.tokenize(coalesce($"text", lit("")))).as("token"))
    val art = toks.agg(CountMin.cmsAgg($"token").as("a"))
      .head.getAs[Array[Byte]](0)
    val wrong = toks.groupBy($"token").agg(count(lit(1)).as("freq"))
      .withColumn("est", CountMin.estimate(lit(art), $"token"))
      .filter($"est" =!= $"freq")
      .count()
    assert(wrong == 0L) // what lets q71 share the exact oracle
  }

  test("merge across partitions is element-wise + (partitioning-proof)") {
    val keys = (0L until 3000L).map(i => s"k${i % 97}").toDF("k")
    def build(parts: Int): Array[Byte] =
      keys.repartition(parts)
        .agg(CountMin.cmsAgg($"k", depth = 4, width = 1 << 10).as("a"))
        .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(13)))
  }

  test("weighted build counts weights, not rows") {
    val df = Seq(("a", 5L), ("a", 2L), ("b", 1L)).toDF("k", "w")
    val art = df.agg(CountMin.cmsAggWeighted($"k", $"w", depth = 4,
      width = 1 << 10).as("a")).head.getAs[Array[Byte]](0)
    assert(CountMinKernels.estimate(art, UTF8String.fromString("a")) == 7L)
    assert(CountMinKernels.estimate(art, UTF8String.fromString("b")) == 1L)
  }

  test("unseen keys estimate 0 on a sparse sketch") {
    val df = Seq("x", "y").toDF("k")
    val art = df.agg(CountMin.cmsAgg($"k", depth = 4, width = 1 << 10).as("a"))
      .head.getAs[Array[Byte]](0)
    assert(CountMinKernels.estimate(art, UTF8String.fromString("zzz")) == 0L)
  }
}

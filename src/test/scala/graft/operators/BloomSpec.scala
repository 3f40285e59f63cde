package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.{Bloom, BloomKernels}
import graft.sources.Tables

/** Bloom sketch + scan-local decontamination probe. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: every inserted key is found (no false negatives)") {
    val words = new Array[Long](1024 / 64)
    val keys = (0 until 200).map(i => s"key-$i")
    keys.foreach(k => BloomKernels.setBits(words, 5, UTF8String.fromString(k)))
    val art = BloomKernels.serialize(words, 5)
    assert(keys.forall(k =>
      BloomKernels.mightContain(art, UTF8String.fromString(k))))
  }

  test("kernel: small dense filter has bounded false-positive rate") {
    val words = new Array[Long](4096 / 64)
    (0 until 200).foreach(i =>
      BloomKernels.setBits(words, 5, UTF8String.fromString(s"in-$i")))
    val art = BloomKernels.serialize(words, 5)
    val fps = (0 until 1000).count(i =>
      BloomKernels.mightContain(art, UTF8String.fromString(s"out-$i")))
    // 200 keys × 5 hashes in 4096 bits -> fill ≈ 0.22, FP ≈ 0.22^5 ≈ 0.05%
    assert(fps < 50, s"FP rate too high: $fps/1000")
  }

  test("aggregate merges across partitions (OR-combine path)") {
    val keys = (0 until 500).map(i => s"gram $i").toDF("gram")
    def build(parts: Int): Array[Byte] =
      keys.repartition(parts)
        .agg(Bloom.bloomAgg($"gram", numBits = 1 << 14).as("b"))
        .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(13)))
  }

  test("probe expression works in a filter (codegen path)") {
    val words = new Array[Long](1024 / 64)
    BloomKernels.setBits(words, 5, UTF8String.fromString("hit"))
    val art = BloomKernels.serialize(words, 5)
    val r = Seq("hit", "miss-a", "miss-b").toDF("k")
      .filter(Bloom.mightContain(lit(art), $"k"))
      .as[String].collect().toSeq
    assert(r == Seq("hit"))
  }

  test("decontaminateBloom is a superset of exact, and exact here") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = col("doc_id") % 97 === 0
    val exact = Dedup.decontaminate(docs, "doc_id", "text", bench, n = 3)
      .select($"doc_id", $"n_contaminated", $"contaminated")
      .as[(Long, Long, Boolean)].collect().toMap2
    val bloom = Dedup.decontaminateBloom(docs, "doc_id", "text", bench, n = 3)
      .select($"doc_id", $"n_flagged", $"contaminated")
      .as[(Long, Long, Boolean)].collect().toMap2
    assert(exact.keySet == bloom.keySet)
    // no false negatives ever; and at 2^20 bits the FP set is EMPTY
    // for this corpus (verified equality is what lets q68 share the
    // exact oracle)
    assert(exact == bloom)
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}

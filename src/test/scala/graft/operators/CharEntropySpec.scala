package graft.operators

import graft.SparkSpec

/** Integer-exact char entropy: hand-computed micro-nat values, the
  * uniform > mixed > constant ordering, degenerate docs, invariance. */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    TextAnalysis.charEntropy(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

  test("hand-computed micro-nat totals") {
    val out = run(Seq((1L, "aab"), (2L, "aaaa"), (3L, "abcd")))
    // aab: 3·lnq(3) − 2·lnq(2) = 3·1098612 − 2·693147 = 1909542.
    // aaaa: 4·lnq(4) − 4·lnq(4) = 0. abcd: 4·lnq(4) = 5545176.
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 3L, 2L, 1909542L),
      (2L, 4L, 1L, 0L),
      (3L, 4L, 4L, 5545176L)))
  }

  test("ordering: uniform > mixed > constant at equal length") {
    val out = run(Seq((1L, "abcd"), (2L, "aabb"), (3L, "aaaa")))
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L) && out(3L) == 0L)
  }

  test("empty and null docs report zeros") {
    val out = run(Seq((1L, ""), (2L, null.asInstanceOf[String])))
    assert(out.toSeq == Seq((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L)))
  }

  test("scan-local UDF kernel ≡ the aggregation form on real data") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val agg = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val udfForm = docs
      .select(col("doc_id"),
        TextAnalysis.charEntropyColumn(col("text")).as("e"))
      .select(col("doc_id"), col("e._1"), col("e._2"), col("e._3"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(udfForm == agg)
  }

  test("partitioning invariance on real data") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = TextAnalysis.charEntropy(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}

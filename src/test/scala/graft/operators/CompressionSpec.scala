package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Compression-ratio signal ([[TextAnalysis.compressionStats]]):
  * separation between repetitive / natural / incompressible text,
  * edge cases, and bit-determinism. */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    TextAnalysis.compressionStats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("repetitive text compresses far below natural text; random bytes barely") {
    val rnd = new scala.util.Random(11)
    val rows = Seq(
      1L -> ("spam " * 400),
      2L -> Seq.fill(400)(rnd.nextInt(10000).toString).mkString(" "),
      3L -> rnd.nextString(2000)) // wide unicode ~ incompressible
    val r = ratios(rows)
    assert(r(1L)._3 < 50000L, s"boilerplate ratio ${r(1L)._3} should be < 0.05")
    assert(r(2L)._3 > r(1L)._3 * 5, "varied text compresses much less")
    assert(r(3L)._3 > 500000L, s"random text ratio ${r(3L)._3} should be > 0.5")
  }

  test("empty and null text produce zero rows, not crashes") {
    val r = ratios(Seq(4L -> "", 5L -> null))
    assert(r(4L) == ((0L, 0L, 0L)))
    assert(r(5L) == ((0L, 0L, 0L)))
  }

  test("bit-deterministic under repartitioning (fixed level, reset per row)") {
    val rows = (1L to 200L).map(i => i -> s"document body $i ${"pad " * (i % 17).toInt}")
    val df1 = rows.toDF("doc_id", "text")
    val a = TextAnalysis.compressionStats(df1, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = TextAnalysis.compressionStats(df1.repartition(9), "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("raw_bytes counts UTF-8 bytes, not chars") {
    val r = ratios(Seq(6L -> "é" * 100)) // 2 bytes per char in UTF-8
    assert(r(6L)._1 == 200L)
  }
}

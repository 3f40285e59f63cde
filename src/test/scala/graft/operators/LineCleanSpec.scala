package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C4 line cleaning: terminal-punctuation rule, min-word rule,
  * blocklist rule, and faithful reassembly of the survivors. */
class LineCleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(text: String) =
    TextAnalysis.c4LineClean(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("n_lines", "n_kept", "cleaned_len").as[(Long, Long, Long)]
      .head()

  test("keeps only punctuated lines with enough words") {
    val text = Seq(
      "this line ends with a period.",   // kept
      "short one.",                      // dropped: < 3 words
      "no terminal punctuation here",    // dropped
      "is this a question?",             // kept
      "ends with bang now!"              // kept
    ).mkString("\n")
    val (nLines, nKept, len) = clean(text)
    assert(nLines == 5L)
    assert(nKept == 3L)
    assert(len == ("this line ends with a period." +
      "\nis this a question?\nends with bang now!").length)
  }

  test("blocklist drops lines case-insensitively") {
    val text = Seq(
      "enable JavaScript to continue reading.",  // dropped: blocklist
      "Lorem Ipsum dolor sit amet today.",       // dropped: blocklist
      "a config line with braces { everywhere }.", // dropped: blocklist
      "a perfectly normal sentence here."        // kept
    ).mkString("\n")
    val (_, nKept, _) = clean(text)
    assert(nKept == 1L)
  }

  test("reassembled text is exactly the surviving lines") {
    val out = TextAnalysis.c4LineClean(
      Seq((1L, "keep this full line.\ndrop\nand keep this one too."))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("cleaned_md5").as[String].head()
    val expected = "keep this full line.\nand keep this one too."
    val ref = Seq((1L, expected)).toDF("doc_id", "t")
      .select(md5(col("t").cast("binary"))).as[String].head()
    assert(out == ref)
  }

  test("null and empty text yield zero kept lines") {
    assert(clean("") == ((1L, 0L, 0L)))
    val r = TextAnalysis.c4LineClean(
      Seq((1L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_kept").as[Long].head()
    assert(r == 0L)
  }
}

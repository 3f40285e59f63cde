package graft.operators

import graft.SparkSpec

/** Corpus card: hand-computed slice values, null/empty handling,
  * exact-median interpolation, partitioning invariance. */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("a", "the cat and the hat"),        // en, 5 toks, 19 chars
    ("a", "el perro de la casa grande"), // es, 6 toks, 26 chars
    ("a", ""),                           // empty, und
    ("b", null.asInstanceOf[String]),    // null -> empty, und
    ("b", "one two")                     // 2 toks (und: no stopwords)
  ).toDF("source", "text")

  test("hand-computed card per slice") {
    val out = Report.corpusCard(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1)
    val a = out(0)
    assert(a == (("a", 3L, 11L, 45L, 1L, 3L, 5.0)))
    val b = out(1)
    // b: docs 2, tokens 2, chars 7, empties 1, langs {und}, median 1.0
    assert(b == (("b", 2L, 2L, 7L, 1L, 1L, 1.0)))
  }

  test("partitioning invariance") {
    val base = Report.corpusCard(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSet
    val re = Report.corpusCard(docs.repartition(7), "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(base == re)
  }
}

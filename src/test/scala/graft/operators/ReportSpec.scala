package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("incremental card composes the ledger reads exactly") {
    val big = (1L to 400L)
      .map(i => (i, s"s${i % 4}", s"text body number $i", (i * 17) % 300 + 1))
      .toDF("doc_id", "source", "text", "n_chars")
    val slices = (0 until 3).map(i => big.filter(col("doc_id") % 3 === i))
    val card = Report.cardFromLedgers(
      slices.map(StatsLedger.partial(_, "source", "n_chars"))
        .reduce(StatsLedger.merge),
      slices.map(Sketch.hllRegisters(_, "source", "text"))
        .reduce(Sketch.hllMerge),
      slices.map(StatsLedger.histPartial(_, "source", "n_chars"))
        .reduce(StatsLedger.histMerge))
    // one row per source, and each column equals its one-shot read
    val rows = card.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    val stats = StatsLedger.partial(big, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap // sum
    val est = Sketch.hllDistinct(big, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { case (k, r) =>
      assert(r.getAs[Long]("sum") == stats(k))
      assert(r.getAs[Long]("est_q") == est(k))
      assert(r.getAs[Long]("p50_lo") <= r.getAs[Long]("p50_hi"))
      assert(r.getAs[Long]("p99_hi") >= r.getAs[Long]("p90_hi"))
    }
  }
}

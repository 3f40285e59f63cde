package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** X-2 unit vectors — pattern/TextBlob lexicon-average semantics. */
class LexiconPolaritySpec extends AnyFunSuite {

  private def p(s: String): Double = LexiconPolarity.polarity(s)

  test("single word = its lexicon polarity") {
    assert(math.abs(p("good") - 1.9 / 4.0) < 1e-12)
  }

  test("average over matched tokens only") {
    assert(math.abs(p("good and bad") - ((1.9 / 4.0 + -2.5 / 4.0) / 2)) < 1e-12)
  }

  test("negation multiplies by -0.5") {
    assert(math.abs(p("not good") - (1.9 / 4.0 * -0.5)) < 1e-12)
    assert(p("not bad") > 0)
  }

  test("intensifier scales; negated intensifier flips") {
    assert(p("very good") > p("good"))
    assert(p("slightly good") < p("good"))
    assert(p("not very good") < 0)
  }

  test("no matches => 0.0; null-safe") {
    assert(p("the table") == 0.0)
    assert(p("") == 0.0)
    assert(p(null) == 0.0)
  }

  test("range stays within [-1, 1]") {
    assert(math.abs(p("love love love amazing awesome best")) <= 1.0)
  }

  test("sentiment(): polarity consistent with polarity(), subjectivity in [0,1]") {
    for (t <- Seq("good", "not bad at all", "very good and truly awful", "the table")) {
      val (pol, subj) = LexiconPolarity.sentiment(t)
      assert(math.abs(pol - p(t)) < 1e-12, t)
      assert(subj >= 0.0 && subj <= 1.0, t)
    }
    assert(LexiconPolarity.sentiment("the chair and the table")._2 == 0.0)
    assert(LexiconPolarity.sentiment("absolutely amazing wonderful")._2 > 0.5)
  }

  test("column surface: lexiconSentiment struct matches the kernel") {
    val spark = graft.SparkSessionProvider.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq("good news everyone", "the chair and the table",
      "not very good", "")
    val rows = texts.toDF("text")
      .select(Sentiment.lexiconSentiment(col("text")).as("s"))
      .select($"s.polarity", $"s.subjectivity")
      .as[(Double, Double)].collect()
    texts.zip(rows).foreach { case (t, (pol, subj)) =>
      val (ep, es) = LexiconPolarity.sentiment(t)
      assert(pol == ep && subj == es, s"mismatch for '$t'")
    }
  }

  test("null text yields a NULL struct, matching the native exprs") {
    // NULL in → NULL out across the whole sentiment surface: the
    // nullSafeEval expressions (vaderScores, lexiconPolarity) already
    // behave this way; the struct UDF must agree or
    // sentiment().polarity and polarity() diverge on null input
    // (round-13 ADVICE: the x01 oracle compare would spuriously fail
    // on any corpus carrying a null text row).
    val spark = graft.SparkSessionProvider.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val row = Seq(null: String).toDF("text")
      .select(
        Sentiment.lexiconSentiment(col("text")).as("s"),
        Sentiment.vaderScores(col("text")).as("v"),
        Sentiment.lexiconPolarity(col("text")).as("p"))
      .collect()(0)
    assert(row.isNullAt(0), "lexiconSentiment(null) must be NULL")
    assert(row.isNullAt(1), "vaderScores(null) must be NULL")
    assert(row.isNullAt(2), "lexiconPolarity(null) must be NULL")
  }
}

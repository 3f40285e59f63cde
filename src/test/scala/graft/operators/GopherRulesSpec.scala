package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-document coverage for [[TextAnalysis.gopherRules]]: each of
  * the seven Gopher gates tripped by exactly one doc, plus the edge
  * shapes (empty/null text, vacuous line gates). */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // 59 words, mean length in [3,10], two stop words, all-alpha: passes
  private val goodBody = (("the cat sat with " * 14).trim + " kind dog bee")

  private def rules(rows: Seq[(Long, String)]) =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text",
        minWords = 50)
      .collect().map(r => r.getLong(0) ->
        (2 to 9).map(i => r.getBoolean(i))).toMap

  test("a clean doc passes every gate") {
    val v = rules(Seq((1L, goodBody)))(1L)
    assert(v.forall(identity))
  }

  test("each gate trips on its planted doc, others stay green") {
    val m = rules(Seq(
      (1L, goodBody),
      // word count: under 50 words (mean 19/6 >= 3 still holds)
      (2L, "the cat sat with big dog"),
      // mean word length: sixty 1-char words -> mean 1 < 3 (also no
      // stop words — 1-char words can't contain any of the eight)
      (3L, Array.fill(60)("a").mkString(" ")),
      // symbols: 7 hashes over 60 words -> 70 > 60
      (4L, goodBody + " #######"),
      // bullets: every line starts with '-' (9-word lines keep the
      // mean above 3 despite the 1-char dashes)
      (5L, Seq.fill(8)("- the quick cat sat with kind dog bee").mkString("\n")),
      // ellipsis: the single line ends with "..."
      (6L, goodBody + "..."),
      // alpha: 60 digit words vs 59 alpha words -> under 80% (3-char
      // digit words keep the mean above 3)
      (7L, goodBody + " " + Array.fill(60)("777").mkString(" ")),
      // stopwords: only one of the eight present
      (8L, ("cat dog bee fox " * 15).trim + " the")))
    val names = Seq("g_word_count", "g_mean_word_len", "g_symbol",
      "g_bullet", "g_ellipsis", "g_alpha", "g_stopwords", "g_keep")
    assert(m(1L).forall(identity))
    // doc i+1 fails exactly gate i (plus g_keep); exceptions noted
    def failing(id: Long): Set[String] =
      names.zip(m(id)).collect { case (n, false) => n }.toSet
    assert(failing(2L) == Set("g_word_count", "g_keep"))
    // 1-char words also fail nothing else: "a" is alphabetic, no stops
    assert(failing(3L) == Set("g_mean_word_len", "g_stopwords", "g_keep"))
    assert(failing(4L) == Set("g_symbol", "g_keep"))
    assert(failing(5L) == Set("g_bullet", "g_keep"))
    assert(failing(6L) == Set("g_ellipsis", "g_keep"))
    assert(failing(7L) == Set("g_alpha", "g_keep"))
    assert(failing(8L) == Set("g_stopwords", "g_keep"))
  }

  test("unicode ellipsis and bullet count like their ASCII forms") {
    val m = rules(Seq(
      (1L, goodBody + "…"),                            // line ends with …
      (2L, Seq.fill(8)("• the quick cat sat with kind dog bee").mkString("\n"))))
    assert(m(1L)(4) === false, "… line must trip g_ellipsis")
    assert(m(2L)(3) === false, "• lines must trip g_bullet")
  }

  test("empty and null text: line gates vacuous, word gates fail") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text").collect()
    out.foreach { r =>
      assert(r.getLong(1) == 0L)                  // n_words
      assert(!r.getBoolean(2) && !r.getBoolean(3)) // word count, mean len
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6))
      assert(!r.getBoolean(9))                    // g_keep
    }
  }

  test("ellipsis char counting: '...' counts once per triple") {
    // 5 dots = one '...' match (leftmost, non-overlapping) -> 1 symbol;
    // 60 words so the single symbol passes 10*1 <= 60
    val v = rules(Seq((1L, goodBody + " ....." )))(1L)
    assert(v(2), "one ellipsis over 60 words passes g_symbol")
  }
}

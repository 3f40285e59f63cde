package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Porter stemmer vectors from the published algorithm description. */
class PorterSpec extends AnyFunSuite {
  test("classic vectors") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "falling" -> "fall", "hissing" -> "hiss",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "feudalism" -> "feudal", "hopefulness" -> "hope",
      "formality" -> "formal", "sensitivity" -> "sensit",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "adjustment" -> "adjust",
      "effective" -> "effect", "probate" -> "probat", "rate" -> "rate",
      "controll" -> "control", "roll" -> "roll")
    val bad = cases.filter { case (in, want) => Porter.stem(in) != want }
    assert(bad.isEmpty, s"wrong stems: ${bad.map { case (i, w) => s"$i->${Porter.stem(i)} (want $w)" }}")
  }

  test("short words unchanged") {
    assert(Porter.stem("is") == "is")
    assert(Porter.stem("a") == "a")
  }
}

/** X-10 analyze chain over DataFrames. */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize lowercases and splits on non-alphanumerics") {
    val r = Seq("Hello, World! 42x").toDF("t")
      .select(Analyzer.tokenize(col("t"))).as[Seq[String]].head()
    assert(r == Seq("hello", "world", "42x"))
  }

  test("stop filter removes english stopwords") {
    val r = Seq("the quick fox is in the box").toDF("t")
      .select(Analyzer.tokensNoStop(col("t"))).as[Seq[String]].head()
    assert(r == Seq("quick", "fox", "box"))
  }

  test("analyze stems the remaining tokens") {
    val r = Seq("the sorted windows are merging quickly").toDF("t")
      .select(Analyzer.analyze(col("t"))).as[Seq[String]].head()
    assert(r == Seq("sort", "window", "merg", "quickli"))
  }

  test("tokenizePrefix equals slice(tokenize, 1, n) on every edge shape") {
    // edges: leading/trailing delimiters, fewer tokens than n, exactly
    // n, n+1 (limit boundary), many more, empty, delimiter-only
    val texts = Seq(
      "  Hello, World! 42x  ", "one two", "a b c d e f",
      "a b c d e f g", "a b c d e f g h i j k l m", "", "!!! ,,, ...",
      "word", " leading space then lots of words beyond the title region x y z")
    val df = texts.toDF("t")
    Seq(1, 3, 6).foreach { n =>
      val got = df.select(Analyzer.tokenizePrefix(col("t"), n))
        .as[Seq[String]].collect().toSeq
      val want = df.select(slice(Analyzer.tokenize(col("t")), 1, n))
        .as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n: $got != $want")
    }
  }

  test("tokenizePrefix equivalence holds on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val mismatch = docs.select(
        Analyzer.tokenizePrefix(coalesce(col("text"), lit("")), 6).as("p"),
        slice(Analyzer.tokenize(coalesce(col("text"), lit(""))), 1, 6).as("f"))
      .filter(not(col("p") <=> col("f"))).count()
    assert(mismatch == 0L)
  }

  test("analyzedMatchCount matches across morphology") {
    val df = Seq((1L, "sorting merged windows"), (2L, "nothing relevant here"))
      .toDF("id", "t")
    val scores = df.select(col("id"),
      Analyzer.analyzedMatchCount(col("t"), "sorted merging window").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(scores(1L) == 3)
    assert(scores(2L) == 0)
  }
}

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

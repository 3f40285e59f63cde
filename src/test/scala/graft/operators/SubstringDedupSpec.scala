package graft.operators

import graft.SparkSpec

/** ExactSubstr sliding-window dedup (Lee et al. 2022): k-token windows
  * duplicated anywhere in the corpus are removed from every instance
  * except the corpus-wide first occurrence; survivors reassemble. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and doc 2 share the 4-token run "one two three four" at
  // DIFFERENT offsets (1 vs 0) — exactly what aligned span dedup
  // misses; doc 3 is clean; doc 4 is too short to window.
  private val docs = Seq(
    (1L, "intro one two three four tail"),
    (2L, "one two three four coda words"),
    (3L, "totally distinct content here now"),
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  private def run(k: Int) =
    TextAnalysis.substringDedup(docs, "doc_id", "text", k)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("first occurrence survives; later instance loses covered tokens") {
    val r = run(4).map(t => t._1 -> t).toMap
    // doc 1 holds the smallest ord for the shared gram -> untouched
    assert(r(1L) == ((1L, 6L, 0L, "intro one two three four tail")))
    // doc 2's instance at start 0 covers positions 0..3
    assert(r(2L) == ((2L, 6L, 4L, "coda words")))
    assert(r(3L) == ((3L, 5L, 0L, "totally distinct content here now")))
  }

  test("docs shorter than k pass through untouched") {
    val r = run(4).map(t => t._1 -> t).toMap
    assert(r(4L) == ((4L, 2L, 0L, "tiny doc")))
  }

  test("within-doc repetition: second copy removed") {
    val rep = Seq((1L, "x y z w x y z w end")).toDF("doc_id", "text")
    val r = TextAnalysis.substringDedup(rep, "doc_id", "text", 4)
      .as[(Long, Long, Long, String)].collect().head
    // windows at starts 0 and 4 share "x y z w"; start-0 wins,
    // positions 4..7 are covered
    assert(r == ((1L, 9L, 4L, "x y z w end")))
  }

  test("overlapping dup windows: coverage is the union") {
    // docs share a 5-token run -> two overlapping 4-windows dup in
    // doc 2; union of [0..3] and [1..4] = positions 0..4
    val d = Seq(
      (1L, "a b c d e one"),
      (2L, "a b c d e two")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.substringDedup(d, "doc_id", "text", 4)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(r(0) == ((1L, 6L, 0L, "a b c d e one")))
    assert(r(1) == ((2L, 6L, 5L, "two")))
  }

  test("empty and fully-removed docs keep their row") {
    val d = Seq(
      (1L, "p q r s"),
      (2L, "p q r s"),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.substringDedup(d, "doc_id", "text", 4)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(r(0) == ((1L, 4L, 0L, "p q r s")))
    assert(r(1) == ((2L, 4L, 4L, "")))
    assert(r(2) == ((3L, 0L, 0L, "")))
  }

  test("deterministic under input partitioning") {
    val a = TextAnalysis.substringDedup(docs.repartition(7), "doc_id", "text", 4)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.substringDedup(docs.coalesce(1), "doc_id", "text", 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("hash-keyed mode == string-keyed mode on the sf0.1 corpus") {
    // the default 64-bit-hash shuffle key must elect the same winners
    // (and therefore the same removals) as the exactly-replayable
    // string key — row for row on the largest local corpus
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val hash = TextAnalysis.substringDedup(corpus, "doc_id", "text", 8)
      .orderBy("doc_id").collect().toSeq
    val str = TextAnalysis.substringDedup(corpus, "doc_id", "text", 8,
      oracleReplayable = true)
      .orderBy("doc_id").collect().toSeq
    assert(hash.nonEmpty && hash == str)
    // the x29-gated wrapping-64 rolling key: same outputs again
    val roll = TextAnalysis.substringDedup(corpus, "doc_id", "text", 8,
      rollingKey = true)
      .orderBy("doc_id").collect().toSeq
    assert(roll == str)
  }
}

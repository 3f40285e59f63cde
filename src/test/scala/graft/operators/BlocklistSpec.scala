package graft.operators

import graft.SparkSpec

/** Aho–Corasick phrase blocklist: hand-traced overlap/nesting cases,
  * a brute-force sliding-window cross-check on real data, and the
  * zero-Exchange plan assertion (the operator's scale contract). */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping and nested patterns all count") {
    val docs = Seq(
      // "a b a b a": [a,b,a] starts at 1,3 (overlap); [b,a] at 2,4.
      (1L, "a b a b a"),
      // nested: [t] occurs 3x, [t,t] occurs 2x (overlapping pair).
      (2L, "t t t"),
      (3L, "nothing here")
    ).toDF("doc_id", "text")
    val out = Blocklist.phraseMatches(docs, "doc_id", "text",
        Seq(Seq("a", "b", "a"), Seq("b", "a"), Seq("t"), Seq("t", "t")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3, r._4)).toSeq ==
      Seq((1L, 4L, 2L), (2L, 5L, 2L), (3L, 0L, 0L)))
  }

  test("failure links: suffix of a failed match still matches") {
    // After reading "x y" toward [x,y,z], failing on the second "y"
    // must land on the [y,y] path, not root.
    val docs = Seq((1L, "x y y z")).toDF("doc_id", "text")
    val out = Blocklist.phraseMatches(docs, "doc_id", "text",
        Seq(Seq("x", "y", "z"), Seq("y", "y"), Seq("y", "z")))
      .as[(Long, Long, Long, Long)].collect()
    // matches: [y,y] at 2; [y,z] at 3 → total 2, distinct 2.
    assert(out.head._3 == 2L && out.head._4 == 2L)
  }

  test("brute-force cross-check on the real corpus") {
    val pats = Seq(Seq("table"), Seq("table", "table"), Seq("key", "agg"),
      Seq("big", "big"), Seq("fast", "fast", "fast"))
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val out = Blocklist.phraseMatches(docs, "doc_id", "text", pats)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    val toks = docs.selectExpr("doc_id",
        "filter(split(lower(coalesce(text,'')), '[^a-z0-9\\']+'), x -> x != '') AS t")
      .as[(Long, Seq[String])].collect()
    toks.foreach { case (id, t) =>
      val counts = pats.map { p =>
        if (t.length < p.length) 0L
        else t.sliding(p.length).count(_ == p).toLong
      }
      val exp = (counts.sum, counts.count(_ > 0).toLong)
      assert(out(id) == exp, s"doc $id: got ${out(id)}, expected $exp")
    }
  }

  test("empty/null docs and empty-pattern guard") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Blocklist.phraseMatches(docs, "doc_id", "text", Seq(Seq("x")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
    intercept[IllegalArgumentException] {
      Blocklist.phraseMatches(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Blocklist.phraseMatches(docs, "doc_id", "text", Seq(Seq.empty))
    }
  }

  test("zero shuffles: no Exchange anywhere in the physical plan") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Blocklist.phraseMatches(docs, "doc_id", "text",
        Seq(Seq("table"), Seq("key", "agg")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("partitioning invariance") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pats = Seq(Seq("table", "table"), Seq("scan", "slow"))
    val a = Blocklist.phraseMatches(docs, "doc_id", "text", pats)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Blocklist.phraseMatches(docs.repartition(13), "doc_id", "text", pats)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}

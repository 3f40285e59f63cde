package graft.operators

import graft.SparkSpec

/** Winnowing: the shared-run guarantee, selection density, short-doc
  * edge, the MOSS pair report on planted near-dups, and partitioning
  * invariance. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("shared run of k+w-1 tokens guarantees a shared fingerprint") {
    // k=5, w=4: a shared run of 8 tokens must yield >= 1 common
    // selected fingerprint (Schleimer §2.2 correctness property).
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two $run three four five six seven"),
      (2L, s"nine ten eleven twelve $run thirteen")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    val s1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val s2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((s1 & s2).nonEmpty, "no shared fingerprint for a shared 8-run")
  }

  test("selection density is bounded and positions are valid") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val fps = TextAnalysis.winnow(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    val toks = docs.selectExpr("doc_id",
        "size(filter(split(lower(coalesce(text,'')), '[^a-z0-9\\']+'), x -> x != '')) AS n")
      .as[(Long, Long)].collect().toMap
    val byDoc = fps.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val m = toks(id) - 4 // gram count at k=5
      assert(rows.forall(r => r._2 >= 1 && r._2 <= m), s"pos out of range for $id")
      // every window selects one of w=4 grams; dedup across windows
      // keeps density well under 1 and above the 1/w floor
      assert(rows.length <= m)
      if (m >= 8) assert(rows.length >= m / 4 - 1, s"doc $id too sparse")
    }
    assert(byDoc.nonEmpty)
  }

  test("docs shorter than k tokens emit nothing") {
    val docs = Seq((1L, "one two three four"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(TextAnalysis.winnow(docs, "doc_id", "text").count() == 0L)
  }

  test("pair report finds planted near-dups, never unrelated docs") {
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared extra words here"),
      (2L, s"prefix bits $shared"),
      (3L, "a completely unrelated document with other content entirely " +
        "that keeps going for long enough to have many grams of its own")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("partitioning invariance") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextAnalysis.winnowPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val b = TextAnalysis.winnowPairs(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}

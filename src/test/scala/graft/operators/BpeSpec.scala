package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE merge training: greedy-fold semantics, determinism, apply. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // reference single-threaded BPE (the textbook walk-and-skip loop)
  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var tbl = words.map { case (w, f) =>
      (w.map(_.toString).toVector :+ Bpe.Marker, f)
    }.toVector
    var out = Vector.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), cc) => (-cc, a, b) }
        out :+= ((l, rr, c))
        tbl = tbl.map { case (syms, f) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              buf += (l + rr); i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), f)
        }
      }
      r += 1
    }
    out
  }

  private def engineTrain(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    // one doc repeating each word freq times reproduces the type table
    val text = words.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    Bpe.trainMerges(Seq(text).toDF("text"), "text", n)
      .orderBy("rank").collect()
      .map(row => (row.getString(1), row.getString(2), row.getLong(3))).toSeq
  }

  test("matches the textbook greedy loop, including overlapping runs") {
    // 'aaaa' forces the l == r overlap case where greedy takes even
    // offsets; 'abab' forces repeated non-overlapping merges
    val words = Map("aaaa" -> 5L, "abab" -> 3L, "ab" -> 2L, "ba" -> 1L)
    assert(engineTrain(words, 6) == refTrain(words, 6))
  }

  test("merged symbols participate in later rounds (subword growth)") {
    val words = Map("lower" -> 6L, "low" -> 5L, "lowest" -> 2L)
    val eng = engineTrain(words, 5)
    assert(eng == refTrain(words, 5))
    // 'l'+'o' or 'lo'+'w' chains must appear: merges build on merges
    assert(eng.exists { case (l, r, _) => l.length + r.length > 2 })
  }

  test("deterministic under repartitioning") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.trainMerges(docs, "text", 4).collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(13), "text", 4).collect().toSeq
    assert(a.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString) ==
      b.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString))
  }

  test("exhausted corpus stops early instead of failing") {
    // single 1-char word: round 1 merges (a, _); afterwards every word
    // is one symbol — no pairs left
    val out = Bpe.trainMerges(Seq("a").toDF("text"), "text", 8)
      .orderBy("rank").collect()
    assert(out.length == 1)
    assert((out(0).getString(1), out(0).getString(2)) == (("a", "_")))
  }

  test("segment applies merges in rank order") {
    val corpus = Seq("low low low lower lower lowest").toDF("text")
    val merges = Bpe.trainMerges(corpus, "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Bpe.segment(Seq("low lowest").toDF("text"), "text", merges)
      .select(col("pieces")).head.getSeq[String](0)
    // every piece concatenates back to the original text's words
    assert(seg.mkString == "low" + Bpe.Marker + "lowest" + Bpe.Marker)
    // training on 'low'-family words must have learned 'low' as a unit
    assert(seg.contains("low" + Bpe.Marker) || seg.contains("low"))
  }

  test("resume: chained 2×8 rounds through a parquet round-trip ≡ one-shot 16") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val oneShot = Bpe.trainState(docs, "text", 16)
    // first chunk, state persisted like a real 30k-merge run would
    val first = Bpe.trainState(docs, "text", 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe_state").toString
    first.merges.write.mode("overwrite").parquet(s"$dir/merges")
    first.words.write.mode("overwrite").parquet(s"$dir/words")
    val resumed = Bpe.resumeMerges(
      spark.read.parquet(s"$dir/words"),
      spark.read.parquet(s"$dir/merges"), nMore = 8)
    def mergeRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    assert(mergeRows(resumed.merges) == mergeRows(oneShot.merges))
    assert(mergeRows(resumed.merges).map(_._1) == (1L to 16L))
    // the resumed symbol state must equal the one-shot state too —
    // that is what makes a THIRD chunk exact
    def wordRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
        .toSeq
    assert(wordRows(resumed.words) == wordRows(oneShot.words))
  }

  test("fertility: hand-computed on a 3-token corpus") {
    // corpus "ab ab c": round 1 merges (a,b) (freq 2 beats (b,_) tie
    // on lex order? no — (a,b) and (b,_) both freq 2, (a,b) wins the
    // (l,r) ascending tiebreak), round 2 merges (ab,_) (freq 2).
    // Final: 'ab' -> [ab_] (1 piece), 'c' -> [c, _] (2 pieces).
    val out = Bpe.fertility(Seq("ab ab c").toDF("text"), "text", 2)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out == ((2L, 3L, 4L, 4.0 / 3.0, 1.0 / 3.0)))
  }

  test("null and empty text contribute nothing") {
    val df = Seq(Some("ab ab"), None, Some("")).toDF("text")
    val out = Bpe.trainMerges(df, "text", 2).orderBy("rank").collect()
    assert(out.nonEmpty && out(0).getString(1) == "a" && out(0).getString(2) == "b")
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** The inverted index at rest: serving equals the scan-time BM25
  * bit-for-bit, the postings read partition-prunes to the query's
  * buckets, and incremental maintenance (append + redelivery + the
  * crash window's duplicate postings) never changes the answer. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("dup", "window", "scan")

  private def freshIndex(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-idx-spec").toString
    InvertedIndex.writeIndex(Tables.documents(spark, dir), "doc_id",
      Seq("text"), d)
    d
  }

  private def scanScores(): Map[Long, Double] =
    Search.bm25Scored(Tables.documents(spark, dir), Seq("text"), terms)
      .select(col("doc_id").cast("long"), col("score"))
      .as[(Long, Double)].collect().toMap

  private def indexScores(d: String): Map[Long, Double] =
    InvertedIndex.scored(spark, d, terms)
      .as[(Long, Double)].collect().toMap

  test("index-served scores are bit-identical to the scan path") {
    val d = freshIndex()
    val scan = scanScores()
    val idx = indexScores(d)
    // every candidate matches the scan score EXACTLY (same doubles)
    idx.foreach { case (id, s) =>
      assert(java.lang.Double.doubleToLongBits(s) ==
        java.lang.Double.doubleToLongBits(scan(id)),
        s"doc $id: index $s vs scan ${scan(id)}")
    }
    // and every positive scan score IS a candidate (nothing missed)
    val positives = scan.filter(_._2 > 0.0).keySet
    assert(positives.subsetOf(idx.keySet),
      s"missing candidates: ${(positives -- idx.keySet).take(5)}")
  }

  test("postings read partition-prunes to the query terms' buckets") {
    val d = freshIndex()
    val pruned = InvertedIndex.readPostings(spark, d, terms, 64)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition filter in:\n$plan")
    // input_file_name proof on the pre-dedup scan (provenance does
    // not survive the dedup shuffle): ≤ one bucket dir per term
    val raw = spark.read.parquet(s"$d/postings")
      .filter(terms.map(t =>
          col("bucket") === InvertedIndex.bucketOf(lit(t), 64))
        .reduce(_ || _))
    val dirs = raw.select(input_file_name().as("f")).distinct()
      .as[String].collect()
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(dirs.nonEmpty && dirs.length <= terms.length,
      s"expected ≤${terms.length} bucket dirs, touched ${dirs.length}")
    assert(dirs.forall(_.contains("bucket=")), dirs.mkString(","))
  }

  test("incremental build + full redelivery serves the one-shot answer") {
    val oneShot = freshIndex()
    val inc = java.nio.file.Files.createTempDirectory("graft-idx-inc").toString
    val docs = Tables.documents(spark, dir)
    // three delta batches cover the corpus; batch 1 redelivered
    (Seq(0L, 1L, 2L) :+ 1L).foreach { sl =>
      InvertedIndex.appendBatch(docs.filter(col("doc_id") % 3 === sl),
        "doc_id", Seq("text"), inc)
    }
    assert(indexScores(inc) == indexScores(oneShot))
    // the stats ledger folded exactly the corpus (redelivery added 0)
    val n = spark.read.parquet(s"$inc/stats")
      .agg(sum(col("n_docs"))).as[Long].collect()(0)
    assert(n == docs.count())
  }

  test("crash-window duplicate postings heal read-side") {
    val d = freshIndex()
    val before = indexScores(d)
    // simulate the crash window: a batch's postings re-appended
    // (partials landed, ids did not, batch retried)
    val dup = spark.read.parquet(s"$d/postings")
      .filter(col("term").isin(terms: _*))
    dup.write.mode("append").partitionBy("bucket").parquet(s"$d/postings")
    assert(indexScores(d) == before,
      "dropDuplicates(term, doc_id) must absorb re-appended postings")
  }

  test("crash-window duplicate STATS partial heals read-side") {
    val inc = java.nio.file.Files.createTempDirectory("graft-idx-torn").toString
    val docs = Tables.documents(spark, dir)
    Seq(0L, 1L, 2L).foreach { sl =>
      InvertedIndex.appendBatch(docs.filter(col("doc_id") % 3 === sl),
        "doc_id", Seq("text"), inc)
    }
    val before = indexScores(inc)
    // the OTHER crash window: stats partial landed, ids did not; the
    // retried batch re-derives the same fresh set → an identical
    // partial re-appends. Without the batch_key dedup, N and Σdl
    // double-count and every served score silently shifts.
    val last = spark.read.parquet(s"$inc/stats")
      .orderBy(col("batch_key")).limit(1)
    last.write.mode("append").parquet(s"$inc/stats")
    assert(indexScores(inc) == before,
      "dropDuplicates(batch_key, …) must absorb a re-appended stats partial")
  }

  test("appendBatch under a different bucket layout fails fast") {
    val d = freshIndex() // layout fixed at 64
    val ex = intercept[IllegalArgumentException] {
      InvertedIndex.appendBatch(
        Tables.documents(spark, dir).limit(5), "doc_id", Seq("text"),
        d, numBuckets = 32)
    }
    assert(ex.getMessage.contains("num_buckets"))
  }

  test("indexDeltaSink maintains the index from a true stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val oneShot = freshIndex()
    val inc = java.nio.file.Files.createTempDirectory("graft-idx-ms").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idx-ck").toString
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), coalesce(col("text"), lit("")))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val sink = InvertedIndex.indexDeltaSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", Seq("text"), inc, ckpt)
    // two micro-batches cover the corpus, then batch 0 is REDELIVERED
    val (b0, b1) = docs.partition(_._1 % 2 == 0)
    Seq(b0, b1, b0).foreach { g =>
      mem.addData(g: _*)
      val q = sink.trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(indexScores(inc) == indexScores(oneShot))
  }

  test("phraseCount equals a brute-force token-sequence count") {
    val d = freshIndex()
    val phrase = Seq("fast", "spark")
    val got = InvertedIndex.phraseCount(spark, d, phrase)
      .as[(Long, Long)].collect().toMap
    // brute force over the same tokenizer's output
    val toksOf = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"),
        graft.functions.Analyzer.tokenize(coalesce(col("text"), lit(""))))
      .as[(Long, Seq[String])].collect()
    val expect = toksOf.flatMap { case (id, ts) =>
      val n = ts.sliding(2).count(_ == phrase)
      if (n > 0) Some(id -> n.toLong) else None
    }.toMap
    assert(got == expect)
  }

  test("a 3-term phrase is found only when strictly consecutive") {
    val d = java.nio.file.Files.createTempDirectory("graft-idx-ph3").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta"),      // match
      (2L, "alpha beta x gamma"),          // gap — no match
      (3L, "gamma beta alpha"),            // order matters — no match
      (4L, "alpha beta gamma alpha beta gamma")) // two matches
      .toDF("doc_id", "text")
    InvertedIndex.writeIndex(docs, "doc_id", Seq("text"), d)
    val got = InvertedIndex
      .phraseCount(spark, d, Seq("alpha", "beta", "gamma"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 4L -> 2L))
  }

  test("filteredScored = scored restricted to the keyword value") {
    val d = java.nio.file.Files.createTempDirectory("graft-idx-filt").toString
    InvertedIndex.writeIndex(Tables.documents(spark, dir), "doc_id",
      Seq("text"), d, keywordCols = Seq("source"))
    val all = InvertedIndex.scored(spark, d, terms)
      .as[(Long, Double)].collect().toMap
    val filtered = InvertedIndex
      .filteredScored(spark, d, terms, Seq("source" -> "src1"))
      .as[(Long, Double)].collect().toMap
    val src1Ids = Tables.documents(spark, dir)
      .filter(col("source") === "src1")
      .select(col("doc_id").cast("long")).as[Long].collect().toSet
    // exactly the src1 candidates, scores UNCHANGED (corpus-level idf)
    assert(filtered.keySet == all.keySet.intersect(src1Ids))
    filtered.foreach { case (id, s) => assert(s == all(id)) }
    // the keyword read prunes to one bucket directory
    val kw = spark.read.parquet(s"$d/keywords")
      .filter(col("bucket") === InvertedIndex.bucketOf(
        concat(lit("source"), lit(":"), lit("src1")), 64))
    val dirs = kw.select(input_file_name().as("f")).distinct()
      .as[String].collect()
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(dirs.length == 1 && dirs(0).contains("bucket="), dirs.mkString(","))
  }

  test("booleanQuery intersects must and subtracts must_not") {
    val d = java.nio.file.Files.createTempDirectory("graft-idx-bool").toString
    val docs = Seq(
      (1L, "alpha beta"),             // both musts
      (2L, "alpha beta gamma"),       // both musts, excluded term
      (3L, "alpha alpha beta"),       // both musts, tf_sum 3
      (4L, "alpha"),                  // missing a must
      (5L, "gamma"))                  // only the excluded term
      .toDF("doc_id", "text")
    InvertedIndex.writeIndex(docs, "doc_id", Seq("text"), d)
    val got = InvertedIndex
      .booleanQuery(spark, d, must = Seq("alpha", "beta"),
        mustNot = Seq("gamma"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 3L -> 3L))
    // must-only form keeps doc 2
    val mustOnly = InvertedIndex
      .booleanQuery(spark, d, must = Seq("alpha", "beta"))
      .as[(Long, Long)].collect().toMap
    assert(mustOnly == Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
  }

  test("postings compaction preserves the served answer") {
    val inc = java.nio.file.Files.createTempDirectory("graft-idx-cpt").toString
    val docs = Tables.documents(spark, dir)
    // many tiny batches → many small posting files per bucket
    (0L until 6L).foreach { sl =>
      InvertedIndex.appendBatch(docs.filter(col("doc_id") % 6 === sl),
        "doc_id", Seq("text"), inc)
    }
    val before = indexScores(inc)
    val report = graft.plans.Maintenance.compact(spark,
      s"$inc/postings", Seq("term", "doc_id"), maxFiles = 1)
    assert(report.compacted > 0 && report.filesAfter < report.filesBefore,
      report.toString)
    assert(indexScores(inc) == before)
  }

  test("topK keeps only positive scores in rank order") {
    val d = freshIndex()
    val rows = InvertedIndex.topK(spark, d, terms, k = 10)
      .as[(Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_._2 > 0.0))
    assert(rows.map(_._2).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    })
  }

  test("minSpan: hand-checked windows; AND semantics; order-free") {
    val docs = Seq(
      // a=0,4  b=2,5  c=6 → the best window is the LATE [4,6] = 3,
      // not the greedy-from-start [0,6]
      (1L, "a x b x a b c"),
      // a=0 b=1 c=2 → adjacent, span 3; later spread occurrences
      (2L, "a b c x x a x x c"),
      // terms out of query order: c=0 b=2 a=3 → window [0,3] = 4
      (3L, "c x b a"),
      (4L, "a b x"),            // missing c → excluded
      (5L, "x y z")             // no terms → excluded
    ).toDF("doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft-span-spec").toString
    InvertedIndex.writeIndex(docs, "doc_id", Seq("text"), d)
    val got = InvertedIndex.minSpan(spark, d, Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 4L))
  }

  test("minSpan: randomized docs match the exhaustive tuple minimum (3 seeds)") {
    val vocab = Vector("a", "b", "c", "x", "y")
    val query = Seq("a", "b", "c")
    for (seed <- Seq(17, 53, 89)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1 to 25).map(i =>
        (i.toLong, Seq.fill(4 + rnd.nextInt(14))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      // brute force: min over one-position-per-term tuples of max−min+1
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val pos = query.map(t => toks.zipWithIndex.collect {
          case (w, i) if w == t => i.toLong })
        if (pos.exists(_.isEmpty)) None
        else Some(id -> (for {
          pa <- pos(0); pb <- pos(1); pc <- pos(2)
        } yield Seq(pa, pb, pc).max - Seq(pa, pb, pc).min + 1).min)
      }.toMap
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-span-rnd$seed").toString
      InvertedIndex.writeIndex(docs.toDF("doc_id", "text"), "doc_id",
        Seq("text"), dir)
      val got = InvertedIndex.minSpan(spark, dir, query)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seed")
    }
  }
}

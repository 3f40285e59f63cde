package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-3 training-data ops: BM25 ranking, per-group caps, span-level
  * dedup, benchmark decontamination. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "common common common common common common common common"),
    (2L, "rare topic"),
    (3L, "common rare"),
    (4L, "nothing relevant here"),
    (5L, "common filler words plus lots and lots of extra padding text"),
    (6L, "common words")
  ).toDF("doc_id", "text")

  test("tf saturates: 8x stuffed doc scores < 8x a single hit") {
    val r = Search.bm25Scored(docs, Seq("text"), Seq("common"))
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    assert(r(1L) > r(6L))           // more hits still score higher...
    assert(r(1L) < 8.0 * r(6L))     // ...but far sublinearly (k1 cap)
  }

  test("doc-length normalization: same tf, shorter doc wins") {
    val r = Search.bm25Scored(docs, Seq("text"), Seq("common"))
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    // docs 5 (12 toks) and 6 (2 toks) both have tf=1
    assert(r(6L) > r(5L))
  }

  test("byKeywordBm25 filters zero scores and ranks rare over common") {
    val r = Search.byKeywordBm25(docs, "doc_id", Seq("text"),
      Seq("common", "rare"), k = 10).select("doc_id").as[Long].collect()
    assert(!r.contains(4L))
    val pos = r.zipWithIndex.toMap
    assert(pos(2L) < pos(6L)) // one rare hit beats one common hit
  }

  test("bm25 matches the closed-form value on a one-doc corpus") {
    val one = Seq((1L, "a b a")).toDF("doc_id", "text")
    val s = Search.bm25Scored(one, Seq("text"), Seq("a"))
      .select($"score").as[Double].head()
    // N=1, df=1, dl=avgdl=3 ⇒ idf=ln(0.5/1.5+1)=ln(4/3);
    // tf=2 ⇒ 2*2.2/(2+1.2*1) = 4.4/3.2
    val expected = math.log(1.0 / 3.0 + 1.0) * ((2.0 * 2.2) / (2.0 + 1.2))
    assert(math.abs(s - expected) < 1e-12)
  }
}

class CapPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("caps each group at n with deterministic order and 1-based rank") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 200L), ("a", 4L, 300L),
      ("b", 5L, 50L)
    ).toDF("source", "doc_id", "n_chars")
    val r = Sampling.capPerGroup(df, "source", "n_chars", "doc_id", n = 2)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toMap
    // group a ordered (300,2),(300,4),(200,3),(100,1) → keep 2 & 4
    assert(r == Map(2L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("skew-safe two-phase cap is identical to the single-window cap") {
    // one mega-group (70% of rows) + many small ones, ties included
    val df = spark.range(0, 2000, 1, 8).select(
      when($"id" % 10 < 7, "mega").otherwise(concat(lit("g"), $"id" % 10)).as("source"),
      $"id".as("doc_id"),
      ($"id" * 37 % 101).as("n_chars"))
    val a = Sampling.capPerGroup(df, "source", "n_chars", "doc_id", n = 5)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toSet
    val b = Sampling.capPerGroupSkewSafe(df, "source", "n_chars", "doc_id", n = 5)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("span counts, ragged tail, and cross-doc dup fraction") {
    // 2-token spans: doc1 = [a b][c d], doc2 = [a b][x y], doc3 = [z q][w]
    val df = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "z q w")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.spanDedupStats(df, "doc_id", "text", spanTokens = 2)
      .select($"doc_id", $"n_spans", $"n_dup_spans", $"dup_span_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)))  // shares "a b" with doc 2
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(3L) == ((2L, 0L, 0.0)))  // ragged tail "w" counted, unique
  }

  test("within-doc repeats count as duplicated spans") {
    val df = Seq((1L, "a b a b"), (2L, "c c")).toDF("doc_id", "text")
    val r = TextAnalysis.spanDedupStats(df, "doc_id", "text", spanTokens = 2)
      .select($"doc_id", $"n_dup_spans").as[(Long, Long)].collect().toMap
    assert(r(1L) == 2L) // "a b" twice in the same doc → both instances dup
    assert(r(2L) == 0L)
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("scale, error and checksum match the closed form") {
    val (s, e, c) = Similarity.quantOf(Seq(1.0, -0.5, 0.25))
    assert(s == 1.0 / 127.0)
    // q = [127, -63, 32] (floor(-63.5+0.5) = -63, floor(31.75+0.5) = 32)
    assert(c == 127L * 1 - 63L * 2 + 32L * 3)
    val err = {
      val qs = Seq(127.0, -63.0, 32.0)
      math.sqrt(Seq(1.0, -0.5, 0.25).zip(qs)
        .map { case (v, q) => val d = v - q * s; d * d }.sum)
    }
    assert(math.abs(e - err) < 1e-15)
  }

  test("zero vector quantizes to zeros, not NaN") {
    assert(Similarity.quantOf(Seq(0.0, 0.0)) == ((0.0, 0.0, 0L)))
  }

  test("quantizeStats: reconstruction error bounded by dim * (scale/2)^2") {
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f, 0.1f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeStats(df, "vec_id", "embedding")
      .select($"scale", $"err").as[(Double, Double)].head()
    assert(r._2 <= math.sqrt(4.0) * (r._1 / 2.0) + 1e-12)
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("assignment picks the max-cosine centroid, smallest id on ties") {
    val cents = Seq((5L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (7L, Seq(0.0, 1.0)))
    assert(Similarity.ivfAssignOf(Seq(3.0, 0.1), cents) == 5L)
    // exact tie between centroids 2 and 7 → smallest id
    assert(Similarity.ivfAssignOf(Seq(0.0, 2.0), cents) == 2L)
  }

  test("probe returns nprobe ids ordered by cosine then id") {
    val cents = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.7, 0.7)), (3L, Seq(0.0, 1.0)))
    assert(Similarity.ivfProbeOf(Seq(1.0, 0.2), cents, 2) == Seq(1L, 2L))
  }

  test("ivfTopK finds the nearest vectors when the cell is probed") {
    // 2-d corpus: query = (1,0); ids 0..3 are centroids
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(-1.0f, 0.0f)), (3L, Seq(0.0f, -1.0f)),
      (10L, Seq(0.9f, 0.1f)), (11L, Seq(0.1f, 0.9f)), (12L, Seq(-0.9f, -0.1f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.ivfTopK(rows, "vec_id", "embedding", queryId = 0L,
      numCentroids = 4, nprobe = 2, k = 3)
      .select($"vec_id").as[Long].collect()
    assert(r.head == 10L) // closest to the query direction
    assert(!r.contains(12L) || r.indexOf(12L) > r.indexOf(10L))
  }
}

class SpanRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence survives, later ones drop, text reassembles in order") {
    // 2-token spans: doc1 = [a b][c d]; doc2 = [a b][e f]; doc3 = [e f][a b]
    val df = Seq(
      (1L, "a b c d"), (2L, "a b e f"), (3L, "e f a b")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.spanDedupRewrite(df, "doc_id", "text", spanTokens = 2)
      .select($"doc_id", $"total_spans", $"kept_spans", $"text_dedup")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((2L, 2L, "a b c d")))   // owns first "a b"
    assert(r(2L) == ((2L, 1L, "e f")))       // "a b" lost to doc 1
    assert(r(3L) == ((2L, 0L, "")))          // both spans seen earlier
  }

  test("within-doc repeat keeps only the first instance") {
    val df = Seq((7L, "x y x y")).toDF("doc_id", "text")
    val r = TextAnalysis.spanDedupRewrite(df, "doc_id", "text", spanTokens = 2)
      .select($"kept_spans", $"text_dedup").as[(Long, String)].head()
    assert(r == ((1L, "x y")))
  }

  test("corpus invariant: Σ kept_spans == distinct span values (sf0.001)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = TextAnalysis.spanDedupRewrite(docs, "doc_id", "text", spanTokens = 8)
      .agg(sum($"kept_spans")).as[Long].head()
    // exactly one instance of every distinct span value survives
    val base = docs.select($"doc_id",
      graft.functions.Analyzer.tokenize($"text").as("toks"))
      .withColumn("__nsp", expr("(size(toks) + 7) div 8"))
    val distinctSpans = base.select(explode(when($"__nsp" > 0,
        transform(sequence(lit(1), $"__nsp"),
          i => concat_ws(" ", slice($"toks", (i - 1) * 8 + 1, lit(8)))))
        .otherwise(array())).as("span"))
      .select(countDistinct($"span")).as[Long].head()
    assert(kept == distinctSpans && kept > 0)
  }
}

class KmeansIvfSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directions in 4-d, 20 members each, small
  // deterministic jitter
  private def clustered() = {
    val dirs = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    val rows = for {
      (dir, c) <- dirs.zipWithIndex
      i <- 0 until 20
    } yield {
      val j = 0.05 * ((i * 7 + c * 3) % 10) / 10.0
      val v = dir.zipWithIndex.map { case (x, d) =>
        (x + (if (d == (c + 1) % 4) j else 0.0)).toFloat }
      ((c * 20 + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("Lloyd iterations recover the three planted clusters") {
    val df = clustered()
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.count() == 3)
    // purity: every vector of a planted cluster lands in the same cell
    val centList = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val assigns = df.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id / 20, Similarity.ivfAssignOf(v, centList)) }
    assigns.groupBy(_._1).foreach { case (_, members) =>
      assert(members.map(_._2).distinct.size == 1)
    }
    // and distinct planted clusters land in distinct cells
    assert(assigns.map(_._2).distinct.length == 3)
  }

  test("ivfTopKWith on trained centroids finds same-cluster neighbors") {
    val df = clustered()
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 3, iters = 4)
    val r = Similarity.ivfTopKWith(df, "vec_id", "embedding", cents,
      queryId = 0L, nprobe = 1, k = 5)
      .select($"vec_id").as[Long].collect()
    assert(r.length == 5)
    assert(r.forall(_ / 20 == 0)) // all neighbors from the query's cluster
  }
}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps"),   // benchmark (id%2=0 below)
    (1L, "the quick brown cat sits"),    // shares "the quick brown"
    (2L, "jumps the quick brown fox"),   // shares 2 distinct trigrams
    (3L, "entirely different words here")
  ).toDF("doc_id", "text")

  test("flags docs sharing any trigram with the benchmark set") {
    val r = Dedup.decontaminate(docs, "doc_id", "text",
      isBenchmark = col("doc_id") === 0, n = 3)
      .select($"doc_id", $"n_contaminated", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r.keySet == Set(1L, 2L, 3L)) // benchmark rows excluded
    assert(r(1L) == ((1L, true)))
    assert(r(2L) == ((2L, true)))       // "the quick brown", "quick brown fox"
    assert(r(3L) == ((0L, false)))
  }

  test("broadcast and shuffle paths agree") {
    val a = Dedup.decontaminate(docs, "doc_id", "text",
      col("doc_id") === 0, n = 3, broadcastBenchmark = true)
    val b = Dedup.decontaminate(docs, "doc_id", "text",
      col("doc_id") === 0, n = 3, broadcastBenchmark = false)
    assert(a.collect().toSet == b.collect().toSet)
  }
}

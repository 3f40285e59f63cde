package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-4 training-data ops: paragraph-level exact dedup, corpus
  * bigram-LM quality scoring, vocab coverage, length-curriculum bins. */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta\n\ncookie banner\n\ngamma"),
    (2L, "cookie banner\n\ndelta"),          // dup para from doc 1
    (3L, "cookie banner\n\ncookie banner"),  // dup twice, incl. within-doc
    (4L, "unique text")
  ).toDF("doc_id", "text")

  private def run() = Dedup.paragraphDedup(docs, "doc_id", "text")
    .orderBy("doc_id")
    .select($"doc_id", $"n_paras", $"n_kept", $"cleaned_md5")
    .as[(Long, Long, Long, String)].collect()

  test("globally first occurrence wins; later copies dropped") {
    val r = run()
    assert(r.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (1L, 3L, 3L),   // first doc keeps everything
      (2L, 2L, 1L),   // 'cookie banner' already seen in doc 1
      (3L, 2L, 0L),   // both copies seen before (doc 1 + within-doc rule)
      (4L, 1L, 1L)))
  }

  test("cleaned text reassembles survivors in original order") {
    val r = run().map(t => t._1 -> t._4).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(r(1L) == m("alpha beta\n\ncookie banner\n\ngamma"))
    assert(r(2L) == m("delta"))
    assert(r(3L) == m(""))   // everything removed -> empty doc
    assert(r(4L) == m("unique text"))
  }

  test("deterministic under input partitioning (cluster-transfer guard)") {
    val a = Dedup.paragraphDedup(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.paragraphDedup(docs.coalesce(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // corpus counts: C(a b)=2, C(a c)=1 -> C(a .)=3; C(b a)=1 -> C(b .)=1
  private val docs = Seq(
    (1L, "a b"),
    (2L, "a b"),
    (3L, "a c"),
    (4L, "b a"),
    (5L, "solo"),     // 1 token -> no bigrams
    (6L, null: String)
  ).toDF("doc_id", "text")

  private def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong

  test("MLE bigram logprobs, micro-nat quantized, per-doc integer sums") {
    val r = LmScore.bigramScore(docs, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"lp_sum_q", $"avg_lp_q")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(1L) == ((1L, q(2.0 / 3.0), q(2.0 / 3.0).toDouble)))
    assert(r(3L) == ((1L, q(1.0 / 3.0), q(1.0 / 3.0).toDouble)))
    assert(r(4L) == ((1L, q(1.0), q(1.0).toDouble)))  // C(b a)/C(b .) = 1
    // well-formed text (frequent bigrams) outscores rare text
    assert(r(1L)._3 > r(3L)._3)
  }

  test("short and null docs score 0, not null (scored-frame contract)") {
    val r = LmScore.bigramScore(docs, "doc_id", "text")
      .where($"doc_id".isin(5L, 6L))
      .select($"n_bigrams", $"lp_sum_q", $"avg_lp_q")
      .as[(Long, Long, Double)].collect()
    assert(r.length == 2 && r.forall(_ == ((0L, 0L, 0.0))))
  }

  test("every input row appears exactly once in the output") {
    val out = LmScore.bigramScore(docs, "doc_id", "text")
    assert(out.count() == 6 && out.select("doc_id").distinct().count() == 6)
  }

  test("train/apply split: OOV bigrams floored and counted, not dropped") {
    // model knows only "a b"; held-out doc 9 is pure OOV junk
    val model = LmScore.train(docs.filter($"doc_id" <= 2L), "doc_id", "text")
    val held = Seq(
      (8L, "a b a b"),          // 3 bigrams: (a b) seen, (b a) unseen
      (9L, "zz qq zz")          // 2 bigrams, all unseen
    ).toDF("doc_id", "text")
    val r = LmScore.bigramScoreWith(held, "doc_id", "text", model)
      .select($"doc_id", $"n_bigrams", $"n_oov", $"lp_sum_q", $"avg_lp_q")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val f = LmScore.DefaultFloorLpQ
    // model: C(a b)=2, C(a .)=2 -> lp(b|a)=ln(1)=0 quantized
    assert(r(8L) == ((3L, 1L, 2L * q(1.0) + f, (2L * q(1.0) + f) / 3.0)))
    assert(r(9L) == ((2L, 2L, 2L * f, f.toDouble)))
    // OOV-heavy junk scores strictly worse than in-model text —
    // the property the inner join silently inverted
    assert(r(9L)._4 < r(8L)._4)
  }

  test("broadcast-model apply ≡ join-based apply, bit for bit") {
    val model = LmScore.train(docs.filter($"doc_id" <= 3L), "doc_id", "text")
    val held = docs.unionByName(Seq((9L, "zz qq")).toDF("doc_id", "text"))
    val viaJoin = LmScore.bigramScoreWith(held, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val viaBcast = LmScore.bigramScoreBroadcast(held, "text", model)
      .select($"doc_id", $"n_bigrams", $"n_oov", $"lp_sum_q", $"avg_lp_q")
      .orderBy("doc_id").collect().toSeq
    assert(viaJoin == viaBcast)
    // and the broadcast form is a projection: input columns survive
    val cols = LmScore.bigramScoreBroadcast(held, "text", model).columns.toSeq
    assert(cols.startsWith(Seq("doc_id", "text")))
  }

  test("oversized model auto-falls-back to the join form, bit for bit") {
    val model = LmScore.train(docs.filter($"doc_id" <= 3L), "doc_id", "text")
    val held = docs.unionByName(Seq((9L, "zz qq")).toDF("doc_id", "text"))
    val viaBcast = LmScore.bigramScoreBroadcast(held, "text", model)
      .orderBy("doc_id").collect().toSeq
    // a 1-row ceiling guarantees the guard fires (the model has more)
    assert(model.count() > 1L)
    val viaFallback = LmScore.bigramScoreBroadcast(held, "text", model,
        maxBroadcastRows = 1L)
      .orderBy("doc_id").collect().toSeq
    assert(viaFallback == viaBcast)
    // the fallback keeps the projection contract too
    assert(LmScore.bigramScoreBroadcast(held, "text", model,
      maxBroadcastRows = 1L).columns.toSeq ==
      LmScore.bigramScoreBroadcast(held, "text", model).columns.toSeq)
  }

  test("self-train shape: bigramScore ≡ scoreWith(train(self)), n_oov = 0") {
    val viaSplit = LmScore.bigramScoreWith(docs, "doc_id", "text",
      LmScore.train(docs, "doc_id", "text"))
    assert(viaSplit.filter($"n_oov" =!= 0L).count() == 0)
    val a = LmScore.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = viaSplit.select($"doc_id", $"n_bigrams", $"lp_sum_q", $"avg_lp_q")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + one isolated vector;
  // ids 0 and 1 double as the two cell centroids (smallest ids)
  private val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.0, 1.0, 0.0, 0.0)),
    (2L, Seq(0.999, 0.04, 0.0, 0.0)),   // near-dup of 0
    (3L, Seq(0.998, 0.06, 0.0, 0.0)),   // near-dup of 0 and 2
    (4L, Seq(0.05, 0.998, 0.0, 0.0)),   // near-dup of 1
    (5L, Seq(0.6, 0.8, 0.0, 0.0))       // in cell 1, but not near anything
  ).toDF("vec_id", "embedding")

  private def run(t: Double) =
    Similarity.semDedup(vecs, "vec_id", "embedding", numCells = 2, threshold = t)
      .orderBy("vec_id")
      .select($"vec_id", $"cell", $"comp", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()

  test("one representative survives per in-cell near-dup group") {
    val r = run(0.99).map(x => x._1 -> x).toMap
    assert(r(0L) == ((0L, 0L, 0L, true)))   // keeper of {0,2,3}
    assert(r(2L) == ((2L, 0L, 0L, false)))
    assert(r(3L) == ((3L, 0L, 0L, false)))
    assert(r(1L) == ((1L, 1L, 1L, true)))   // keeper of {1,4}
    assert(r(4L) == ((4L, 1L, 1L, false)))
    assert(r(5L)._4 && r(5L)._3 == 5L)      // isolated: keeps itself
  }

  test("threshold 1.0+ keeps everything (no pairs survive)") {
    val r = run(1.01)
    assert(r.length == 6 && r.forall(_._4))
  }

  test("deterministic under input partitioning") {
    val a = Similarity.semDedup(vecs.repartition(5), "vec_id", "embedding",
      numCells = 2, threshold = 0.99).orderBy("vec_id").collect().toSeq
    val b = Similarity.semDedup(vecs.coalesce(1), "vec_id", "embedding",
      numCells = 2, threshold = 0.99).orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("trained (k-means) cells plug into the same verdict path") {
    val trained = Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      k = 2, iters = 3)
    val r = Similarity.semDedupWith(vecs, "vec_id", "embedding",
      trained, threshold = 0.99)
      .orderBy("vec_id")
      .select($"vec_id", $"comp", $"keep")
      .as[(Long, Long, Boolean)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    // cell ids are training artifacts, but the near-dup GROUPS and
    // keep-one-per-group verdicts must match the deterministic path
    assert(r(0L) == ((0L, true)) && r(2L) == ((0L, false)) && r(3L) == ((0L, false)))
    assert(r(1L) == ((1L, true)) && r(4L) == ((1L, false)))
    assert(r(5L) == ((5L, true)))
  }
}

class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat"),
    (3L, "the end")
  ).toDF("doc_id", "text")  // freqs: the=3, sat=2, cat=dog=end=1

  test("rank order (freq desc, token asc), cumsum, and coverage") {
    val r = TextAnalysis.vocabCoverage(docs, "text", k = 3)
      .orderBy("rank")
      .select($"rank", $"token", $"freq", $"cum_freq", $"coverage")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(r.map(x => (x._1, x._2, x._3, x._4)).toSeq == Seq(
      (1L, "the", 3L, 3L),
      (2L, "sat", 2L, 5L),
      (3L, "cat", 1L, 6L)))  // alphabetical among the freq-1 ties
    assert(r.map(_._5).toSeq == Seq(3.0 / 8, 5.0 / 8, 6.0 / 8))
  }

  test("k larger than the vocab returns the whole vocab, coverage 1.0") {
    val r = TextAnalysis.vocabCoverage(docs, "text", k = 100)
      .orderBy(desc("rank")).select("coverage").as[Double].head()
    assert(r == 1.0)
  }
}

class LengthCurriculumSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 20L).map(i =>
    (i, Seq.fill(i.toInt)("w").mkString(" "))).toDF("doc_id", "text")

  test("decile bins: equal sizes, ordered non-overlapping token ranges") {
    val r = TextAnalysis.lengthCurriculum(docs, "doc_id", "text", bins = 10)
      .orderBy("bin")
      .select($"bin", $"n_docs", $"min_tokens", $"max_tokens", $"sum_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.length == 10 && r.forall(_._2 == 2L))
    // bin k holds docs of length 2k-1 and 2k
    r.zipWithIndex.foreach { case ((bin, _, mn, mx, sm), i) =>
      assert(bin == i + 1 && mn == 2L * i + 1 && mx == 2L * i + 2 &&
        sm == mn + mx)
    }
  }

  test("ragged split: larger bins come first (SQL-standard ntile)") {
    val r = TextAnalysis.lengthCurriculum(docs.limit(7), "doc_id", "text",
      bins = 3).orderBy("bin").select("n_docs").as[Long].collect()
    assert(r.toSeq == Seq(3L, 2L, 2L))
  }
}

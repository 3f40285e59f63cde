package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization (Jégou et al. 2011): codebook shape, encode
  * compression, ADC equivalence on losslessly-quantizable data, and
  * refine-step recall on the real embeddings table. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // vectors built FROM a small set of subspace prototypes: every
  // subvector is exactly one of two patterns per subspace, so a
  // k=4 codebook reconstructs the corpus losslessly and ADC equals
  // the exact squared-L2 distance
  private def proto(sub: Int, which: Int): Seq[Double] =
    Seq.tabulate(4)(j => (sub + 1) * 10.0 + which * 5.0 + j)

  private lazy val lossless = (0 until 32).map { i =>
    val v = (0 until 4).flatMap(sub => proto(sub, (i >> sub) & 1))
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("codebook: m×k entries of dim/m-dim centroids") {
    val cb = Similarity.pqTrain(lossless, "vec_id", "embedding", m = 4, k = 4)
    assert(cb.count() == 16)
    assert(cb.select("sub").distinct().count() == 4)
    val dims = cb.select(size($"cvec")).distinct().as[Int].collect()
    assert(dims.sameElements(Array(4)))
  }

  test("encode: m codes per vector, all within [0, k)") {
    val cb = Similarity.pqTrain(lossless, "vec_id", "embedding", m = 4, k = 4)
    val codes = Similarity.pqEncode(lossless, "embedding", cb)
    assert(codes.count() == 32)
    val lens = codes.select(size($"codes")).distinct().as[Int].collect()
    assert(lens.sameElements(Array(4)))
    val range = codes.select(explode($"codes").as("c"))
      .agg(min($"c"), max($"c")).as[(Int, Int)].head()
    assert(range._1 >= 0 && range._2 < 4)
  }

  test("lossless corpus: ADC top-k equals exact L2 top-k") {
    val cb = Similarity.pqTrain(lossless, "vec_id", "embedding",
      m = 4, k = 4, iters = 4)
    val qv = lossless.filter($"vec_id" === 0L)
      .select($"embedding").as[Seq[Double]].head()
    val codes = Similarity.pqEncode(lossless.filter($"vec_id" =!= 0L),
      "embedding", cb).select($"vec_id", $"codes")
    val adc = Similarity.pqTopKAdc(codes, "vec_id", cb, qv, k = 10)
      .select($"vec_id").as[Long].collect().toSeq
    val exact = lossless.filter($"vec_id" =!= 0L).collect()
      .map(r => (r.getLong(0),
        Similarity.l2sqOf(r.getSeq[Double](1), qv)))
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
    assert(adc == exact)
  }

  test("distinct prototypes map to distinct codes (lossless quantization)") {
    val cb = Similarity.pqTrain(lossless, "vec_id", "embedding",
      m = 4, k = 4, iters = 4)
    val codes = Similarity.pqEncode(lossless, "embedding", cb)
    // 32 vectors were built from 2^5? no — 2^4 = 16 distinct
    // prototype combinations over 4 subspaces (i and i+16 coincide);
    // distinct code tuples must match distinct vectors exactly
    val distinctVecs = lossless.select($"embedding").distinct().count()
    val distinctCodes = codes.select($"codes").distinct().count()
    assert(distinctCodes == distinctVecs)
  }

  /** The documented per-subspace algorithm, straight-line in memory:
    * init = k smallest-id subvectors, assign = nearest by L2 with
    * smallest-cid tiebreak, centroid = member mean, empty cell keeps
    * its previous centroid. The independent reference the single-scan
    * joint trainer must reproduce. */
  private def refTrain(vecs: Seq[(Long, Seq[Double])], m: Int, k: Int,
                       iters: Int): Map[(Int, Long), Seq[Double]] = {
    val subDim = vecs.head._2.length / m
    (0 until m).flatMap { sub =>
      val svs = vecs.map { case (id, v) =>
        (id, v.slice(sub * subDim, (sub + 1) * subDim)) }
      var cents: Seq[(Long, Seq[Double])] = svs.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, sv), i) => (i.toLong, sv) }
      for (_ <- 1 to iters) {
        val assigned = svs.map { case (_, sv) =>
          (cents.minBy { case (cid, c) =>
            (Similarity.l2sqOf(sv, c), cid) }._1, sv)
        }
        cents = cents.map { case (cid, old) =>
          val members = assigned.filter(_._1 == cid).map(_._2)
          if (members.isEmpty) (cid, old)
          else (cid, (0 until subDim).map(j =>
            members.map(_(j)).sum / members.size))
        }
      }
      cents.map { case (cid, c) => ((sub, cid), c) }
    }.toMap
  }

  test("joint single-scan training == per-subspace reference, exactly") {
    // lossless corpus values are small integers, so every mean's sum
    // is exact in double and order-free — Spark's distributed avg and
    // the sequential reference agree bit-for-bit
    val cb = Similarity.pqTrain(lossless, "vec_id", "embedding",
      m = 4, k = 4, iters = 3)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2)))
      .toMap
    val ref = refTrain(
      lossless.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq,
      m = 4, k = 4, iters = 3)
    assert(cb == ref)
  }

  /** Integer-grid sequential reference for [[Similarity.pqTrainExact]]:
    * quantize to the 1/scale grid, then per-subspace Lloyd with
    * (dist, cid) tiebreak and the exact half-up mean
    * floor((2s+n)/(2n)) — all BigInt-free because the test values
    * stay far below overflow. */
  private def refTrainExact(vecs: Seq[(Long, Seq[Double])], m: Int, k: Int,
                            iters: Int, scale: Int)
      : Map[(Int, Long), Seq[Long]] = {
    val subDim = vecs.head._2.length / m
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x * scale + 0.5).toLong)) }
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    (0 until m).flatMap { sub =>
      val svs = q.map { case (id, v) =>
        (id, v.slice(sub * subDim, (sub + 1) * subDim)) }
      var cents: Seq[(Long, Seq[Long])] = svs.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, sv), i) => (i.toLong, sv) }
      for (_ <- 1 to iters) {
        val assigned = svs.map { case (_, sv) =>
          (cents.minBy { case (cid, c) => (l2(sv, c), cid) }._1, sv) }
        cents = cents.map { case (cid, old) =>
          val members = assigned.filter(_._1 == cid).map(_._2)
          if (members.isEmpty) (cid, old)
          else (cid, (0 until subDim).map { j =>
            val s = members.map(_(j)).sum; val n = members.size.toLong
            Math.floorDiv(2L * s + n, 2L * n)
          })
        }
      }
      cents.map { case (cid, c) => ((sub, cid), c) }
    }.toMap
  }

  test("grid trainer == per-subspace integer reference, exactly") {
    val cb = Similarity.pqTrainExact(lossless, "vec_id", "embedding",
        m = 4, k = 4, iters = 3, scale = 1000)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Long](2)))
      .toMap
    val ref = refTrainExact(
      lossless.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq,
      m = 4, k = 4, iters = 3, scale = 1000)
    assert(cb == ref)
  }

  test("real embeddings: grid-exact mode recovers the exact top-k head") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = 10
    val got = Similarity.pqTopKExact(emb, "vec_id", "embedding",
      queryId = 0L, m = 8, kCode = 16, k = k, refine = 8)
    val rows = got.collect()
    assert(rows.length == k)
    // served in cos-desc order
    assert(rows.map(_.getDouble(1)).toSeq ==
      rows.map(_.getDouble(1)).sortBy(-_).toSeq)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val exact = Similarity.topKBruteForce(
      emb.filter($"vec_id" =!= 0L), "vec_id", "embedding", qv, k = k)
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    val recall = (rows.map(_.getLong(0)).toSet intersect exact).size.toDouble / k
    info(s"grid-exact PQ refine recall@$k = $recall")
    assert(recall >= 0.5, s"recall@$k was $recall")
  }

  test("real embeddings: refine step recovers the exact top-k head") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = 10
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", queryId = 0L,
      m = 8, kCode = 16, k = k, refine = 8)
      .select($"vec_id").as[Long].collect().toSet
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val exact = Similarity.topKBruteForce(
      emb.filter($"vec_id" =!= 0L), "vec_id", "embedding", qv, k = k)
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    val recall = (pq intersect exact).size.toDouble / k
    info(s"PQ refine recall@$k = $recall")
    assert(recall >= 0.5, s"recall@$k was $recall")
  }
}

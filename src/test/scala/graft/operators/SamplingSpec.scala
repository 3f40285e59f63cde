package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 5000L).toDF("id")

  test("sample rate lands near the requested permille and is deterministic") {
    val n1 = Sampling.samplePermille(ids, "id", 100).count()
    val n2 = Sampling.samplePermille(ids, "id", 100).count()
    assert(n1 == n2) // rerun-stable
    assert(math.abs(n1 - 500.0) / 500.0 < 0.2, s"got $n1, want ~500")
  }

  test("split is disjoint and exhaustive") {
    val (train, test) = Sampling.split(ids, "id", 200)
    assert(train.count() + test.count() == 5000)
    assert(train.join(test, "id").isEmpty)
    // monotone: a smaller holdout is a subset of a larger one
    val (_, smaller) = Sampling.split(ids, "id", 100)
    assert(smaller.join(test, Seq("id"), "left_anti").isEmpty)
  }

  test("stratified rates apply per stratum; unlisted strata drop") {
    val df = ids.withColumn("s", when(col("id") % 3 === 0, "a")
      .when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratified(df, "id", "s", Map("a" -> 1000, "b" -> 0))
    assert(out.filter(col("s") === "a").count() == df.filter(col("s") === "a").count())
    assert(out.filter(col("s") === "b").isEmpty)
    assert(out.filter(col("s") === "c").isEmpty)
  }

  test("upsample: whole factors copy exactly, fractions land near rate") {
    val df = ids.withColumn("s", when(col("id") % 2 === 0, "whole")
      .otherwise("frac"))
    val out = Sampling.upsample(df, "id", "s",
      Map("whole" -> 2000, "frac" -> 2500)).cache()
    // factor 2.0: exactly 2 copies of each doc, epochs 0 and 1
    assert(out.filter(col("s") === "whole").count() == 2 * 2500)
    assert(out.filter(col("s") === "whole").groupBy("id").count()
      .filter(col("count") =!= 2).isEmpty)
    // factor 2.5: every doc 2 or 3 copies, mean near 2.5
    val fracCounts = out.filter(col("s") === "frac").groupBy("id").count()
    assert(fracCounts.filter(col("count") < 2 || col("count") > 3).isEmpty)
    val total = out.filter(col("s") === "frac").count()
    assert(math.abs(total - 2500 * 2.5) / (2500 * 2.5) < 0.1, s"got $total")
    out.unpersist()
  }

  test("upsample: unlisted strata drop; shuffle keys are unique") {
    val df = ids.withColumn("s", lit("unknown"))
    assert(Sampling.upsample(df, "id", "s", Map("x" -> 1000)).isEmpty)
    val up = Sampling.upsample(ids.withColumn("s", lit("x")), "id", "s",
      Map("x" -> 3000))
    assert(up.select("shuffle_key").distinct().count() == up.count())
  }

  test("upsample is invariant under repartitioning") {
    val df = ids.withColumn("s", lit("x"))
    val a = Sampling.upsample(df, "id", "s", Map("x" -> 1700))
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.upsample(df.repartition(13), "id", "s", Map("x" -> 1700))
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("temperatureMix: α=0.5 flattens toward √n targets, α=1 is identity") {
    import spark.implicits._
    // 400-doc big group vs 100-doc small group; ids disjoint
    val docs = ((0L until 400L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, "doc_id", "source")
    val byGroup = out.groupBy("source")
      .agg(count(lit(1)).as("kept"),
        first("n_group").as("n"), first("target").as("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // targets: big = √(400·400) = 400 (kept in full, one copy each);
    // small = ⌊√(100·400)+0.5⌋ = 200 (two copies each, rem 0)
    assert(byGroup("big") == ((400L, 400L, 400L)))
    assert(byGroup("small") == ((200L, 100L, 200L)))
    // copy indices are dense 0-based per doc
    assert(out.filter($"source" === "small").groupBy("doc_id").count()
      .filter($"count" =!= 2L).count() == 0)

    // α = 1: every group's target = its size -> exactly one copy per doc
    val id = Sampling.temperatureMix(docs, "doc_id", "source", alpha = 1.0)
    assert(id.count() == 500)
    assert(id.select(max($"copy")).as[Long].head() == 0L)
  }

  test("temperatureMix: fractional targets realized by deterministic coins") {
    import spark.implicits._
    // sizes chosen so the small group's target is NOT a multiple of n:
    // n=7, nmax=50 -> t = ⌊√350+0.5⌋ = 19 = 2·7 + 5 -> each doc gets 2
    // copies, ~5 docs a third
    val docs = ((0L until 50L).map(i => (i, "big")) ++
      (200L until 207L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, "doc_id", "source")
    val small = out.filter($"source" === "small")
    val copies = small.groupBy("doc_id").count()
      .select($"count").as[Long].collect()
    assert(copies.forall(c => c == 2L || c == 3L))
    // deterministic: same input -> identical output, any partitioning
    val again = Sampling.temperatureMix(docs.repartition(7), "doc_id", "source")
      .select("source", "doc_id", "copy").orderBy("doc_id", "copy")
      .collect().toSeq
    assert(again == out.select("source", "doc_id", "copy")
      .orderBy("doc_id", "copy").collect().toSeq)
  }

  test("dsirWeights: target-like docs outweigh off-distribution docs") {
    import spark.implicits._
    // target speaks about cats; raw has one cat doc and one finance doc
    val target = (0L until 8L)
      .map(i => (100L + i, "the cat sat on the mat and the cat purred"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "quarterly revenue guidance exceeded analyst expectations")
    ).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .select($"doc_id", $"n_feats", $"avg_lw_q")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // n_feats = unigrams + bigrams = 2·len − 1
    assert(w(1L)._1 == 11L && w(2L)._1 == 11L)
    assert(w(1L)._2 > w(2L)._2,
      s"target-like doc must outweigh the off-distribution one: $w")
    // and selection surfaces the target-like doc first
    val sel = Sampling.dsirSelect(raw, target, "doc_id", "text", k = 1)
      .select($"doc_id").as[Long].head()
    assert(sel == 1L)
  }

  test("dsirWeights: empty docs keep their row with zeros; partitioning-invariant") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(w.length == 3)
    assert(w(1).getLong(1) == 0L && w(1).getLong(2) == 0L && w(1).getDouble(3) == 0.0)
    assert(w(2).getLong(1) == 0L)
    val again = Sampling.dsirWeights(raw.repartition(5), target, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(again == w)
  }

  test("strideSchedule: every prefix holds sources within one of weight share") {
    val docs = (1L to 300L).map(i => (i, if (i % 4 == 0L) "b" else "a"))
      .toDF("doc_id", "source")
    // a:w=3, b:w=1 → any prefix of n should hold ~3n/4 a's (±1 item)
    val sched = Sampling.strideSchedule(docs, "source", "doc_id",
        when(col("source") === "a", 3L).otherwise(1L), k = 100)
      .orderBy(col("pos")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    sched.indices.foreach { i =>
      val n = i + 1
      val as = sched.take(n).count(_._2 == "a")
      val want = 3.0 * n / 4.0
      assert(math.abs(as - want) <= 1.0 + 1e-9,
        s"prefix $n: $as a's, expected ~$want")
    }
    // deterministic under repartition
    val again = Sampling.strideSchedule(docs.repartition(7), "source",
        "doc_id", when(col("source") === "a", 3L).otherwise(1L), k = 100)
      .orderBy(col("pos")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sched.sameElements(again))
  }

  test("hamiltonAllocate sums exactly to target; shares within one of quota") {
    val docs = (1L to 500L)
      .map(i => (i, s"s${i % 7}")).toDF("doc_id", "source")
    val alloc = Sampling.hamiltonAllocate(docs, "source", target = 137L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(alloc.map(_._3).sum == 137L)
    alloc.foreach { case (k, n, a) =>
      val quota = 137.0 * n / 500.0
      assert(a == math.floor(quota).toLong || a == math.ceil(quota).toLong,
        s"$k: alloc $a vs quota $quota")
    }
    // applied: exactly target rows, each stratum at its allocation
    val picked = Sampling.stratifiedExact(docs, "source", "doc_id", 137L)
    assert(picked.count() == 137L)
    val perKey = picked.groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    alloc.foreach { case (k, _, a) => assert(perKey.getOrElse(k, 0L) == a) }
  }

  test("deterministicShuffle: a permutation, hash-ordered, seed-sensitive, partition-stable") {
    val out = Sampling.deterministicShuffle(ids, "id", seed = 7L)
      .as[(Long, String, Long)].collect()
    // ranks are exactly 1..n and rank order IS (h, id) order
    assert(out.map(_._3).sorted.toSeq == (1L to 5000L).toSeq)
    val byRank = out.sortBy(_._3)
    assert(byRank.map(r => (r._2, r._1)).toSeq ==
      byRank.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    // reference hash: the engine-portable md5 contract
    val h17 = out.find(_._1 == 17L).get._2
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("7:17".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h17 == md)
    // genuinely shuffled (the base-31 fold was ORDER-PRESERVING on
    // decimal ids — the identity permutation; md5 must not be) and a
    // different seed is a different permutation
    assert(byRank.map(_._1).toSeq != (1L to 5000L).toSeq)
    val other = Sampling.deterministicShuffle(ids, "id", seed = 8L)
      .as[(Long, String, Long)].collect().sortBy(_._3).map(_._1).toSeq
    assert(other != byRank.map(_._1).toSeq)
    // stable under repartitioning
    val rep = Sampling.deterministicShuffle(ids.repartition(13), "id", 7L)
      .as[(Long, String, Long)].collect().toSet
    assert(rep == out.toSet)
  }

  test("tokenBudgetPerGroup: the exact per-group priority-prefix") {
    val docs = (1L to 120L).map { i =>
      (i, Seq.fill((i % 13 + 1).toInt)("w").mkString(" "),
        s"src${i % 4}", (i * 29L) % 120L)
    }.toDF("doc_id", "text", "source", "p")
    val budget = 60L
    val got = Sampling.tokenBudgetPerGroup(docs, "doc_id", "text",
        "source", col("p"), budget)
      .as[(Long, String, Long, Long)].collect().toSet
    val ref = (1L to 120L).map(i =>
        (i, s"src${i % 4}", i % 13 + 1, (i * 29L) % 120L))
      .groupBy(_._2).flatMap { case (src, rs) =>
        rs.sortBy { case (id, _, _, p) => (-p, id) }
          .scanLeft((0L, src, 0L, 0L)) { case ((_, _, _, cum), (id, s2, n, _)) =>
            (id, s2, n, cum + n) }
          .drop(1).takeWhile(_._4 <= budget)
      }.toSet
    assert(got == ref && got.nonEmpty)
    // every group respects its own budget
    assert(got.groupBy(_._2).values.forall(_.map(_._4).max <= budget))
  }

  test("tokenBudgetSelect: the exact priority-prefix within budget") {
    val docs = (1L to 200L).map { i =>
      // token count i, priority p = (i * 37) % 200 — order decoupled
      (i, Seq.fill(i.toInt)("w").mkString(" "), (i * 37L) % 200L)
    }.toDF("doc_id", "text", "p")
    val budget = 3000L
    val got = Sampling.tokenBudgetSelect(docs, "doc_id", "text",
        col("p"), budget)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // sequential reference: sort by (p desc, id), keep while <= budget
    val ref = (1L to 200L).map(i => (i, i, (i * 37L) % 200L))
      .sortBy { case (id, _, p) => (-p, id) }
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n, _)) =>
        (id, n, cum + n) }
      .drop(1).takeWhile(_._3 <= budget)
    assert(got.toSeq == ref.toSeq)
    assert(got.last._3 <= budget && got.nonEmpty)
    // partition-stable
    val rep = Sampling.tokenBudgetSelect(docs.repartition(7), "doc_id",
        "text", col("p"), budget)
      .as[(Long, Long, Long)].collect().toSet
    assert(rep == got.toSet)
  }
}

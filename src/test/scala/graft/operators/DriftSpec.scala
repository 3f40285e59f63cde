package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PSI/JSD drift: identical slices report zero, brute-force
  * recomputation on randomized bins matches, and the JSD total
  * respects its ln 2 bound (hit asymptotically by disjoint slices). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private def bruteDrift(a: Seq[Long], b: Seq[Long])
      : Map[Long, (Long, Long, Long, Long)] = {
    val bins = (a ++ b).distinct
    val (aCnt, bCnt) = (a.groupBy(identity).view.mapValues(_.size.toLong).toMap,
      b.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val k = bins.size.toLong
    val (aTot, bTot) = (a.size.toLong, b.size.toLong)
    bins.map { bin =>
      val (an, bn) = (aCnt.getOrElse(bin, 0L), bCnt.getOrElse(bin, 0L))
      val p = (an + 1).toDouble / (aTot + k)
      val q = (bn + 1).toDouble / (bTot + k)
      val m = (p + q) / 2.0
      val psi = (p - q) * math.log(p / q)
      val jsd = (p * math.log(p / m) + q * math.log(q / m)) / 2.0
      bin -> ((an, bn, micro(psi), micro(jsd)))
    }.toMap
  }

  private def run(a: Seq[Long], b: Seq[Long]): Map[Long, (Long, Long, Long, Long)] =
    Drift.binnedDrift(a.toDF("bin"), b.toDF("bin"), "bin")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("identical slices drift zero in every bin") {
    val xs = Seq(0L, 0L, 1L, 1L, 1L, 2L, 3L, 3L)
    val got = run(xs, xs)
    assert(got.values.forall { case (_, _, psi, jsd) => psi == 0L && jsd == 0L })
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("randomized slices == brute force (3 seeds)") {
    for (seed <- Seq(3L, 59L, 1013L)) {
      val a = (0 until 800).map(i => math.abs((i * 2654435761L + seed) % 12))
      val b = (0 until 650).map(i => math.abs((i * 40503L + seed * 13L) % 15))
      assert(run(a, b) == bruteDrift(a, b), s"seed $seed")
    }
  }

  test("empty-on-one-side bins are smoothed, not infinite") {
    val got = run(Seq(0L, 0L, 0L), Seq(5L, 5L))
    assert(got.keySet == Set(0L, 5L))
    assert(got.values.forall { case (_, _, psi, jsd) =>
      psi >= 0L && jsd >= 0L && psi < Long.MaxValue })
  }

  test("single-scan slicedDrift == two-frame binnedDrift (3 seeds)") {
    for (seed <- Seq(2L, 64L, 555L)) {
      val rows = (0 until 900).map { i =>
        (math.abs((i * 2654435761L + seed) % 10), i % 3 == 0)
      }
      val df = rows.toDF("bin", "is_ref")
      val one = Drift.slicedDrift(df, "bin", col("is_ref"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val two = Drift.binnedDrift(df.filter(col("is_ref")),
          df.filter(!col("is_ref")), "bin")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(one == two, s"seed $seed")
    }
  }

  test("keyedDrift == independent per-key drift (randomized, 3 seeds)") {
    for (seed <- Seq(17L, 271L, 606L)) {
      val rows = (0 until 1200).map { i =>
        val key = s"k${math.abs((i * 48271L + seed) % 4)}"
        val bin = math.abs((i * 2654435761L + seed) % 9)
        (key, bin, i % 3 != 0)
      }
      val got = Drift.keyedDrift(rows.toDF("key", "bin", "is_ref"),
          "key", "bin", col("is_ref"))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val a = rs.filter(_._3).map(_._2)
        val b = rs.filterNot(_._3).map(_._2)
        val per = bruteDrift(a, b)
        k -> ((per.size.toLong, a.size.toLong, b.size.toLong,
          per.values.map(_._3).sum, per.values.map(_._4).sum))
      }
      assert(got == want, s"seed $seed")
    }
  }

  private def bruteChi(rows: Seq[(String, String)])
      : (Long, Long, Long, Long, Long, Long) = {
    val n = rows.size.toLong
    val rs = rows.map(_._1).distinct.sorted
    val cs = rows.map(_._2).distinct.sorted
    val chi = (for (a <- rs; b <- cs) yield {
      val o = rows.count(r => r._1 == a && r._2 == b).toLong
      val rn = rows.count(_._1 == a).toLong
      val cn = rows.count(_._2 == b).toLong
      val dev = (o * n - rn * cn).toDouble
      micro(dev * dev / (n.toDouble * rn * cn))
    }).sum
    val dof = (rs.size - 1L) * (cs.size - 1L)
    val minDim = math.min(rs.size - 1L, cs.size - 1L)
    val v = if (minDim == 0) 0L
      else micro(math.sqrt((chi.toDouble / 1e6) / (n.toDouble * minDim)))
    (n, rs.size.toLong, cs.size.toLong, dof, chi, v)
  }

  test("chi-square == brute force over the full grid (randomized, 3 seeds)") {
    for (seed <- Seq(23L, 190L, 777L)) {
      val rows = (0 until 700).map { i =>
        (s"a${math.abs((i * 48271L + seed) % 4)}",
         s"b${math.abs((i * 2654435761L + seed * 3L) % 3)}")
      }
      val got = Drift.chiSquare(rows.toDF("x", "y"), "x", "y")
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
      assert(got == bruteChi(rows), s"seed $seed")
    }
  }

  test("chi-square: independent table scores ~0; zero cells contribute E") {
    // perfectly proportional 2x2 → every deviation is exactly 0
    val indep = Seq.fill(40)(("x", "p")) ++ Seq.fill(60)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val got = Drift.chiSquare(indep.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((150L, 2L, 2L, 1L, 0L, 0L)))
    // a never-observed cell still contributes its expectation
    val sparse = Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))
    val got2 = Drift.chiSquare(sparse.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got2 == bruteChi(sparse))
    assert(got2._5 == 20000000L) // fully dependent 2x2: chi2 = n
    assert(got2._6 == 1000000L)  // Cramér's V = 1
  }

  private def bruteEmbDrift(rows: Seq[(Seq[Float], Boolean)])
      : (Long, Long, Long, Long, Long) = {
    val dims = rows.head._1.length
    def q(x: Float): Long = math.floor(x.toDouble * 1000.0 + 0.5).toLong
    val sa = (0 until dims).map(d =>
      rows.filter(_._2).map(r => q(r._1(d))).sum)
    val sb = (0 until dims).map(d =>
      rows.filterNot(_._2).map(r => q(r._1(d))).sum)
    val dot = sa.zip(sb).map { case (a, b) => a * b }.sum
    val na2 = sa.map(a => a * a).sum
    val nb2 = sb.map(b => b * b).sum
    val (na, nb) = (math.sqrt(na2.toDouble), math.sqrt(nb2.toDouble))
    val nA = rows.count(_._2).toLong
    val nB = rows.size - nA
    (dims.toLong, nA, nB, micro(dot.toDouble / (na * nb)),
      micro(na * nB / (nb * nA)))
  }

  test("embedding drift == brute force; identical slices score cos 1") {
    def vec(seed: Long): Seq[Float] = (0 until 8).map(d =>
      (math.abs((seed * 31L + d * 2654435761L) % 2000) - 1000) / 1000.0f)
    for (seed <- Seq(29L, 450L)) {
      val rows = (0L until 200L).map(i => (vec(i * 7L + seed), i % 3 == 0))
      val got = Drift.embeddingDrift(
          rows.toDF("embedding", "r"), "embedding", col("r"))
        .as[(Long, Long, Long, Long, Long)].collect().head
      assert(got == bruteEmbDrift(rows), s"seed $seed")
    }
    // mirrored slices: identical means → cos = 1, ratio = 1
    val base = (0L until 50L).map(i => vec(i))
    val mirrored = base.map(v => (v, true)) ++ base.map(v => (v, false))
    val got = Drift.embeddingDrift(
        mirrored.toDF("embedding", "r"), "embedding", col("r"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((8L, 50L, 50L, 1000000L, 1000000L)))
  }

  test("embedding drift: disjoint axes score cos 0; norm ratio exact") {
    val a = Seq.fill(10)((Seq(1.0f, 0.0f), true))
    val b = Seq.fill(10)((Seq(0.0f, 2.0f), false))
    val got = Drift.embeddingDrift(
        (a ++ b).toDF("embedding", "r"), "embedding", col("r"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((2L, 10L, 10L, 0L, 500000L)))
  }

  test("JSD total is bounded by ln 2; disjoint heavy slices approach it") {
    val a = Seq.fill(5000)(1L)
    val b = Seq.fill(5000)(2L)
    val total = run(a, b).values.map(_._4).sum
    assert(total <= micro(math.log(2.0)))
    assert(total > micro(math.log(2.0) * 0.99)) // smoothing costs a hair
  }
}

package graft.operators

import graft.SparkSpec

/** Hampel/MAD outliers: brute-force equivalence on randomized groups
  * and the robustness property the mean/σ test lacks. */
class MadOutlierSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)])
      : Set[(String, Long, Long, Long, Long, Long)] =
    Profile.madOutliers(rows.toDF("source", "doc_id", "n_chars"),
        "source", "doc_id", "n_chars")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  private def med2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length
    s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
  }

  private def brute(rows: Seq[(String, Long, Long)])
      : Set[(String, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val m2 = med2(rs.map(_._3))
      val devs = rs.map(r => (r, math.abs(2 * r._3 - m2)))
      val m4 = med2(devs.map(_._2))
      devs.collect { case ((_, id, v), d) if 2 * d > 3 * m4 =>
        (g, id, v, m2, d, m4)
      }
    }.toSet

  test("randomized groups == brute force (3 seeds)") {
    for (seed <- Seq(61L, 245L, 9999L)) {
      val rows = (0L until 400L).map { i =>
        val g = s"s${math.abs((i * 48271L + seed) % 4)}"
        val v = 100L + math.abs((i * 2654435761L + seed) % 50) +
          (if (i % 37 == 0) 5000L else 0L) // planted monsters
        (g, i, v)
      }
      assert(run(rows) == brute(rows), s"seed $seed")
    }
  }

  test("the monster masks a moderate outlier from mean/σ, not from MAD") {
    // base spread 91..110 (MAD = 5), one moderate outlier, one monster
    val base = (1L to 20L).map(i => 90L + i)
    val vals = base ++ Seq(5000L, 100000L)
    val rows = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
    val got = run(rows)
    assert(got.map(_._2) == Set(20L, 21L)) // both outliers, nothing else
    // the classic mean+3σ test: the monster inflates σ until the
    // moderate outlier disappears
    val mean = vals.sum.toDouble / vals.size
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.size)
    assert(5000L < mean + 3 * sd)    // mean/σ stays silent on 5000
    assert(100000L > mean + 3 * sd)  // only the monster would flag
  }

  test("tight groups flag nothing; odd/even medians both exact") {
    val odd = (1L to 5L).map(i => ("o", i, 100L + i)) // med2 = 206
    val even = (1L to 4L).map(i => ("e", i, 100L + i)) // med2 = 205
    assert(run(odd ++ even).isEmpty)
  }
}

package graft.operators

import graft.SparkSpec

/** Pins [[Boundaries.autoPermille]]'s exact integer behavior — the
  * formula is REPLAYED verbatim inside the x25/x30/x31 oracle SQL
  * (`LEAST(500, GREATEST(1, (1000*65536 + n - 1) // n))`), so any
  * drift here silently breaks hash parity at scale. */
class BoundariesSpec extends SparkSpec {

  test("autoPermille: cap region, scaled region, floor, monotonicity") {
    // degenerate / small corpora keep the dense cap
    assert(Boundaries.autoPermille(0L) == 500)
    assert(Boundaries.autoPermille(1L) == 500)
    assert(Boundaries.autoPermille(100000L) == 500)
    // the cap boundary: 1000*65536/n >= 500 up to n = 131072 exactly
    assert(Boundaries.autoPermille(131072L) == 500)
    assert(Boundaries.autoPermille(131073L) == 500) // ceil(499.996) = 500
    assert(Boundaries.autoPermille(140000L) == 469)
    // the sf10 measurement point (SCALING.md round 12)
    assert(Boundaries.autoPermille(500000L) == 132)
    // the 1-permille floor holds at any corpus
    assert(Boundaries.autoPermille(32768000L) == 2)
    assert(Boundaries.autoPermille(65536000L) == 1) // exactly target*1000
    assert(Boundaries.autoPermille(65537000L) == 1)
    assert(Boundaries.autoPermille(Long.MaxValue / 2000L) == 1)
    // non-increasing in n; target sample size within one bucket's worth
    var prev = 1001
    var n = 1L
    while (n < 10000000L) {
      val pm = Boundaries.autoPermille(n)
      assert(pm >= 1 && pm <= 500 && pm <= prev, s"n=$n pm=$pm prev=$prev")
      // ceil semantics: pm-1 would undershoot the target sample
      if (pm < 500)
        assert((pm - 1).toLong * n < 1000L * 65536L, s"n=$n pm=$pm not minimal")
      prev = pm
      n = n * 3 + 1
    }
  }

  test("effectivePermille: Auto resolves by count, explicit passes through") {
    val df = spark.range(200).toDF("id")
    assert(Boundaries.effectivePermille(df, 250) == 250)
    assert(Boundaries.effectivePermille(df, Boundaries.Auto) == 500)
  }
}

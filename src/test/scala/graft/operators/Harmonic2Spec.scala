package graft.operators

import graft.SparkSpec

/** Radius-2 harmonic centrality: brute-force BFS equivalence on
  * randomized graphs and hand-checked shapes (path, star, triangle). */
class Harmonic2Spec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Graph.harmonic2(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def brute(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    nbrs.map { case (v, n1) =>
      val n1v = n1 - v
      val n2 = n1v.flatMap(nbrs(_)) -- n1v - v
      v -> ((n1v.size.toLong, n2.size.toLong,
        2L * n1v.size + n2.size))
    }
  }

  test("randomized graphs == brute-force BFS (3 seeds)") {
    for (seed <- Seq(53L, 808L, 4141L)) {
      val pairs = (0 until 150).map { i =>
        val a = math.abs((i * 2654435761L + seed) % 30)
        val b = math.abs((i * 48271L + seed * 13L) % 30)
        (math.min(a, b), math.max(a, b) + 1)
      }.distinct
      assert(run(pairs) == brute(pairs), s"seed $seed")
    }
  }

  test("path, star and triangle score the textbook values") {
    // path 1-2-3-4-5: ends see 1 direct + 1 two-hop
    val path = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(path(1L) == ((1L, 1L, 3L)))
    assert(path(3L) == ((2L, 2L, 6L))) // middle sees everyone
    // star: hub sees all leaves directly; leaves see hub + others at 2
    val star = run(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(star(0L) == ((4L, 0L, 8L)))
    assert(star(1L) == ((1L, 3L, 5L)))
    // triangle: everyone adjacent, no 2-hop-only nodes
    val tri = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(tri.values.toSet == Set((2L, 0L, 4L)))
  }
}

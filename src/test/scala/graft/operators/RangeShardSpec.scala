package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Range-sharded export: range-disjointness, global order of the
  * sorted plan, boundary-tie determinism, plan shape (no
  * RangePartitioning), and rough balance on real data. */
class RangeShardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("shards are range-disjoint on the sort column") {
    val out = Export.rangeSharded(docs, "n_chars", numShards = 8)
      .select($"shard", $"n_chars").as[(Long, Long)].collect()
    val byShard = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val shards = byShard.keys.toSeq.sorted
    shards.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byShard(a).max <= byShard(b).min,
          s"shard $a max ${byShard(a).max} > shard $b min ${byShard(b).min}")
      case _ =>
    }
    assert(shards.head == 1L && shards.size >= 2)
  }

  test("sorted plan yields a globally ordered stream") {
    val parts = Export.rangeShardedSorted(docs, "n_chars", numShards = 4)
      .select($"shard", $"n_chars")
      .as[(Long, Long)]
      .mapPartitions(it => Iterator.single(it.toSeq))
      .collect()
      .filter(_.nonEmpty)
    // within every partition the (shard, value) stream is sorted…
    parts.foreach { part =>
      assert(part == part.sortBy(identity), "partition not sorted")
    }
    // …each shard lives wholly in ONE partition (hash collisions may
    // pack several shards per partition, never split one)…
    val shardSets = parts.map(_.map(_._1).toSet).toSeq
    shardSets.combinations(2).foreach {
      case Seq(a, b) => assert((a & b).isEmpty, s"shards split: $a vs $b")
      case _ =>
    }
    // …so every shard's rows are contiguous and sorted in its file,
    // and reading the shard DIRECTORIES in shard order (what
    // partitionBy writes) is a global sort.
    val byShard = parts.flatten.groupBy(_._1)
    val concat = byShard.keys.toSeq.sorted
      .flatMap(s => byShard(s).map(_._2)).toSeq
    val expected = docs.select($"n_chars").as[Long].collect().sorted.toSeq
    assert(concat == expected)
  }

  test("assignment is a pure function of the value (ties co-locate)") {
    val out = Export.rangeSharded(docs, "n_chars", numShards = 8)
      .select($"n_chars", $"shard").as[(Long, Long)].collect()
    val m = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    m.foreach { case (v, ss) =>
      assert(ss.size == 1, s"value $v split across shards $ss")
    }
  }

  test("plan: no RangePartitioning exchange, no window") {
    val plan = Export.rangeSharded(docs, "n_chars", numShards = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), s"global sort in:\n$plan")
    assert(!plan.contains("Window"), "no window expected")
  }

  test("populations are sketch-balanced on real data") {
    val pops = Export.rangeSharded(docs, "n_chars", numShards = 4)
      .groupBy($"shard").count().select($"count").as[Long].collect()
    val (mn, mx) = (pops.min, pops.max)
    assert(pops.length == 4 && mn > 0)
    assert(mx.toDouble / mn < 4.0, s"pops ${pops.mkString(",")}")
  }

  test("sampled variant: range-disjoint, partition-stable, full-sample == exact ranks") {
    val out = Export.rangeShardedSampled(docs, "doc_id", "n_chars",
        numShards = 8, permille = 500)
      .select($"shard", $"n_chars").as[(Long, Long)].collect()
    val byShard = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byShard.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(byShard(a).max <= byShard(b).min)
      case _ =>
    }
    // deterministic under repartitioning (the property GK cannot offer)
    val rep = Export.rangeShardedSampled(docs.repartition(13), "doc_id",
        "n_chars", numShards = 8, permille = 500)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toSet
    val base = Export.rangeShardedSampled(docs, "doc_id", "n_chars",
        numShards = 8, permille = 500)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toSet
    assert(rep == base)
    // permille=1000 (full sample): boundaries are the EXACT corpus
    // order statistics — check against a sequential reference
    val full = Export.rangeShardedSampled(docs, "doc_id", "n_chars",
        numShards = 4, permille = 1000)
      .select($"n_chars", $"shard").as[(Long, Long)].collect()
    val vals = docs.select($"n_chars").as[Long].collect().sorted
    val n = vals.length.toLong
    val bs = (1 until 4).map(i => vals(((i * n + 3) / 4).toInt - 1))
    full.foreach { case (v, s) =>
      assert(s == 1L + bs.count(v > _), s"v=$v shard=$s bs=$bs")
    }
  }
}

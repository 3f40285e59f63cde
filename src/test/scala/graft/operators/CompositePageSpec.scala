package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Composite-agg keyset pagination: walking the cursor enumerates
  * every bucket exactly once in composite order (the partition
  * property OFFSET paging only has under a frozen snapshot), each
  * page matches the brute-force slice, and the tail page is short. */
class CompositePageSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = (for {
    t <- Seq("click", "error", "view")
    h <- 0 until 17
  } yield (t, f"2024-01-01 $h%02d", (t.length * 100 + h).toLong))
    .toDF("event_type", "hour", "n")

  private def sortedAll: Seq[(String, String, Long)] =
    buckets.as[(String, String, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  private def page(after: Option[(String, String)], size: Int) =
    Monitoring.compositePage(buckets, Seq("event_type", "hour"),
        after.map(a => Seq(a._1, a._2)), size)
      .as[(String, String, Long)].collect().toSeq

  test("walking after-cursors enumerates all buckets exactly once, in order") {
    val size = 7
    var cursor: Option[(String, String)] = None
    var walked = Seq.empty[(String, String, Long)]
    var done = false
    while (!done) {
      val p = page(cursor, size)
      assert(p.size <= size)
      walked ++= p
      if (p.size < size) done = true
      else cursor = Some((p.last._1, p.last._2))
    }
    assert(walked == sortedAll)          // complete, ordered, no repeats
    assert(walked.size == 51)
  }

  test("each page equals the brute-force slice after the cursor") {
    val all = sortedAll
    for (i <- Seq(0, 10, 30, 49)) {
      val cursor = Some((all(i)._1, all(i)._2))
      assert(page(cursor, 5) == all.drop(i + 1).take(5), s"cursor at $i")
    }
  }

  test("no cursor returns the head page; far cursor returns empty") {
    assert(page(None, 10) == sortedAll.take(10))
    assert(page(Some(("zzz", "9999")), 10).isEmpty)
  }

  test("cursor arity mismatch is rejected") {
    intercept[IllegalArgumentException] {
      Monitoring.compositePage(buckets, Seq("event_type", "hour"),
        Some(Seq("click")), 5)
    }
  }
}

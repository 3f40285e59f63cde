package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * The reference's query surface has only equi-lookups; an analytics
  * engine needs the range family too (time-window attribution, IP→geo
  * lookup, genomic overlap, slot accounting). Spark's built-in answer
  * to `p BETWEEN s AND e` with no equi-key is BroadcastNestedLoopJoin
  * — O(points × intervals) compares and a broadcast of one whole side,
  * both disqualifying at corpus scale.
  *
  * The standard scale recipe is BINNING (the "grid join" of the
  * genomics/GIS literature, e.g. BEDTools' binning scheme after
  * Kent 2002's UCSC browser bins): pick a bin width `w` on the join
  * domain, have every interval emit one row per bin it touches, have
  * every point emit its single containing bin, equi-join on the bin
  * id, then apply the exact `BETWEEN` as a post-filter. Each
  * (point, interval) match shares exactly ONE bin — the point's own —
  * so the join produces no duplicates by construction (no dedup
  * shuffle afterwards).
  *
  * The domain is `Long` BY DESIGN: callers map their type onto
  * integers once (epoch days for dates — the q95 instance, epoch
  * seconds/nanos for timestamps, numeric IPv4 for CIDR lookup), and
  * every comparison is integer-exact in any engine.
  *
  * Scale shape: ONE hash shuffle of each side on the bin id.
  * Points cross once; intervals cross `span/w + 1` times — `w` is the
  * classic knob between interval replication (small w) and bin
  * population skew (big w): set it near the TYPICAL interval span, and
  * cap pathological intervals upstream if the span distribution has a
  * heavy tail (same cap-and-document trade as the LSH `maxBucket`).
  * `binWidth` must be a POWER OF TWO (the UCSC-bin convention): the
  * bin id is then one arithmetic right-shift — true floor division,
  * so negative domains bin correctly (a `div`-style truncation toward
  * zero would split bin −1 in half), exact at any long magnitude (no
  * double arithmetic, no 2^53 ceiling), and free in codegen.
  */
object RangeJoin {

  /** Exact floor(x / 2^k) on longs via arithmetic shift (object doc). */
  private def binOf(c: Column, k: Int): Column = shiftright(c, k)

  /** Inner-join `points` rows to every `intervals` row whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. All three
    * columns must be integral; output carries every column of both
    * inputs (names must be disjoint). Intervals with `end < start`
    * match nothing (BETWEEN semantics) and are dropped before
    * replication. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long = 8L): DataFrame = {
    require(binWidth >= 1L && java.lang.Long.bitCount(binWidth) == 1,
      s"binWidth must be a power of two (got $binWidth)")
    val k = java.lang.Long.numberOfTrailingZeros(binWidth)
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint (shared: $dup)")
    val p = col(pointCol).cast("long")
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val iv = intervals.filter(s <= e)
      .withColumn("__bin", explode(sequence(binOf(s, k), binOf(e, k))))
    val pt = points.withColumn("__bin", binOf(p, k))
    pt.join(iv, "__bin")
      .filter(p.between(s, e))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join on the same binned-equi-join plan:
    * inner-join each `left` row to every `right` row whose
    * `[rStart, rEnd]` intersects `[lStart, lEnd]` (inclusive on both
    * ends — the BEDTools/IEJoin `ls <= re AND rs <= le` contract).
    *
    * Unlike the point case, an overlapping pair can share MANY bins,
    * so a naive bin join emits duplicates. The standard fix (Kent
    * 2002's browser uses the same idea) is an OWNER-BIN rule instead
    * of a distinct: a pair is reported only in the bin containing
    * `max(lStart, rStart)` — the overlap's left edge, which lies in
    * BOTH intervals whenever they intersect, so exactly one joined row
    * survives per pair and no dedup shuffle exists in the plan. The
    * rule is a codegen'd integer post-filter on the already-joined row.
    *
    * Scale shape: identical to `pointInInterval` with both sides
    * replicated `span/w + 1` times — `binWidth` sits between the two
    * TYPICAL span distributions; cap heavy-tailed spans upstream.
    * Output cardinality is the true overlap count (inherent to the
    * query, not an artifact of the plan). Empty intervals
    * (`end < start`) match nothing and are dropped pre-replication. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long = 8L): DataFrame = {
    require(binWidth >= 1L && java.lang.Long.bitCount(binWidth) == 1,
      s"binWidth must be a power of two (got $binWidth)")
    val k = java.lang.Long.numberOfTrailingZeros(binWidth)
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint (shared: $dup)")
    val ls = col(lStart).cast("long"); val le = col(lEnd).cast("long")
    val rs = col(rStart).cast("long"); val re = col(rEnd).cast("long")
    val l = left.filter(ls <= le)
      .withColumn("__bin", explode(sequence(binOf(ls, k), binOf(le, k))))
    val r = right.filter(rs <= re)
      .withColumn("__bin", explode(sequence(binOf(rs, k), binOf(re, k))))
    l.join(r, "__bin")
      .filter(ls <= re && rs <= le &&
        col("__bin") === binOf(greatest(ls, rs), k))
      .drop("__bin")
  }
}

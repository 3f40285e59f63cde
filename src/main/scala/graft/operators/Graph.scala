package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph centrality over document-similarity graphs.
  *
  * Motivation (corpus curation): ranking nodes of a similarity /
  * citation / link graph is a standard data-curation signal — Common
  * Crawl publishes harmonic-centrality and PageRank host rankings that
  * pretraining pipelines use to prioritize crawl frontiers and weight
  * sources, and graph centrality over a near-dup similarity graph
  * picks representative documents out of redundant clusters (the
  * cluster-keeper idea q69/x24 apply with quality scores, re-expressed
  * as link analysis). The reference app has no graph operator — this
  * extends the engine's curation toolbox the same way the dedup/ANN
  * families do (Page, Brin, Motwani, Winograd 1999; Boldi, Vigna 2014).
  *
  * FIXED-POINT ARITHMETIC, not floating point: ranks are maintained in
  * integer micro-units (`scale` = 1e6 per node at start). Floating-
  * point PageRank sums contributions in a nondeterministic order under
  * a distributed shuffle, so no two runs (let alone two engines) hash
  * the same bits; with longs, addition is exact and commutative, so
  * the result is bit-identical across partitionings AND exactly
  * replayable in the DuckDB oracle with `//` floor division. The cost
  * is a deterministic rounding floor per (edge, iteration) — bounded
  * by outdeg/scale relative error per hop, irrelevant for ranking.
  *
  * Semantics (pseudo-PageRank, the common non-normalized variant):
  *   r_0(v)   = scale
  *   c_i(u)   = r_i(u) div outdeg(u)              (floor division)
  *   r_{i+1}(v) = (scale - (dampNum·scale) div dampDen)
  *              + (dampNum · Σ_{u→v} c_i(u)) div dampDen
  * Dangling nodes cannot occur in a symmetrized similarity graph
  * (every node has outdeg ≥ 1 by construction); for general edge
  * lists, dangling mass is DROPPED (documented pseudo-PageRank), not
  * redistributed.
  *
  * Scale shape: `outdeg` is joined into the edge list ONCE and the
  * result persisted — each iteration is then one join of the rank
  * table against the edge table on `src` (shuffle on src) plus one
  * aggregation keyed by `dst` (shuffle on dst): 2 shuffles × iters,
  * each bounded by |E|, never all-pairs. Per-iteration rank tables are
  * localCheckpoint'ed (lineage truncation — the connectedComponents /
  * SuffixArray discipline) and round k−1 is unpersisted (blocking) as
  * soon as round k lands, so at most two rank tables are ever
  * resident. On a real cluster both shuffles hash-partition on the id
  * column, so a pre-bucketed edge table co-locates the probe side and
  * the per-iteration cost is one network pass over the rank table
  * (which is |V|-sized, ≪ |E|).
  *
  * Overflow headroom: values are bounded by |V|·scale·dampNum, which
  * must stay < 2^63 — at scale=1e6 that holds to ~10^11 nodes; beyond
  * that, lower `scale` (the doc for 100 TB: 10^12 docs → scale=1e4).
  */
object Graph {

  /** Fixed-point PageRank over an edge list. Returns `(id, rank_q)`
    * for every node appearing as a source or destination, `rank_q` in
    * micro-units (LONG). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 8,
               dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val src = col(srcCol).as("src")
    val dst = col(dstCol).as("dst")
    val e0 = edges.select(src, dst)
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // src, dst, outdeg — joined once, reused every iteration.
    val eDeg = e0.join(outdeg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    eDeg.count() // materialize before the loop so iterations reuse it

    val base = scale - (dampNum * scale) / dampDen
    var ranks = nodes.select(col("id"), lit(scale).as("r")).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("r"))
        .localCheckpoint()
      // round-9 checkpoint-lifetime discipline: at most two rank
      // tables resident; free k-1 the moment k has materialized.
      ranks.unpersist(blocking = true)
      ranks = next
      i += 1
    }
    val out = ranks.select(col("id"), col("r").cast("long").as("rank_q"))
    nodes.unpersist(blocking = false)
    eDeg.unpersist(blocking = false)
    out
  }

  /** [[pageRank]] over an UNDIRECTED pair list (`id_a`,`id_b`) — each
    * pair contributes both directions, the natural shape for the
    * winnow/minhash near-dup pair reports. */
  def pageRankUndirected(pairs: DataFrame, aCol: String, bCol: String,
                         iters: Int = 8,
                         dampNum: Long = 85L, dampDen: Long = 100L,
                         scale: Long = 1000000L): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    pageRank(sym, "src", "dst", iters, dampNum, dampDen, scale)
  }
}

package graft

/** DuckDB replay of [[graft.operators.Similarity.kmeansExact]] — the
  * integer-exact Lloyd trainer unrolled iteration by iteration as
  * CTEs (the q66 LogReg pattern applied to clustering). Every stage
  * is engine-portable by construction: the quantization
  * floor(x·scale + 0.5) widens float→double and applies correctly
  * rounded IEEE ops; distances and sums are BIGINT-exact; the
  * centroid update floor((2s+n)/(2n)) is one IEEE double division
  * both engines round identically; assignment ties break on
  * (dist, cid) via an explicit window order. */
object OracleKmeans {

  /** One Lloyd iteration: assignment a$i against centroids c${i-1},
    * then centroids c$i as the re-quantized per-(cell, dim) means
    * (empty cells keep their previous centroid). */
  private def iterCtes(i: Int): String =
    s"""a$i AS MATERIALIZED (
       SELECT vec_id, cid AS cell, dist FROM (
         SELECT q.vec_id, c.cid,
           CAST(list_sum([ (qv[i]-cq[i])*(qv[i]-cq[i])
                           FOR i IN generate_series(1, len(qv))]) AS BIGINT) AS dist
         FROM q CROSS JOIN c${i - 1} c) t
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       m$i AS (
       SELECT cell, pos, CAST(floor((2.0*s + n)/(2.0*n)) AS BIGINT) AS m
       FROM (
         SELECT a.cell, d.i AS pos,
           CAST(sum(q.qv[d.i]) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
         FROM a$i a JOIN q USING (vec_id)
         CROSS JOIN (SELECT unnest(generate_series(1, (SELECT max(len(qv)) FROM q))) AS i) d
         GROUP BY a.cell, d.i) t),
       c$i AS MATERIALIZED (
       SELECT p.cid, COALESCE(m.cq, p.cq) AS cq FROM c${i - 1} p
       LEFT JOIN (SELECT cell AS cid, list(m ORDER BY pos) AS cq
                  FROM m$i GROUP BY cell) m USING (cid))"""

  /** q78: the full train-and-assign round trip — `iters` unrolled
    * Lloyd iterations over the quantized embeddings, then the final
    * assignment pass against the trained centroids. Output matches
    * the engine's (vec_id, cell, dist). */
  def q78Sql(k: Int, iters: Int, scale: Int): String = {
    val sc = s"$scale.0"
    val rounds = (1 to iters).map(iterCtes).mkString(",\n       ")
    s"""WITH q AS MATERIALIZED (
       SELECT vec_id,
         [CAST(floor(x*$sc + 0.5) AS BIGINT) FOR x IN embedding] AS qv
       FROM embeddings),
       c0 AS MATERIALIZED (
       SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid,
         qv AS cq
       FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT $k) t),
       $rounds
       SELECT vec_id, cid AS cell, dist FROM (
         SELECT q.vec_id, c.cid,
           CAST(list_sum([ (qv[i]-cq[i])*(qv[i]-cq[i])
                           FOR i IN generate_series(1, len(qv))]) AS BIGINT) AS dist
         FROM q CROSS JOIN c$iters c) t
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1"""
  }
}

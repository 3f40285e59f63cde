package graft

/** DuckDB replay of [[graft.operators.Similarity.pqTopKExact]] — the
  * grid-exact PQ ANN chain unrolled end to end: per-subspace
  * integer-exact Lloyd (the [[OracleKmeans]] template keyed by `sub`),
  * integer encode + ADC shortlist, exact-fold cosine re-rank (the x12
  * machinery). Every pre-re-rank quantity is BIGINT-exact, every
  * float op (quantization floor, the mean-update division, the cosine
  * fold) is a correctly rounded IEEE op both engines share, and every
  * tie breaks on an explicit (dist, cid) / (adc, vec_id) /
  * (cos DESC, vec_id) order — so the replay is bit-for-bit.
  */
object OraclePq {

  // x12's left-fold dot product / guarded cosine (SparkEntry.sqlFold /
  // sqlCos, restated here — same strings, same association).
  private def sqlFold(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, [$a[i] * $b[i] for i in generate_series(1, len($a))]), (x, y) -> x + y)"

  private def sqlCos(a: String, b: String): String = {
    val d = sqlFold(a, b); val na = sqlFold(a, a); val nb = sqlFold(b, b)
    s"CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN 0.0 ELSE $d / (sqrt($na) * sqrt($nb)) END"
  }

  /** Integer squared-L2 between two BIGINT lists (order-free: the
    * terms are exact, so list_sum's fold order cannot matter). */
  private def l2(a: String, b: String): String =
    s"CAST(list_sum([ ($a[i]-$b[i])*($a[i]-$b[i]) FOR i IN generate_series(1, len($a))]) AS BIGINT)"

  /** One per-subspace Lloyd iteration: assignment a$i against
    * codebook c${i-1} (keyed by sub), then c$i as the re-quantized
    * per-(sub, cell, dim) means; empty cells keep their centroid. */
  private def iterCtes(i: Int, subDim: Int): String =
    s"""a$i AS MATERIALIZED (
       SELECT vec_id, sub, cid AS cell FROM (
         SELECT s.vec_id, s.sub, c.cid, ${l2("s.sv", "c.cq")} AS dist
         FROM sl s JOIN c${i - 1} c USING (sub)) t
       QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
       m$i AS (
       SELECT sub, cell, pos, CAST(floor((2.0*s + n)/(2.0*n)) AS BIGINT) AS m
       FROM (
         SELECT a.sub, a.cell, d.i AS pos,
           CAST(sum(s.sv[d.i]) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
         FROM a$i a JOIN sl s ON s.vec_id = a.vec_id AND s.sub = a.sub
         CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS i) d
         GROUP BY a.sub, a.cell, d.i) t),
       c$i AS MATERIALIZED (
       SELECT p.sub, p.cid, COALESCE(m.cq, p.cq) AS cq FROM c${i - 1} p
       LEFT JOIN (SELECT sub, cell AS cid, list(m ORDER BY pos) AS cq
                  FROM m$i GROUP BY sub, cell) m USING (sub, cid))"""

  /** x26: train (iters unrolled rounds) → encode the non-query corpus
    * → integer ADC shortlist of refine·k → exact cosine top-k.
    * Output matches the engine's (vec_id, cos). */
  def x26Sql(dim: Int = 64, m: Int = 8, k: Int = 16, iters: Int = 3,
             scale: Int = 1000, queryId: Long = 0L, topK: Int = 20,
             refine: Int = 4): String = {
    val subDim = dim / m
    val sc = s"$scale.0"
    val rounds = (1 to iters).map(iterCtes(_, subDim)).mkString(",\n       ")
    s"""WITH q AS MATERIALIZED (
       SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE)*$sc + 0.5) AS BIGINT) FOR x IN embedding] AS qv
       FROM embeddings),
       subs AS (SELECT unnest(generate_series(0, ${m - 1})) AS sub),
       sl AS MATERIALIZED (
       SELECT vec_id, sub,
         list_slice(qv, sub*$subDim + 1, (sub+1)*$subDim) AS sv
       FROM q CROSS JOIN subs),
       c0 AS MATERIALIZED (
       SELECT sub,
         CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS BIGINT) - 1 AS cid,
         sv AS cq
       FROM (SELECT vec_id, sub, sv FROM sl
             QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= $k) t),
       $rounds,
       enc AS (
       SELECT vec_id, sub, cid AS code FROM (
         SELECT s.vec_id, s.sub, c.cid, ${l2("s.sv", "c.cq")} AS dist
         FROM sl s JOIN c$iters c USING (sub)
         WHERE s.vec_id <> $queryId) t
       QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
       qsl AS (SELECT sub, sv AS qsv FROM sl WHERE vec_id = $queryId),
       adctab AS (
       SELECT c.sub, c.cid, ${l2("qsl.qsv", "c.cq")} AS d
       FROM c$iters c JOIN qsl USING (sub)),
       adc AS (
       SELECT e.vec_id, CAST(sum(t.d) AS BIGINT) AS adc
       FROM enc e JOIN adctab t ON t.sub = e.sub AND t.cid = e.code
       GROUP BY e.vec_id),
       short AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT ${refine * topK}),
       e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       qe AS (SELECT v AS qvv FROM e WHERE vec_id = $queryId)
       SELECT e.vec_id, ${sqlCos("e.v", "qvv")} AS cos
       FROM e JOIN short USING (vec_id), qe
       ORDER BY cos DESC, e.vec_id LIMIT $topK"""
  }
}

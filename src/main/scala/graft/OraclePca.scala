package graft

/** DuckDB replay of [[operators.Pca]] — the covariance moments as
  * integer aggregates, then the power iteration UNROLLED as one CTE
  * pair per iterate (the OracleBpe pattern: driver-coordinated rounds
  * render as machine-generated SQL). Every float step is the same
  * element-wise correctly-rounded IEEE chain as the Scala solver, in
  * the same order; every sum is an exact integer (BIGINT, or HUGEINT
  * where the Rayleigh numerator exceeds 2^63), so summation order —
  * the thing no two engines share — never matters. */
object OraclePca {

  /** WITH-body prefix shared by q96/q97: quantized vectors, moments,
    * integer covariance, and the full k-component iteration chain. */
  private def trainCtes(dim: Int, k: Int, iters: Int, scale: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""e AS MATERIALIZED (
      SELECT vec_id,
        [CAST(floor(CAST(x AS DOUBLE) * $scale.0 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings WHERE len(embedding) = $dim),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    ii AS MATERIALIZED (SELECT unnest(generate_series(1, $dim)) AS i),
    sv AS MATERIALIZED (
      SELECT ii.i, CAST(sum(e.qv[ii.i]) AS BIGINT) AS s
      FROM e CROSS JOIN ii GROUP BY ii.i),
    pp AS MATERIALIZED (
      SELECT a.i, b.i AS j, CAST(sum(e.qv[a.i] * e.qv[b.i]) AS BIGINT) AS pp
      FROM e CROSS JOIN ii a CROSS JOIN ii b GROUP BY a.i, b.i),
    a0 AS MATERIALIZED (
      SELECT pp.i, pp.j,
        CAST(floor((CAST(pp.pp AS DOUBLE)
          - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / CAST(nn.n AS DOUBLE))
          / CAST(nn.n AS DOUBLE) + 0.5) AS BIGINT) AS c
      FROM pp JOIN sv si ON si.i = pp.i JOIN sv sj ON sj.i = pp.j
      CROSS JOIN nn)"""
    for (c <- 1 to k) {
      val a = s"a${c - 1}"
      sb ++= s""",
    v${c}_0 AS MATERIALIZED (SELECT unnest(generate_series(1, $dim)) AS j,
                CAST(1000000 AS BIGINT) AS x)"""
      for (t <- 1 to iters) {
        sb ++= s""",
    w${c}_$t AS MATERIALIZED (
      SELECT a.i AS j, CAST(SUM(a.c * v.x) AS BIGINT) AS w
      FROM $a a JOIN v${c}_${t - 1} v ON v.j = a.j GROUP BY a.i),
    m${c}_$t AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM w${c}_$t),
    v${c}_$t AS MATERIALIZED (
      SELECT w.j,
        CASE WHEN m.mx = 0 THEN p.x
             ELSE CAST(floor(CAST(w.w AS DOUBLE) * 1000000.0
                    / CAST(m.mx AS DOUBLE) + 0.5) AS BIGINT) END AS x
      FROM w${c}_$t w JOIN v${c}_${t - 1} p USING (j) CROSS JOIN m${c}_$t m)"""
      }
      sb ++= s""",
    wf$c AS MATERIALIZED (
      SELECT a.i AS j, CAST(SUM(a.c * v.x) AS BIGINT) AS w
      FROM $a a JOIN v${c}_$iters v ON v.j = a.j GROUP BY a.i),
    num$c AS MATERIALIZED (
      SELECT SUM(CAST(v.x AS HUGEINT) * CAST(w.w AS HUGEINT)) AS num
      FROM v${c}_$iters v JOIN wf$c w USING (j)),
    den$c AS MATERIALIZED (SELECT CAST(SUM(x * x) AS BIGINT) AS den FROM v${c}_$iters),
    lam$c AS MATERIALIZED (
      SELECT CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) + 0.5)
        AS BIGINT) AS lam
      FROM num$c CROSS JOIN den$c),
    a$c AS MATERIALIZED (
      SELECT a.i, a.j,
        CAST(a.c - floor(CAST(n1.num AS DOUBLE) * CAST(vi.x AS DOUBLE)
          * CAST(vj.x AS DOUBLE)
          / CAST(CAST(d1.den AS HUGEINT) * CAST(d1.den AS HUGEINT) AS DOUBLE)
          + 0.5) AS BIGINT) AS c
      FROM $a a JOIN v${c}_$iters vi ON vi.j = a.i
      JOIN v${c}_$iters vj ON vj.j = a.j
      CROSS JOIN num$c n1 CROSS JOIN den$c d1)"""
    }
    sb.toString
  }

  /** q96: the component table (component, dim, v, lam). */
  def q96Sql(dim: Int = 64, k: Int = 2, iters: Int = 8,
             scale: Int = 1000): String = {
    val sel = (1 to k).map { c =>
      s"""SELECT CAST($c AS BIGINT) AS component, CAST(v.j AS BIGINT) AS dim,
           v.x AS v, l.lam AS lam
         FROM v${c}_$iters v CROSS JOIN lam$c l"""
    }.mkString("\n         UNION ALL\n         ")
    s"WITH ${trainCtes(dim, k, iters, scale)}\n         $sel"
  }

  /** q97: centered projections (vec_id, component, proj). */
  def q97Sql(dim: Int = 64, k: Int = 2, iters: Int = 8,
             scale: Int = 1000): String = {
    val sel = (1 to k).map { c =>
      s"""SELECT e.vec_id, CAST($c AS BIGINT) AS component,
           CAST(floor(CAST(SUM(e.qv[v.j] * v.x) AS DOUBLE)
             - CAST(mt$c.mt AS DOUBLE) / CAST(nn.n AS DOUBLE)
             + 0.5) AS BIGINT) AS proj
         FROM e CROSS JOIN v${c}_$iters v CROSS JOIN mt$c CROSS JOIN nn
         GROUP BY e.vec_id, mt$c.mt, nn.n"""
    }.mkString("\n         UNION ALL\n         ")
    val mts = (1 to k).map { c =>
      s"""mt$c AS MATERIALIZED (
      SELECT SUM(CAST(sv.s AS HUGEINT) * CAST(v.x AS HUGEINT)) AS mt
      FROM sv JOIN v${c}_$iters v ON v.j = sv.i)"""
    }.mkString(",\n    ")
    s"WITH ${trainCtes(dim, k, iters, scale)},\n    $mts\n         $sel"
  }
}

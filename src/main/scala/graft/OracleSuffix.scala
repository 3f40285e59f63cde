package graft

/** DuckDB replay of [[graft.operators.SuffixArray]] — prefix doubling
  * unrolled round by round. The engine ranks DISTINCT pairs via
  * sort + zipWithIndex; `dense_rank() OVER (ORDER BY ...)` assigns
  * the same 1..D values to the same sorted distinct keys, so ranks
  * agree exactly and the final group/count arithmetic is BIGINT. */
object OracleSuffix {

  private def roundCte(k: Int): String = {
    val step = 1L << (k - 1)
    s"""r$k AS MATERIALIZED (
       SELECT a.doc_id, a.pos,
         CAST(dense_rank() OVER (ORDER BY a.r, COALESCE(b.r, -1)) AS BIGINT) AS r
       FROM r${k - 1} a LEFT JOIN r${k - 1} b
         ON a.doc_id = b.doc_id AND b.pos = a.pos + $step)"""
  }

  /** Tokenize + sentinel + position CTEs shared by q87/q88. */
  private def baseCtes(rounds: Int): String = {
    val rcs = (1 to rounds).map(roundCte).mkString(",\n       ")
    s"""arrs AS (
         SELECT doc_id,
           list_append(list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9'']+'), x -> length(x) > 0),
             '#' || CAST(doc_id AS VARCHAR)) AS arr
         FROM documents),
       p AS (
         SELECT doc_id, u.pos AS pos, u.tk AS tk FROM (
           SELECT doc_id,
             unnest([{'pos': i, 'tk': arr[i]} FOR i IN generate_series(1, len(arr))]) AS u
           FROM arrs)),
       r0 AS MATERIALIZED (
         SELECT doc_id, pos, CAST(dense_rank() OVER (ORDER BY tk) AS BIGINT) AS r FROM p),
       $rcs"""
  }

  /** q87: per-doc duplicated-run starts at threshold minRun = 2^rounds. */
  def q87Sql(minRun: Int): String = {
    require(minRun >= 2 && (minRun & (minRun - 1)) == 0)
    val rounds = java.lang.Integer.numberOfTrailingZeros(minRun)
    s"""WITH ${baseCtes(rounds)},
       grp AS (SELECT r FROM r$rounds GROUP BY r HAVING count(*) >= 2),
       dup AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
         FROM r$rounds JOIN grp USING (r) GROUP BY doc_id),
       nt AS (
         SELECT doc_id, CAST(len(arr) - 1 AS BIGINT) AS n_tokens FROM arrs)
       SELECT nt.doc_id, nt.n_tokens,
         COALESCE(dup.n_dup, 0) AS n_dup_starts
       FROM nt LEFT JOIN dup USING (doc_id)"""
  }

  /** q88: per-doc longest-duplicated-run profile over thresholds
    * {2, 4, …, maxRun} — one chain, per-round group verdicts, argmax
    * on (run_len, n) exactly as the engine's max(struct). */
  def q88Sql(maxRun: Int): String = {
    require(maxRun >= 2 && (maxRun & (maxRun - 1)) == 0)
    val rounds = java.lang.Integer.numberOfTrailingZeros(maxRun)
    val perRound = (1 to rounds).map { k =>
      s"""SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
            CAST(${1L << k} AS BIGINT) AS run_len
          FROM r$k JOIN (SELECT r FROM r$k GROUP BY r HAVING count(*) >= 2) g$k
            USING (r) GROUP BY doc_id"""
    }.mkString("\n          UNION ALL\n          ")
    s"""WITH ${baseCtes(rounds)},
       u AS ($perRound),
       agg AS (SELECT doc_id, max(run_len) AS mr FROM u GROUP BY doc_id),
       nt AS (
         SELECT doc_id, CAST(len(arr) - 1 AS BIGINT) AS n_tokens FROM arrs)
       SELECT nt.doc_id, nt.n_tokens,
         COALESCE(agg.mr, 0) AS max_dup_run,
         COALESCE(u.n, 0) AS n_dup_starts_at_max
       FROM nt LEFT JOIN agg USING (doc_id)
         LEFT JOIN u ON u.doc_id = nt.doc_id AND u.run_len = agg.mr"""
  }
}

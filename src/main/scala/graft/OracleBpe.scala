package graft

/** Renders DuckDB oracle SQL that replays [[graft.operators.Bpe]]
  * training round for round — possible because BPE is pure integer
  * counts + string equality (no floats anywhere). The engine applies
  * each merge as a greedy left-to-right fold; the oracle renders the
  * SAME greedy semantics relationally: flag every position whose
  * (s[i], s[i+1]) matches the round's winning pair, group consecutive
  * flagged positions into runs (overlaps only happen when lhs == rhs),
  * and merge the even offsets within each run — exactly the positions
  * the classic walk-and-skip loop takes. Winner selection is the same
  * (count DESC, lhs, rhs) total order on both sides. */
object OracleBpe {

  private val toksSql =
    """list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9'']+'), x -> length(x) > 0)"""

  /** One training round: pair counts from s{r-1}, winner b{r}, greedy
    * merge application producing s{r}. */
  private def roundCtes(r: Int): String = {
    val prev = s"s${r - 1}"
    s"""p$r AS (
         SELECT freq, unnest([{'l': syms[i], 'r': syms[i + 1]}
                              FOR i IN generate_series(1, len(syms) - 1)]) AS pr
         FROM $prev),
       c$r AS (SELECT pr.l AS l, pr.r AS r, CAST(sum(freq) AS BIGINT) AS c
               FROM p$r GROUP BY 1, 2),
       b$r AS MATERIALIZED (SELECT l AS bl, r AS br, c FROM c$r ORDER BY c DESC, l, r LIMIT 1),
       e$r AS (SELECT word, freq,
                 unnest(generate_series(1, len(syms))) AS pos,
                 unnest(syms) AS s
               FROM $prev),
       f$r AS (
         SELECT e.word, e.freq, e.pos, e.s,
           lead(e.s) OVER (PARTITION BY e.word ORDER BY e.pos) AS nxt,
           CASE WHEN e.s = b.bl
                 AND lead(e.s) OVER (PARTITION BY e.word ORDER BY e.pos) = b.br
                THEN 1 ELSE 0 END AS m
         FROM e$r e, b$r b),
       g$r AS (SELECT *, pos - row_number() OVER (PARTITION BY word, m ORDER BY pos) AS run
               FROM f$r),
       h$r AS MATERIALIZED (
         SELECT word, freq, pos, s, nxt,
           CASE WHEN m = 1
                 AND (row_number() OVER (PARTITION BY word, m, run ORDER BY pos) - 1) % 2 = 0
                THEN 1 ELSE 0 END AS take
         FROM g$r),
       s$r AS MATERIALIZED (
         SELECT a.word, a.freq,
           list(CASE WHEN a.take = 1 THEN a.s || a.nxt ELSE a.s END ORDER BY a.pos) AS syms
         FROM h$r a
         LEFT JOIN h$r p ON a.word = p.word AND a.pos = p.pos + 1
         WHERE COALESCE(p.take, 0) = 0
         GROUP BY a.word, a.freq)"""
  }

  /** Full q72 replay: `nMerges` unrolled rounds, output one row per
    * learned merge — (rank, lhs, rhs, pair_freq). */
  def q72Sql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map(roundCtes).mkString(",\n       ")
    val out = (1 to nMerges)
      .map(r => s"SELECT CAST($r AS BIGINT) AS rank, bl AS lhs, br AS rhs, c AS pair_freq FROM b$r")
      .mkString("\n       UNION ALL ")
    s"""WITH tok AS (SELECT unnest($toksSql) AS word FROM documents),
       w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY word),
       s0 AS MATERIALIZED (
         SELECT word, freq,
           list_append([word[i:i] FOR i IN generate_series(1, len(word))], '_') AS syms
         FROM w),
       $rounds
       $out"""
  }

  /** q73 replay: the same unrolled rounds, but the OUTPUT is the final
    * word-type segmentation table s{nMerges} — the apply path. */
  def q73Sql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map(roundCtes).mkString(",\n       ")
    s"""WITH tok AS (SELECT unnest($toksSql) AS word FROM documents),
       w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY word),
       s0 AS MATERIALIZED (
         SELECT word, freq,
           list_append([word[i:i] FOR i IN generate_series(1, len(word))], '_') AS syms
         FROM w),
       $rounds
       SELECT word, freq, array_to_string(syms, ' ') AS pieces FROM s$nMerges"""
  }

  /** q77: corpus-weighted tokenizer fertility over the final
    * segmentation state — the same unrolled rounds as q73, aggregated
    * to one row of integer piece counts plus two exact divisions. */
  def q77Sql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map(roundCtes).mkString(",\n       ")
    s"""WITH tok AS (SELECT unnest($toksSql) AS word FROM documents),
       w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY word),
       s0 AS MATERIALIZED (
         SELECT word, freq,
           list_append([word[i:i] FOR i IN generate_series(1, len(word))], '_') AS syms
         FROM w),
       $rounds
       SELECT CAST(count(*) AS BIGINT) AS n_word_types,
         CAST(sum(freq) AS BIGINT) AS n_tokens,
         CAST(sum(freq * len(syms)) AS BIGINT) AS n_pieces,
         CAST(sum(freq * len(syms)) AS DOUBLE) / CAST(sum(freq) AS DOUBLE) AS fertility,
         CAST(sum(CASE WHEN len(syms) > 1 THEN freq ELSE 0 END) AS DOUBLE)
           / CAST(sum(freq) AS DOUBLE) AS split_frac
       FROM s$nMerges"""
  }
}

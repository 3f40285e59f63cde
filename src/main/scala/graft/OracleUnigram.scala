package graft

/** DuckDB replay of [[graft.operators.Unigram]] — the hard-EM
  * unigram-LM tokenizer unrolled as CTEs. The Viterbi E-step is
  * replayed by ENUMERATING every segmentation of every word type
  * (a recursive CTE bounded by word length ≤ ~10 and piece length ≤
  * maxPieceLen) and taking the (score DESC, seg ASC) argmax — the
  * object doc of Unigram proves this equals the engine's suffix DP
  * tie-break. Scores are BIGINT sums of micro-nat logprobs and every
  * count is an integer, so the hash match is exact. */
object OracleUnigram {

  /** Shared training prefix: word types, seed vocab + logprobs,
    * E₁ enumeration, prune, M₁, E₂ enumeration, M₂. */
  private def trainCtes(vocabSize: Int, maxPieceLen: Int): String =
    s"""wt AS MATERIALIZED (
       SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         SELECT unnest(list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9'']+'), x -> length(x) > 0)) AS word
         FROM documents) GROUP BY word),
       seed AS MATERIALIZED (
       SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         SELECT unnest(flatten([[substr(word, i, l)
                  FOR l IN generate_series(1, least($maxPieceLen, length(word) - i + 1))]
                  FOR i IN generate_series(1, length(word))])) AS piece, freq
         FROM wt) GROUP BY piece),
       seedlp AS MATERIALIZED (
       SELECT piece, cnt,
         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t.tot + t.nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q
       FROM seed, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nv FROM seed) t),
       paths1(word, pos, score, seg) AS (
         SELECT word, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '' FROM wt
         UNION ALL
         SELECT p.word, p.pos + length(v.piece), p.score + v.lp_q,
           CASE WHEN p.seg = '' THEN v.piece ELSE p.seg || '|' || v.piece END
         FROM paths1 p JOIN seedlp v
           ON v.piece = substr(p.word, CAST(p.pos AS INT) + 1, length(v.piece))
         WHERE p.pos < length(p.word)),
       seg1 AS MATERIALIZED (
       SELECT word, seg FROM (
         SELECT word, seg,
           row_number() OVER (PARTITION BY word ORDER BY score DESC, seg ASC) AS rn
         FROM paths1 WHERE pos = length(word)) WHERE rn = 1),
       c1 AS MATERIALIZED (
       SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         SELECT unnest(string_split(seg, '|')) AS piece, freq
         FROM seg1 JOIN wt USING (word)) GROUP BY piece),
       kept AS MATERIALIZED (
       SELECT s.piece, COALESCE(c1.cnt, 0) AS cnt
       FROM (SELECT piece FROM seed WHERE length(piece) = 1) s
       LEFT JOIN c1 USING (piece)
       UNION ALL
       SELECT piece, cnt FROM (
         SELECT piece, cnt FROM c1 WHERE length(piece) > 1
         ORDER BY cnt DESC, piece ASC LIMIT $vocabSize)),
       keptlp AS MATERIALIZED (
       SELECT piece, cnt,
         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t.tot + t.nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q
       FROM kept, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nv FROM kept) t),
       paths2(word, pos, score, seg) AS (
         SELECT word, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '' FROM wt
         UNION ALL
         SELECT p.word, p.pos + length(v.piece), p.score + v.lp_q,
           CASE WHEN p.seg = '' THEN v.piece ELSE p.seg || '|' || v.piece END
         FROM paths2 p JOIN keptlp v
           ON v.piece = substr(p.word, CAST(p.pos AS INT) + 1, length(v.piece))
         WHERE p.pos < length(p.word)),
       seg2 AS MATERIALIZED (
       SELECT word, seg, score FROM (
         SELECT word, seg, score,
           row_number() OVER (PARTITION BY word ORDER BY score DESC, seg ASC) AS rn
         FROM paths2 WHERE pos = length(word)) WHERE rn = 1),
       c2 AS MATERIALIZED (
       SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         SELECT unnest(string_split(seg, '|')) AS piece, freq
         FROM seg2 JOIN wt USING (word)) GROUP BY piece),
       vocab AS MATERIALIZED (
       SELECT k.piece, COALESCE(c2.cnt, 0) AS cnt
       FROM (SELECT piece FROM kept) k LEFT JOIN c2 USING (piece))"""

  /** q83: the fitted vocabulary (piece, cnt, lp_q). */
  def q83Sql(vocabSize: Int, maxPieceLen: Int): String =
    s"""WITH RECURSIVE
       ${trainCtes(vocabSize, maxPieceLen)}
       SELECT piece, cnt,
         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t.tot + t.nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q
       FROM vocab, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nv FROM vocab) t"""

  /** q84: the apply path — every word type segmented under the
    * fitted model: (word, freq, seg, n_pieces, score_q). */
  def q84Sql(vocabSize: Int, maxPieceLen: Int): String =
    s"""WITH RECURSIVE
       ${trainCtes(vocabSize, maxPieceLen)},
       finallp AS (
       SELECT piece,
         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t.tot + t.nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q
       FROM vocab, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nv FROM vocab) t),
       paths3(word, pos, score, seg) AS (
         SELECT word, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '' FROM wt
         UNION ALL
         SELECT p.word, p.pos + length(v.piece), p.score + v.lp_q,
           CASE WHEN p.seg = '' THEN v.piece ELSE p.seg || '|' || v.piece END
         FROM paths3 p JOIN finallp v
           ON v.piece = substr(p.word, CAST(p.pos AS INT) + 1, length(v.piece))
         WHERE p.pos < length(p.word))
       SELECT s.word, wt.freq, s.seg,
         CAST(len(string_split(s.seg, '|')) AS BIGINT) AS n_pieces,
         s.score AS score_q
       FROM (
         SELECT word, seg, score FROM (
           SELECT word, seg, score,
             row_number() OVER (PARTITION BY word ORDER BY score DESC, seg ASC) AS rn
           FROM paths3 WHERE pos = length(word)) WHERE rn = 1) s
       JOIN wt USING (word)"""

  /** One extra post-prune EM round, unrolled: add-one logprobs over
    * `prev`, enumerate-and-argmax segmentation (E), recount over the
    * FIXED piece set (M). Mirrors [[graft.operators.Unigram.emRound]]:
    * the piece set never changes after pruning, so rounds compose and
    * a resumed round is indistinguishable from a deeper one-shot
    * schedule — which is exactly what lets x33 hash-check. */
  private def extraRoundCtes(r: Int, prev: String): String =
    s"""lp$r AS MATERIALIZED (
       SELECT piece, cnt,
         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t.tot + t.nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q
       FROM $prev, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nv FROM $prev) t),
       paths$r(word, pos, score, seg) AS (
         SELECT word, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '' FROM wt
         UNION ALL
         SELECT p.word, p.pos + length(v.piece), p.score + v.lp_q,
           CASE WHEN p.seg = '' THEN v.piece ELSE p.seg || '|' || v.piece END
         FROM paths$r p JOIN lp$r v
           ON v.piece = substr(p.word, CAST(p.pos AS INT) + 1, length(v.piece))
         WHERE p.pos < length(p.word)),
       seg$r AS MATERIALIZED (
       SELECT word, seg FROM (
         SELECT word, seg,
           row_number() OVER (PARTITION BY word ORDER BY score DESC, seg ASC) AS rn
         FROM paths$r WHERE pos = length(word)) WHERE rn = 1),
       c$r AS MATERIALIZED (
       SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         SELECT unnest(string_split(seg, '|')) AS piece, freq
         FROM seg$r JOIN wt USING (word)) GROUP BY piece),
       vocab$r AS MATERIALIZED (
       SELECT k.piece, COALESCE(c$r.cnt, 0) AS cnt
       FROM (SELECT piece FROM $prev) k LEFT JOIN c$r USING (piece))"""

  /** x33: the standard 2-round schedule (q83's trainCtes) plus
    * `extraRounds` more EM rounds — the SQL twin of
    * `resumeEm(loadState(saveState(trainState(...))), extraRounds)`,
    * valid because the state roundtrip is exact (strings + BIGINTs)
    * and emRound composes. Output = (piece, cnt, lp_q). */
  def x33Sql(vocabSize: Int, maxPieceLen: Int, extraRounds: Int): String = {
    require(extraRounds >= 1, s"extraRounds must be >= 1 (got $extraRounds)")
    val rounds = (1 to extraRounds).map { i =>
      val r = i + 2
      extraRoundCtes(r, if (i == 1) "vocab" else s"vocab${r - 1}")
    }.mkString(",\n       ")
    val last = s"vocab${extraRounds + 2}"
    s"""WITH RECURSIVE
       ${trainCtes(vocabSize, maxPieceLen)},
       $rounds
       SELECT piece, cnt,
         CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t.tot + t.nv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_q
       FROM $last, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nv FROM $last) t"""
  }
}

package graft

import graft.operators.DedupApprox

/** Renders DuckDB oracle SQL that replays the engine's LSH dedup
  * pipelines exactly — possible because every hash in [[DedupApprox]]
  * is overflow-free modular arithmetic (31-bit polynomial hashes,
  * seeded mod-prime permutations) or wrapping-64 arithmetic DuckDB can
  * reproduce with HUGEINT. The seeded permutation parameters are
  * rendered into the SQL as literals, so the oracle buckets, bands,
  * verifies and clusters precisely as the engine does, pair for pair.
  */
object OracleLsh {

  private val P = DedupApprox.HashMod // 1000000007

  /** tokens per doc, engine-tokenizer parity. */
  private val toksSql =
    """list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> length(x) > 0)"""

  /** per-token 31-bit polynomial hash (base 131 mod P). */
  private val th31Sql =
    s"""list_transform(toks, t -> list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ord(t[i]) AS BIGINT) for i in generate_series(1, length(t))]), (h, c) -> (h * 131 + c) % $P))"""

  /** window fold of token hashes → shingle hash (base 1000003 mod P). */
  private def shingleFold(slice: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), $slice), (h, c) -> (h * 1000003 + c) % $P)"""

  /** distinct n-gram shingle hashes per doc (th = token-hash list). */
  private def shinglesSql(n: Int): String =
    s"""list_distinct(CASE
       WHEN len(th) = 0 THEN []
       WHEN len(th) < $n THEN [${shingleFold("th")}]
       ELSE [${shingleFold(s"th[i:i+${n - 1}]")} for i in generate_series(1, len(th)-${n - 1})] END)"""

  /** 64-slot minwise signature over `shs`, sentinel-filled when empty. */
  private def sigSql(numHashes: Int): String =
    DedupApprox.perms(numHashes).map { case (a, b) =>
      s"coalesce(list_min(list_transform(shs, s -> ($a * s + $b) % $P)), ${DedupApprox.EmptySentinel})"
    }.mkString("[", ",\n    ", "]")

  /** 16 band hashes (seed 7, base 31 mod P over 4-slot sig slices). */
  private def bandsSql(bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      s"list_reduce(list_prepend(CAST(7 AS BIGINT), sig[${rows * b + 1}:${rows * b + rows}]), (h, c) -> (h * 31 + c) % $P)"
    }.mkString("[", ", ", "]")

  /** The x09 CTE chain ending in verified (id_a, id_b, jaccard) pairs —
    * also the pair source for the x18 cluster verdicts. Parameters
    * mirror [[DedupApprox.minhashPairs]] defaults. */
  private[graft] def minhashPairsCtes(shingleN: Int = 3, numHashes: Int = 64,
                               bands: Int = 16, threshold: Double = 0.5,
                               maxBucket: Int = 500,
                               src: String = "documents"): String =
    s"""t0 AS (SELECT doc_id, $toksSql AS toks FROM $src),
       t1 AS (SELECT doc_id, $th31Sql AS th FROM t0),
       t2 AS (SELECT doc_id, ${shinglesSql(shingleN)} AS shs FROM t1),
       t3 AS (SELECT doc_id, shs, ${sigSql(numHashes)} AS sig FROM t2),
       banded AS (
         SELECT doc_id, gs.i AS band, (${bandsSql(bands, numHashes / bands)})[gs.i] AS bh
         FROM t3, generate_series(1, $bands) AS gs(i)),
       ${pairsTailCtes(threshold, maxBucket)}"""

  /** banded + t2 → verified pairs (the x09 chain's tail): factored out
    * so the staged q93 replay can run it over MATERIALIZED banded/t2
    * temp tables (define CTE aliases with those names first). */
  private[graft] def pairsTailCtes(threshold: Double = 0.5,
                                   maxBucket: Int = 500): String =
    s"""ok AS (SELECT band, bh FROM banded GROUP BY band, bh HAVING count(*) BETWEEN 2 AND $maxBucket),
       cand AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a
         JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         JOIN ok ON a.band = ok.band AND a.bh = ok.bh),
       verif AS (
         SELECT id_a, id_b,
           CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE)
             / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) AS jaccard
         FROM cand JOIN t2 sa ON sa.doc_id = id_a JOIN t2 sb ON sb.doc_id = id_b),
       pairs AS (SELECT id_a, id_b, jaccard FROM verif WHERE jaccard >= $threshold)"""

  def x09Sql: String =
    s"WITH ${minhashPairsCtes()}\nSELECT id_a, id_b, jaccard FROM pairs"

  /** x18: pairs → connected components (recursive closure; clusters are
    * tiny so the closure is bounded) → keep/drop verdict per doc. */
  def x18Sql: String =
    s"""WITH RECURSIVE ${minhashPairsCtes()},
       edges AS (
         SELECT id_a AS s, id_b AS d FROM pairs
         UNION SELECT id_b, id_a FROM pairs),
       reach(id, r) AS (
         SELECT s, s FROM edges
         UNION
         SELECT e.s, re.r FROM edges e JOIN reach re ON e.d = re.id),
       comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       keepers AS (SELECT comp, min(id) AS keeper FROM comp GROUP BY comp)
       SELECT d.doc_id,
         coalesce(c.comp, d.doc_id) AS comp,
         CASE WHEN c.comp IS NULL THEN true ELSE d.doc_id = k.keeper END AS keep
       FROM documents d
       LEFT JOIN comp c ON d.doc_id = c.id
       LEFT JOIN keepers k ON c.comp = k.comp"""

  /** q69: same pairs + components as x18, but the keeper per cluster
    * is the QUALITY argmax (token count DESC, id ASC) instead of the
    * min id. */
  def q69Sql: String =
    s"""WITH RECURSIVE ${minhashPairsCtes()},
       edges AS (
         SELECT id_a AS s, id_b AS d FROM pairs
         UNION SELECT id_b, id_a FROM pairs),
       reach(id, r) AS (
         SELECT s, s FROM edges
         UNION
         SELECT e.s, re.r FROM edges e JOIN reach re ON e.d = re.id),
       comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       scored AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS score FROM t0),
       wc AS (SELECT s.doc_id, coalesce(c.comp, s.doc_id) AS comp, s.score
              FROM scored s LEFT JOIN comp c ON s.doc_id = c.id),
       k AS (SELECT comp, doc_id AS keeper FROM (
               SELECT comp, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY comp ORDER BY score DESC, doc_id) AS rn
               FROM wc) WHERE rn = 1)
       SELECT wc.doc_id, wc.comp, wc.score, wc.doc_id = k.keeper AS keep
       FROM wc JOIN k ON wc.comp = k.comp"""

  /** One side's doc → band-key chain over an arbitrary source table
    * (doc_id, text), name-prefixed — the generalized [[sideCtes]] the
    * q93 delta-funnel oracle builds its standing side with. */
  private[graft] def sideCtesOver(pfx: String, src: String,
                                  shingleN: Int = 3, numHashes: Int = 64,
                                  bands: Int = 16): String =
    s"""${pfx}0 AS (SELECT doc_id, $toksSql AS toks FROM $src),
       ${pfx}1 AS (SELECT doc_id, $th31Sql AS th FROM ${pfx}0),
       ${pfx}2 AS (SELECT doc_id, ${shinglesSql(shingleN)} AS shs FROM ${pfx}1),
       ${pfx}3 AS (SELECT doc_id, shs, ${sigSql(numHashes)} AS sig FROM ${pfx}2),
       ${pfx}banded AS (
         SELECT doc_id, gs.i AS band, (${bandsSql(bands, numHashes / bands)})[gs.i] AS bh
         FROM ${pfx}3, generate_series(1, $bands) AS gs(i))"""

  /** Staged-replay half-chains (round-14 VERDICT directive 2): the
    * same x09 chain split where a staged oracle materializes a temp
    * table between halves, so DuckDB never holds shingle sets, sigs,
    * and band joins in one query's working set (the sf100 q93
    * monolithic replay exhausted the allocator).
    * [[shsChain]]: doc source → distinct shingle-hash sets (t0..t2);
    * [[bandChain]]: a materialized (doc_id, shs) table → banded rows
    * (t3 + banded). Byte-identical SQL fragments to the fused chain. */
  private[graft] def shsChain(pfx: String, src: String,
                              shingleN: Int = 3): String =
    s"""${pfx}0 AS (SELECT doc_id, $toksSql AS toks FROM $src),
       ${pfx}1 AS (SELECT doc_id, $th31Sql AS th FROM ${pfx}0),
       ${pfx}2 AS (SELECT doc_id, ${shinglesSql(shingleN)} AS shs FROM ${pfx}1)"""

  private[graft] def bandChain(pfx: String, shsSrc: String,
                               numHashes: Int = 64, bands: Int = 16): String =
    s"""${pfx}3 AS (SELECT doc_id, shs, ${sigSql(numHashes)} AS sig FROM $shsSrc),
       ${pfx}banded AS (
         SELECT doc_id, gs.i AS band, (${bandsSql(bands, numHashes / bands)})[gs.i] AS bh
         FROM ${pfx}3, generate_series(1, $bands) AS gs(i))"""

  /** One side's doc → band-key chain, name-prefixed: the x09 t0..t3 +
    * banded pipeline over a filtered slice of `documents`. */
  private def sideCtes(pfx: String, where: String, shingleN: Int,
                       numHashes: Int, bands: Int): String =
    s"""${pfx}0 AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE $where),
       ${pfx}1 AS (SELECT doc_id, $th31Sql AS th FROM ${pfx}0),
       ${pfx}2 AS (SELECT doc_id, ${shinglesSql(shingleN)} AS shs FROM ${pfx}1),
       ${pfx}3 AS (SELECT doc_id, shs, ${sigSql(numHashes)} AS sig FROM ${pfx}2),
       ${pfx}banded AS (
         SELECT doc_id, gs.i AS band, (${bandsSql(bands, numHashes / bands)})[gs.i] AS bh
         FROM ${pfx}3, generate_series(1, $bands) AS gs(i))"""

  /** x28: incremental delta-vs-index dedup. Delta = doc_id % 3 = 0,
    * indexed corpus = the rest; index buckets over `maxBucket` members
    * are dropped (cap decided on the index side alone), candidates =
    * delta keys ⋈ surviving index buckets, then exact-Jaccard verify —
    * mirroring [[graft.operators.DedupApprox.minhashPairsAgainst]]. */
  def x28Sql(shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
             threshold: Double = 0.5, maxBucket: Int = 500): String =
    s"""WITH ${sideCtes("n", "doc_id % 3 = 0", shingleN, numHashes, bands)},
       ${sideCtes("ix", "doc_id % 3 <> 0", shingleN, numHashes, bands)},
       ok AS (SELECT band, bh FROM ixbanded GROUP BY band, bh HAVING count(*) <= $maxBucket),
       cand AS (
         SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS idx_id
         FROM nbanded n
         JOIN ixbanded i ON n.band = i.band AND n.bh = i.bh
         JOIN ok ON i.band = ok.band AND i.bh = ok.bh),
       verif AS (
         SELECT new_id, idx_id,
           CAST(len(list_intersect(sn.shs, si.shs)) AS DOUBLE)
             / (len(sn.shs) + len(si.shs) - len(list_intersect(sn.shs, si.shs))) AS jaccard
         FROM cand JOIN n2 sn ON sn.doc_id = new_id JOIN ix2 si ON si.doc_id = idx_id)
       SELECT new_id, idx_id, jaccard FROM verif WHERE jaccard >= $threshold"""

  // ---- simhash (wrapping-64 arithmetic via HUGEINT) -------------------

  private val K = "6364136223846793005" // MMIX LCG multiplier
  private val M64 = "18446744073709551616"

  /** multiply/rotate finalizer round: swap 32-bit halves, multiply. */
  private def finRound(h: String): String = {
    val rot = s"((($h) % 4294967296) * 4294967296 + (($h) // 4294967296))"
    s"(($rot) * $K) % $M64"
  }

  /** 64-bit token hash: LCG char fold + two finalizer rounds. */
  private def tok64Sql: String = {
    val fold =
      s"list_reduce(list_prepend(CAST(0 AS HUGEINT), [CAST(ord(t[i]) AS HUGEINT) for i in generate_series(1, length(t))]), (h, c) -> (h * $K + c) % $M64)"
    s"list_transform(toks, t -> ${finRound(finRound(fold))})"
  }

  /** simhash sign bits over the token-hash multiset. */
  private def sigBitsSql: String =
    (0 until 64).map { i =>
      val bit = s"CAST(${java.math.BigInteger.ONE.shiftLeft(i)} AS HUGEINT)"
      s"CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h // $bit) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN $bit ELSE CAST(0 AS HUGEINT) END"
    }.mkString(" + ")

  /** Per-document simhash as CTEs `<pfx>0..<pfx>3`, ending with
    * `(doc_id, sh64)` in signed-BIGINT form — the x10 chain's per-doc
    * head, exposed for composition (the x17 registry oracle joins it
    * beside the sentiment/langid/fingerprint chains). */
  private[graft] def simhashDocCtes(pfx: String): String =
    s"""${pfx}0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
       ${pfx}1 AS (SELECT doc_id, $tok64Sql AS th FROM ${pfx}0),
       ${pfx}2 AS (SELECT doc_id, CASE WHEN len(th) = 0 THEN CAST(0 AS HUGEINT) ELSE $sigBitsSql END AS sigu FROM ${pfx}1),
       ${pfx}3 AS (SELECT doc_id,
         CAST(sigu - CASE WHEN sigu >= CAST(9223372036854775808 AS HUGEINT) THEN CAST($M64 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sh64
         FROM ${pfx}2)"""

  def x10Sql(maxHamming: Int = 6, chunks: Int = 8, maxBucket: Int = 2000): String = {
    val bits = 64 / chunks
    val keys = (for { i <- 0 until chunks; j <- (i + 1) until chunks }
      yield s"($i, $j)").mkString(", ")
    // chunk divisors as literals: DuckDB's `**` binds tighter than `//`
    // would need AND returns DOUBLE — both fatal for exact bit slicing.
    val chunkList = (0 until chunks).map { c =>
      val div = java.math.BigInteger.ONE.shiftLeft(bits * c)
      s"CAST((sigu // CAST($div AS HUGEINT)) % ${1 << bits} AS BIGINT)"
    }.mkString("[", ", ", "]")
    s"""WITH t0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
       t1 AS (SELECT doc_id, $tok64Sql AS th FROM t0),
       t2 AS (SELECT doc_id, CASE WHEN len(th) = 0 THEN CAST(0 AS HUGEINT) ELSE $sigBitsSql END AS sigu FROM t1),
       t3 AS (SELECT doc_id,
                CAST(sigu - CASE WHEN sigu >= CAST(9223372036854775808 AS HUGEINT) THEN CAST($M64 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sig,
                $chunkList AS chunk FROM t2),
       banded AS (
         SELECT doc_id, sig, p.i * $chunks + p.j AS ck,
           chunk[p.i + 1] * ${1 << bits} + chunk[p.j + 1] AS cv
         FROM t3, (VALUES $keys) AS p(i, j)),
       ok AS (SELECT ck, cv FROM banded GROUP BY ck, cv HAVING count(*) BETWEEN 2 AND $maxBucket),
       pr AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sig, b.sig)) AS hamming
         FROM banded a
         JOIN banded b ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
         JOIN ok ON a.ck = ok.ck AND a.cv = ok.cv)
       SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pr WHERE hamming <= $maxHamming"""
  }

  /** x19: per-source corpus MinHash signature, comma-joined — the
    * element-wise min over every shingle hash the source contains. */
  def x19Sql: String = {
    val mins = DedupApprox.perms(64).map { case (a, b) =>
      s"CAST(coalesce(min(($a * h + $b) % $P), ${DedupApprox.EmptySentinel}) AS VARCHAR)"
    }.mkString(",\n      ")
    s"""WITH t0 AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       t1 AS (SELECT doc_id, source, $th31Sql AS th FROM t0),
       t2 AS (SELECT doc_id, source, ${shinglesSql(3)} AS shs FROM t1),
       hashes AS (SELECT source, unnest(shs) AS h FROM t2)
       SELECT source, array_to_string([$mins], ',') AS sig
       FROM hashes GROUP BY source"""
  }
}

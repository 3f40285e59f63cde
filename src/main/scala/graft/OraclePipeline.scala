package graft

/** DuckDB replay of [[graft.plans.CorpusPipeline]] END TO END — the
  * composition oracle. Each stage reuses the SQL formulation already
  * hash-proven by its component query (x05 langid, x06 quality, q47
  * repetition, q58 line rules, x18/q69 LSH pairs + components +
  * quality keeper via [[OracleLsh]], q54/q68 n-gram decontamination),
  * re-based onto the pipeline's cleaned-text column where the engine
  * does the same. The final funnel row is one row of BIGINTs — a
  * hash-match here certifies the whole recipe's composition, not just
  * its parts. q93 replays the INCREMENTAL form: the same scan-local
  * stages over the delta, x28's delta-vs-index band probe for the
  * standing matches, and the immutable-standing dedup policy. */
object OraclePipeline {

  private def toks(of: String) =
    s"""list_filter(regexp_split_to_array(lower($of), '[^a-z0-9'']+'), x -> length(x) > 0)"""

  /** q74: funnel counts for Config(lineRequireTerminalPunct = false),
    * bench = doc_id % 97 = 0, defaults otherwise. */
  def q74Sql: String = funnelSql(Seq.empty, 0L)

  /** q92: the extended recipe — q74's funnel plus the C4 bad-words
    * stage (Blocklist replay, exhaustive per-position comparison over
    * the CLEANED tokens) and the q91 entropy floor (integer micro-nat
    * comparison, no division). */
  def q92Sql(blockPhrases: Seq[Seq[String]],
             minEntropyMicroPerChar: Long): String =
    funnelSql(blockPhrases, minEntropyMicroPerChar)

  /** q101: q74's funnel plus the ExactSubstr-removal stage
    * (substrMinRun = 8) between dedup and decontamination — the
    * sliding 8-gram replay with the TRUE (doc_id, s) tuple winner
    * election (q100's convention: the engine's dupRunRewrite elects
    * by min(struct(doc_id, pos)), no packed-BIGINT assumption).
    * `v_substr` = the doc keeps at least one token after removal —
    * kept = len(toks) − covered positions, so the verdict needs only
    * the covered-position count, not the reassembled text. */
  def q101Sql: String = funnelSql(Seq.empty, 0L, substrMinRun = Some(8))

  /** The scan-local stage CTEs over `documents WHERE $rawWhere`:
    * C4 line rules (terminal-punct off) → cleaned/tk → x05 langid →
    * x06 quality → q47 repetition. Emits raw, ln, cleaned, tk, lg,
    * ql, rpb, rp. */
  private def scanCtes(rawWhere: String): String =
    s"""${lnCtes(rawWhere)},
       $scanTailCtes"""

  /** raw → C4-cleaned text (the `ln` CTE) — the split point for the
    * staged q93 replay, which materializes `ln` as a temp table. */
  private def lnCtes(rawWhere: String): String =
    s"""raw AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents WHERE $rawWhere),
       -- C4 line rules, terminal-punct off: keep lines with >= 3
       -- space-words and no blocklist hit; join survivors with \\n
       ln AS (
         SELECT doc_id,
           array_to_string(
             list_filter(string_split(text, chr(10)), l ->
               len(list_filter(regexp_split_to_array(trim(l), ' +'), w -> length(w) > 0)) >= 3
               AND NOT (contains(lower(trim(l)), 'javascript')
                        OR contains(lower(trim(l)), 'lorem ipsum')
                        OR contains(lower(trim(l)), '{'))),
             chr(10)) AS clean
         FROM raw)"""

  /** Everything downstream of `ln`: cleaned/tk plus the x05/x06/q47
    * verdict CTEs. */
  private def scanTailCtes: String =
    s"""cleaned AS (SELECT doc_id, clean AS text FROM ln),
       tk AS (SELECT doc_id, clean, ${toks("clean")} AS toks FROM ln),
       -- x05 langid over the cleaned text
       lg AS (
         SELECT doc_id,
           CASE WHEN best = 0 THEN 'und'
                WHEN s_it = best THEN 'it' WHEN s_fr = best THEN 'fr'
                WHEN s_es = best THEN 'es' WHEN s_en = best THEN 'en'
                ELSE 'de' END AS lang_pred
         FROM (
           SELECT doc_id, s_de, s_en, s_es, s_fr, s_it,
             greatest(s_de, s_en, s_es, s_fr, s_it) AS best
           FROM (
             SELECT doc_id,
               len(list_intersect(dtoks, ['der','die','und','das','ist','von','mit','den','nicht','ein'])) AS s_de,
               len(list_intersect(dtoks, ['the','and','of','to','in','is','that','it','for','with'])) AS s_en,
               len(list_intersect(dtoks, ['el','la','de','que','y','en','los','del','las','por'])) AS s_es,
               len(list_intersect(dtoks, ['le','la','les','de','des','et','est','une','dans','pour'])) AS s_fr,
               len(list_intersect(dtoks, ['il','di','che','la','per','con','del','una','sono','non'])) AS s_it
             FROM (SELECT doc_id, list_distinct(toks) AS dtoks FROM tk)))),
       -- x06 quality over the cleaned text
       ql AS (
         SELECT doc_id,
           CAST(n_toks AS BIGINT) AS q_n_tokens,
           CASE WHEN n_toks >= 5 AND (CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END) < 0.3
                 AND (CASE WHEN n_toks > 0 THEN tot_len / n_toks ELSE 0.0 END) BETWEEN 2.0 AND 12.0
                THEN 1.0 ELSE 0.0 END AS q_score
         FROM (
           SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS n_toks,
             CAST(length(clean) AS DOUBLE) AS n_chars,
             CAST(length(regexp_replace(clean, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
             CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) AS tot_len
           FROM tk)),
       -- q47 repetition over the cleaned text
       rpb AS (
         SELECT doc_id,
           CASE WHEN len(toks) > 0
             THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS dup_unigram_frac,
           CASE WHEN len(toks) >= 2
             THEN [toks[i] || ' ' || toks[i + 1] for i in generate_series(1, len(toks) - 1)]
             ELSE [] END AS bgs
         FROM tk),
       rp AS (
         SELECT b.doc_id, b.dup_unigram_frac,
           coalesce(t2b.top_bigram_frac, 0.0) AS top_bigram_frac
         FROM rpb b LEFT JOIN (
           SELECT doc_id, CAST(max(n) AS DOUBLE) / sum(n) AS top_bigram_frac
           FROM (SELECT doc_id, bg, count(*) AS n
                 FROM (SELECT doc_id, unnest(bgs) AS bg FROM rpb)
                 GROUP BY doc_id, bg)
           GROUP BY doc_id) t2b ON b.doc_id = t2b.doc_id)"""

  /** x09/x18/q69 machinery over `cleaned`: pairs → components →
    * quality keeper (score = q_n_tokens). Emits (among others) banded,
    * t2, pairs, dd(doc_id, v_dedup). */
  private def keeperCtes: String =
    s"""${OracleLsh.minhashPairsCtes(src = "cleaned")},
       $keeperTailCtes"""

  /** pairs + ql → per-doc keeper verdict (edges/reach/comp/wc/kp/dd):
    * factored out so the staged q93 replay can run it over
    * MATERIALIZED pairs inputs. */
  private def keeperTailCtes: String =
    s"""edges AS (
         SELECT id_a AS s, id_b AS d FROM pairs
         UNION SELECT id_b, id_a FROM pairs),
       reach(id, r) AS (
         SELECT s, s FROM edges
         UNION
         SELECT e.s, re.r FROM edges e JOIN reach re ON e.d = re.id),
       comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       wc AS (SELECT q.doc_id, coalesce(c.comp, q.doc_id) AS comp, q.q_n_tokens AS score
              FROM ql q LEFT JOIN comp c ON q.doc_id = c.id),
       kp AS (SELECT comp, doc_id AS keeper FROM (
                SELECT comp, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY comp ORDER BY score DESC, doc_id) AS rn
                FROM wc) WHERE rn = 1),
       dd AS (SELECT wc.doc_id, wc.doc_id = kp.keeper AS v_dedup
              FROM wc JOIN kp ON wc.comp = kp.comp)"""

  /** q54/q68 decontamination over the RAW text (n = 13) for docs in
    * `documents WHERE $ctWhere`; bench = doc_id % 97 = 0. Emits cm. */
  private def decontamCtes(ctWhere: String): String =
    s"""ct AS (
         SELECT doc_id, (doc_id % 97 = 0) AS bench, ${toks("COALESCE(text, '')")} AS toks
         FROM documents WHERE $ctWhere),
       cg AS (
         SELECT doc_id, bench, list_distinct(CASE WHEN len(toks) = 0 THEN []
           WHEN len(toks) < 13 THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(list_slice(toks, i, i + 12), ' ')
                 for i in generate_series(1, len(toks) - 12)] END) AS grams
         FROM ct),
       bgx AS (SELECT DISTINCT unnest(grams) AS gram FROM cg WHERE bench),
       tgx AS (SELECT doc_id, unnest(grams) AS gram FROM cg WHERE NOT bench),
       hits AS (SELECT doc_id, count(*) AS n FROM tgx JOIN bgx USING (gram) GROUP BY doc_id),
       cm AS (
         SELECT cg.doc_id, COALESCE(hits.n, 0) > 0 AS contaminated
         FROM cg LEFT JOIN hits ON cg.doc_id = hits.doc_id
         WHERE NOT cg.bench)"""

  private def cascadeSql(stages: Seq[String]): String =
    stages.zipWithIndex.map { case (s, i) =>
      val cond = stages.take(i + 1).mkString(" AND ")
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS after_$s"
    }.mkString(",\n         ")

  private def funnelSql(blockPhrases: Seq[Seq[String]],
                        minEntropyMicroPerChar: Long,
                        substrMinRun: Option[Int] = None): String = {
    val subCte = substrMinRun.fold("") { m =>
      s"""sgx AS (
           SELECT doc_id, unnest(CASE WHEN len(toks) >= $m
             THEN [{'s': i - 1,
                    'gram': array_to_string(list_slice(toks, i, i + ${m - 1}), ' ')}
                   for i in generate_series(1, len(toks) - ${m - 1})]
             ELSE [] END) AS u
           FROM tk),
         sg AS (SELECT doc_id, u.s AS s, u.gram AS gram FROM sgx),
         slos AS (SELECT doc_id, s FROM (
                    SELECT doc_id, s, row_number() OVER
                      (PARTITION BY gram ORDER BY doc_id, s) AS rn
                    FROM sg)
                  WHERE rn > 1),
         scov AS (SELECT DISTINCT doc_id, s + j AS p
                  FROM slos, generate_series(0, ${m - 1}) AS gs(j)),
         scnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cov
                  FROM scov GROUP BY doc_id),
         sub AS (SELECT tk.doc_id,
                   CAST(len(tk.toks) AS BIGINT) > COALESCE(scnt.n_cov, 0) AS v_substr
                 FROM tk LEFT JOIN scnt ON tk.doc_id = scnt.doc_id),"""
    }
    val subVerdict = substrMinRun.fold("")(_ => "sub.v_substr AS v_substr,")
    val subJoin = substrMinRun.fold("")(_ => " JOIN sub USING (doc_id)")
    val blCte = if (blockPhrases.isEmpty) "" else {
      val terms = blockPhrases.map { p =>
        p.foreach(t => require(t.matches("[a-z0-9']+"), s"bad token: $t"))
        val lit = s"[${p.map(t => s"'$t'").mkString(", ")}]"
        s"""CASE WHEN len(toks) >= ${p.length} THEN
              len(list_filter([i FOR i IN generate_series(1, len(toks) - ${p.length} + 1)],
                i -> toks[i:i + ${p.length} - 1] = $lit))
            ELSE 0 END"""
      }.mkString(" + ")
      s"""bl AS (SELECT doc_id, ($terms) AS n_matches FROM tk),"""
    }
    val entCte = if (minEntropyMicroPerChar <= 0L) "" else
      s"""enc AS (
           SELECT doc_id, unnest([clean[i] FOR i IN generate_series(1, length(clean))]) AS c
           FROM ln),
         ecnt AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM enc GROUP BY doc_id, c),
         en AS (
           SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
             CAST(sum(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS st
           FROM ecnt GROUP BY doc_id),"""
    val blVerdict = if (blockPhrases.isEmpty) ""
      else "bl.n_matches = 0 AS v_blocklist,"
    val entVerdict = if (minEntropyMicroPerChar <= 0L) ""
      else s"""COALESCE(en.n_chars
             * CAST(floor(ln(CAST(en.n_chars AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
             - en.st >= $minEntropyMicroPerChar * en.n_chars, TRUE) AS v_entropy,"""
    val blJoin = if (blockPhrases.isEmpty) "" else " JOIN bl USING (doc_id)"
    val entJoin = if (minEntropyMicroPerChar <= 0L) ""
      else " LEFT JOIN en USING (doc_id)"
    val stages = Seq("v_clean", "v_lang", "v_quality", "v_repetition") ++
      (if (blockPhrases.nonEmpty) Seq("v_blocklist") else Nil) ++
      (if (minEntropyMicroPerChar > 0L) Seq("v_entropy") else Nil) ++
      Seq("v_dedup") ++
      (if (substrMinRun.nonEmpty) Seq("v_substr") else Nil) ++
      Seq("v_decontam")
    s"""WITH RECURSIVE
       ${scanCtes("doc_id % 97 <> 0")},
       ${keeperCtes},
       ${decontamCtes("TRUE")},
       $blCte
       $entCte
       $subCte
       v AS (
         SELECT ln.doc_id,
           length(trim(ln.clean)) > 0 AS v_clean,
           lg.lang_pred = 'en' AS v_lang,
           ql.q_score = 1.0 AS v_quality,
           rp.dup_unigram_frac <= 0.3 AND rp.top_bigram_frac <= 0.18 AS v_repetition,
           $blVerdict
           $entVerdict
           $subVerdict
           dd.v_dedup AS v_dedup,
           NOT cm.contaminated AS v_decontam
         FROM ln
         JOIN lg USING (doc_id) JOIN ql USING (doc_id) JOIN rp USING (doc_id)
         JOIN dd USING (doc_id) JOIN cm USING (doc_id)$blJoin$entJoin$subJoin)
       SELECT
         CAST(count(*) AS BIGINT) AS input,
         ${cascadeSql(stages)}
       FROM v"""
  }

  /** q93: the incremental delta funnel. Delta = doc_id % 3 = 0 (non-
    * bench), standing = the rest (non-bench); the scan-local CTEs run
    * over the delta, the within-delta keeper is the q69 machinery,
    * standing matches come from x28's band probe (index-side-only
    * bucket cap) over BOTH sides' cleaned text, and
    * `v_dedup = no-standing-match AND delta-keeper` — the immutable-
    * standing policy. Decontamination sees bench ∪ delta only. */
  def q93Sql: String = {
    val deltaWhere = "doc_id % 3 = 0 AND doc_id % 97 <> 0"
    val standingWhere = "doc_id % 3 <> 0 AND doc_id % 97 <> 0"
    val stages = Seq("v_clean", "v_lang", "v_quality", "v_repetition",
      "v_dedup", "v_decontam")
    s"""WITH RECURSIVE
       ${scanCtes(deltaWhere)},
       ${keeperCtes},
       -- standing side: same C4 clean, then the x28 band chain
       sraw AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents WHERE $standingWhere),
       sln AS (
         SELECT doc_id,
           array_to_string(
             list_filter(string_split(text, chr(10)), l ->
               len(list_filter(regexp_split_to_array(trim(l), ' +'), w -> length(w) > 0)) >= 3
               AND NOT (contains(lower(trim(l)), 'javascript')
                        OR contains(lower(trim(l)), 'lorem ipsum')
                        OR contains(lower(trim(l)), '{'))),
             chr(10)) AS clean
         FROM sraw),
       scleaned AS (SELECT doc_id, clean AS text FROM sln),
       ${OracleLsh.sideCtesOver("s", "scleaned")},
       sok AS (SELECT band, bh FROM sbanded GROUP BY band, bh HAVING count(*) <= 500),
       xcand AS (
         SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS idx_id
         FROM banded n
         JOIN sbanded i ON n.band = i.band AND n.bh = i.bh
         JOIN sok ON i.band = sok.band AND i.bh = sok.bh),
       xverif AS (
         SELECT new_id, idx_id,
           CAST(len(list_intersect(sn.shs, si.shs)) AS DOUBLE)
             / (len(sn.shs) + len(si.shs) - len(list_intersect(sn.shs, si.shs))) AS jaccard
         FROM xcand JOIN t2 sn ON sn.doc_id = new_id JOIN s2 si ON si.doc_id = idx_id),
       xhits AS (SELECT DISTINCT new_id FROM xverif WHERE jaccard >= 0.5),
       ${decontamCtes(s"doc_id % 97 = 0 OR ($deltaWhere)")},
       v AS (
         SELECT ln.doc_id,
           length(trim(ln.clean)) > 0 AS v_clean,
           lg.lang_pred = 'en' AS v_lang,
           ql.q_score = 1.0 AS v_quality,
           rp.dup_unigram_frac <= 0.3 AND rp.top_bigram_frac <= 0.18 AS v_repetition,
           (xh.new_id IS NULL) AND dd.v_dedup AS v_dedup,
           NOT cm.contaminated AS v_decontam
         FROM ln
         JOIN lg USING (doc_id) JOIN ql USING (doc_id) JOIN rp USING (doc_id)
         JOIN dd USING (doc_id) JOIN cm USING (doc_id)
         LEFT JOIN xhits xh ON xh.new_id = ln.doc_id)
       SELECT
         CAST(count(*) AS BIGINT) AS input,
         ${cascadeSql(stages)}
       FROM v"""
  }

  /** q93 staged replay (round-14 VERDICT directive 2). Same math as
    * [[q93Sql]], decomposed into materialized temp-table stages so
    * DuckDB never holds the whole delta-vs-standing funnel's working
    * set in one query — the monolithic replay exhausts the allocator
    * at sf100 (5M docs) even with memory_limit=80GB + spill, because
    * the failing band-join/intersection operators don't spill.
    *
    * tools/check_oracle.py reads these from oracle_stages.json:
    * stage i is materialized as TEMP TABLE stage_q93_delta_funnel_<i>
    * (in order; later stages reference earlier ones), then the `main`
    * SQL — which only joins the narrow per-doc verdict stages — runs
    * in place of the monolithic oracle. Every SQL fragment is the
    * SAME builder output the monolithic form uses (lnCtes /
    * scanTailCtes / OracleLsh.shsChain / bandChain / pairsTailCtes /
    * keeperTailCtes / decontamCtes), so the two forms cannot drift:
    * hash-green at sf0.01 in the staged form certifies the
    * decomposition, hash-green at sf100 certifies the scale.
    *
    * Stage map (T = stage_q93_delta_funnel_):
    *  0 delta C4-cleaned text        (doc_id, clean)
    *  1 delta scan-local verdicts    (doc_id, v_clean, lang_pred,
    *                                  q_n_tokens, q_score,
    *                                  dup_unigram_frac, top_bigram_frac)
    *  2 delta shingle sets           (doc_id, shs)
    *  3 delta band keys              (doc_id, band, bh)
    *  4 within-delta keeper verdict  (doc_id, v_dedup)
    *  5 standing C4-cleaned text     (doc_id, clean)
    *  6 standing shingle sets        (doc_id, shs)
    *  7 standing band keys           (doc_id, band, bh)
    *  8 delta docs with a standing match (new_id)
    *  9 decontamination verdict      (doc_id, contaminated)
    */
  def q93Staged: (Seq[String], String) = {
    val T = "stage_q93_delta_funnel_"
    val deltaWhere = "doc_id % 3 = 0 AND doc_id % 97 <> 0"
    val standingWhere = "doc_id % 3 <> 0 AND doc_id % 97 <> 0"
    val stages = Seq(
      // 0: delta cleaned
      s"""WITH ${lnCtes(deltaWhere)}
         SELECT doc_id, clean FROM ln""",
      // 1: delta scan-local verdicts
      s"""WITH ln AS (SELECT doc_id, clean FROM ${T}0),
         $scanTailCtes
         SELECT ln.doc_id,
           length(trim(ln.clean)) > 0 AS v_clean,
           lg.lang_pred, ql.q_n_tokens, ql.q_score,
           rp.dup_unigram_frac, rp.top_bigram_frac
         FROM ln
         JOIN lg USING (doc_id) JOIN ql USING (doc_id) JOIN rp USING (doc_id)""",
      // 2: delta shingle sets
      s"""WITH cleaned AS (SELECT doc_id, clean AS text FROM ${T}0),
         ${OracleLsh.shsChain("t", "cleaned")}
         SELECT doc_id, shs FROM t2""",
      // 3: delta band keys
      s"""WITH ${OracleLsh.bandChain("t", s"${T}2")}
         SELECT doc_id, band, bh FROM tbanded""",
      // 4: within-delta keeper verdict (pairs tail + keeper tail over
      // the materialized band/shingle tables; ql from stage 1)
      s"""WITH RECURSIVE
         banded AS (SELECT * FROM ${T}3),
         t2 AS (SELECT * FROM ${T}2),
         ql AS (SELECT doc_id, q_n_tokens FROM ${T}1),
         ${OracleLsh.pairsTailCtes()},
         $keeperTailCtes
         SELECT doc_id, v_dedup FROM dd""",
      // 5: standing cleaned
      s"""WITH ${lnCtes(standingWhere)}
         SELECT doc_id, clean FROM ln""",
      // 6: standing shingle sets
      s"""WITH scleaned AS (SELECT doc_id, clean AS text FROM ${T}5),
         ${OracleLsh.shsChain("s", "scleaned")}
         SELECT doc_id, shs FROM s2""",
      // 7: standing band keys
      s"""WITH ${OracleLsh.bandChain("s", s"${T}6")}
         SELECT doc_id, band, bh FROM sbanded""",
      // 8: delta docs with a standing match (x28 band probe)
      s"""WITH sok AS (SELECT band, bh FROM ${T}7
                       GROUP BY band, bh HAVING count(*) <= 500),
         xcand AS (
           SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS idx_id
           FROM ${T}3 n
           JOIN ${T}7 i ON n.band = i.band AND n.bh = i.bh
           JOIN sok ON i.band = sok.band AND i.bh = sok.bh),
         xverif AS (
           SELECT new_id, idx_id,
             CAST(len(list_intersect(sn.shs, si.shs)) AS DOUBLE)
               / (len(sn.shs) + len(si.shs) - len(list_intersect(sn.shs, si.shs))) AS jaccard
           FROM xcand
           JOIN ${T}2 sn ON sn.doc_id = new_id
           JOIN ${T}6 si ON si.doc_id = idx_id)
         SELECT DISTINCT new_id FROM xverif WHERE jaccard >= 0.5""",
      // 9: decontamination verdict
      s"""WITH ${decontamCtes(s"doc_id % 97 = 0 OR ($deltaWhere)")}
         SELECT doc_id, contaminated FROM cm""")
    val funnelStages = Seq("v_clean", "v_lang", "v_quality",
      "v_repetition", "v_dedup", "v_decontam")
    val main =
      s"""SELECT
           CAST(count(*) AS BIGINT) AS input,
           ${cascadeSql(funnelStages)}
         FROM (
           SELECT sv.doc_id,
             sv.v_clean,
             sv.lang_pred = 'en' AS v_lang,
             sv.q_score = 1.0 AS v_quality,
             sv.dup_unigram_frac <= 0.3 AND sv.top_bigram_frac <= 0.18 AS v_repetition,
             (xh.new_id IS NULL) AND dd.v_dedup AS v_dedup,
             NOT cm.contaminated AS v_decontam
           FROM ${T}1 sv
           JOIN ${T}4 dd USING (doc_id)
           JOIN ${T}9 cm USING (doc_id)
           LEFT JOIN ${T}8 xh ON xh.new_id = sv.doc_id) v"""
    (stages, main)
  }
}

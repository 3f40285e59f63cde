package graft.functions

/** DuckDB replay of the FULL VADER + TextBlob scoring chain — the
  * rendered-artifact oracle discipline (the x14 rendered-hyperplanes
  * precedent applied to sentiment): the merged lexicon, booster
  * dictionary, negation list and idiom table render from the SAME
  * Scala source the engine scores with ([[VaderData]] /
  * [[LexiconPolarity]]) into DuckDB `map` literals, and the rule
  * engine itself — tokenization, the 3-token booster/negation window,
  * "never so/this", "without doubt", idiom overrides, least-damping,
  * the "but" clause re-weighting, punctuation emphasis and the
  * x/√(x²+α) normalization (Hutto & Gilbert, ICWSM-14) — replays as
  * SQL over the exploded token stream, operation-for-operation in the
  * Scala evaluation order so every double lands BIT-IDENTICAL
  * (IEEE-754 + and × are deterministic given operand order; every
  * constant renders as CAST('…' AS DOUBLE), both engines' correctly
  * rounded strtod).
  *
  * What this verifies: the whole rule ENGINE against an independent
  * executor. What it deliberately shares: the lexicon tables (data,
  * not logic — same stance as x14's hyperplanes and x09's rendered
  * MinHash parameters).
  */
object OracleSentiment {

  private def esc(s: String): String = s.replace("'", "''")

  /** Every float constant crosses as a string cast — DuckDB decimal
    * LITERALS would bind as DECIMAL and convert, not parse. */
  private def d(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  private def mapLit(entries: Seq[(String, Double)]): String = {
    val ks = entries.map { case (k, _) => s"'${esc(k)}'" }.mkString(", ")
    val vs = entries.map { case (_, v) => d(v) }.mkString(", ")
    s"map([$ks], [$vs])"
  }

  private def listLit(xs: Seq[String]): String =
    xs.map(x => s"'${esc(x)}'").mkString("[", ", ", "]")

  // rendered dictionaries, sorted for a stable SQL string
  private def lexMap = mapLit(VaderData.Lexicon.toSeq.sortBy(_._1))
  private def boostMap = mapLit(VaderData.Boosters.toSeq.sortBy(_._1))
  private def spMap = mapLit(VaderData.SpecialCases.toSeq.sortBy(_._1))
  private def negList = listLit(VaderData.Negate.toSeq.sorted)
  private def tbMap = mapLit(LexiconPolarity.Lexicon.toSeq.sortBy(_._1))
  private def intMap = mapLit(LexiconPolarity.Intensifiers.toSeq.sortBy(_._1))
  private def tbNegList = listLit(LexiconPolarity.Negators.toSeq.sorted)

  /** Vader.stripPunc's edge-char set as a trim() charset literal
    * (sorted — set semantics, order-free). */
  private def puncLit = "'" + esc(VaderData.PuncChars.toSeq.sorted.mkString) + "'"

  private val C = d(VaderData.CIncr)
  private val NS = d(VaderData.NScalar)
  private val BD = d(VaderData.BDecr)
  /** Vader.leastCheck consults Lexicon.contains("least") — a constant
    * of the rendered lexicon; bake it in. */
  private val lexHasLeast = VaderData.Lexicon.contains("least")

  // ---- SQL fragment helpers --------------------------------------------

  private def lexHas(k: String) = s"len(map_extract(mm.lexm, $k)) > 0"
  private def lexVal(k: String) = s"map_extract(mm.lexm, $k)[1]"
  private def boostVal(k: String) = s"map_extract(mm.boostm, $k)[1]"
  private def boostHas(k: String) = s"len(map_extract(mm.boostm, $k)) > 0"
  private def spVal(k: String) = s"map_extract(mm.spm, $k)[1]"
  private def negated(k: String) =
    s"(list_contains(mm.negl, $k) OR ends_with($k, 'n''t'))"
  /** Vader.isAllCaps: no lowercase letter, at least one letter. */
  private def allCaps(x: String) =
    s"""(NOT regexp_matches($x, '\\p{Ll}') AND regexp_matches($x, '\\p{L}'))"""

  /** scalarIncDec(words(j), v, capDiff) — the booster scalar whose
    * sign follows the CURRENT valence `v`, plus the caps kicker. */
  private def scalar(j: String, v: String): String =
    s"""CASE WHEN ${boostVal(s"lower(ws[$j])")} IS NULL THEN 0e0 ELSE
          (CASE WHEN $v < 0e0 THEN -${boostVal(s"lower(ws[$j])")}
                ELSE ${boostVal(s"lower(ws[$j])")} END)
          + (CASE WHEN capdiff AND ${allCaps(s"ws[$j]")}
               THEN (CASE WHEN $v > 0e0 THEN $C ELSE -$C END)
               ELSE 0e0 END)
        END"""

  /** The shared per-doc scoring chain over a `docs(doc_id, text)` CTE:
    * emits `vout(doc_id, neg, neu, pos, compound)` and
    * `tbout(doc_id, tbpol, tbsub)`. */
  private def chainCtes: String = {
    val leastGuard = if (lexHasLeast) "FALSE" else "TRUE"
    s"""mm AS (SELECT $lexMap AS lexm, $boostMap AS boostm, $negList AS negl,
           $spMap AS spm, $tbMap AS tblm, $intMap AS intm, $tbNegList AS tbnegl),
       -- ===== VADER: tokenize (split on \\s+, strip edge punctuation,
       -- keep tokens whose stripped form is <= 2 chars — emoticons) =====
       vtok AS (
         SELECT doc_id, text,
           list_transform(
             list_filter(str_split_regex(text, '\\s+'), x -> x <> ''),
             x -> CASE WHEN length(trim(x, $puncLit)) <= 2 THEN x
                       ELSE trim(x, $puncLit) END) AS ws
         FROM docs WHERE text IS NOT NULL AND text <> ''),
       vdoc AS (
         SELECT doc_id, ws, len(ws) AS nw,
           len(list_filter(ws, x -> ${allCaps("x")})) AS ncaps
         FROM vtok WHERE len(ws) > 0),
       vx AS (
         SELECT doc_id, ws, nw, (ncaps > 0 AND ncaps < nw) AS capdiff,
           u.i AS i, ws[u.i] AS item, lower(ws[u.i]) AS lw
         FROM vdoc, unnest(generate_series(1, nw)) AS u(i)),
       -- lexicon hit gated by booster/kind-of (Vader.polarityScores)
       vm AS (
         SELECT vx.*, ${lexVal("lw")} AS lexv,
           (${lexHas("lw")} AND NOT ${boostHas("lw")}
             AND NOT (lw = 'kind' AND i + 1 <= nw AND lower(ws[i+1]) = 'of'))
             AS matched
         FROM vx, mm),
       v0s AS (
         SELECT *, CASE WHEN matched
           THEN lexv + (CASE WHEN capdiff AND ${allCaps("item")}
                          THEN (CASE WHEN lexv > 0e0 THEN $C ELSE -$C END)
                          ELSE 0e0 END)
           ELSE 0e0 END AS v0
         FROM v0s_src),
       -- dist = 0 (j = i-1): booster scalar, then plain negation
       d0a AS (
         SELECT v0s.*,
           (matched AND i - 1 >= 1 AND NOT ${lexHas("lower(ws[i-1])")}) AS c0,
           CASE WHEN matched AND i - 1 >= 1 AND NOT ${lexHas("lower(ws[i-1])")}
             THEN v0 + (${scalar("i-1", "v0")}) ELSE v0 END AS va0
         FROM v0s, mm),
       d0b AS (
         SELECT d0a.*, CASE WHEN c0 AND ${negated("lower(ws[i-1])")}
           THEN va0 * $NS ELSE va0 END AS v1
         FROM d0a, mm),
       -- dist = 1 (j = i-2): 0.95-damped scalar, never-so/this,
       -- without-doubt, negation
       d1a AS (
         SELECT d0b.*,
           (matched AND i - 2 >= 1 AND NOT ${lexHas("lower(ws[i-2])")}) AS c1,
           CASE WHEN matched AND i - 2 >= 1 AND NOT ${lexHas("lower(ws[i-2])")}
             THEN v1 + (CASE WHEN (${scalar("i-2", "v1")}) <> 0e0
                          THEN (${scalar("i-2", "v1")}) * ${d(0.95)}
                          ELSE (${scalar("i-2", "v1")}) END)
             ELSE v1 END AS va1
         FROM d0b, mm),
       d1b AS (
         SELECT d1a.*, CASE
           WHEN NOT c1 THEN va1
           WHEN lower(ws[i-2]) = 'never'
             AND (lower(ws[i-1]) = 'so' OR lower(ws[i-1]) = 'this')
             THEN va1 * ${d(1.25)}
           WHEN lower(ws[i-2]) = 'without' AND lower(ws[i-1]) = 'doubt'
             THEN va1
           WHEN ${negated("lower(ws[i-2])")} THEN va1 * $NS
           ELSE va1 END AS v2
         FROM d1a, mm),
       -- dist = 2 (j = i-3): 0.9-damped scalar, the long-window
       -- never/without forms, negation, then the idiom table
       d2a AS (
         SELECT d1b.*,
           (matched AND i - 3 >= 1 AND NOT ${lexHas("lower(ws[i-3])")}) AS c2,
           CASE WHEN matched AND i - 3 >= 1 AND NOT ${lexHas("lower(ws[i-3])")}
             THEN v2 + (CASE WHEN (${scalar("i-3", "v2")}) <> 0e0
                          THEN (${scalar("i-3", "v2")}) * ${d(0.9)}
                          ELSE (${scalar("i-3", "v2")}) END)
             ELSE v2 END AS va2
         FROM d1b, mm),
       d2b AS (
         SELECT d2a.*,
           lower(ws[i-1]) || ' ' || lw AS p10,
           lower(ws[i-2]) || ' ' || lower(ws[i-1]) || ' ' || lw AS p210,
           lower(ws[i-2]) || ' ' || lower(ws[i-1]) AS p21,
           lower(ws[i-3]) || ' ' || lower(ws[i-2]) || ' ' || lower(ws[i-1]) AS p321,
           lower(ws[i-3]) || ' ' || lower(ws[i-2]) AS p32,
           CASE WHEN i + 1 <= nw THEN lw || ' ' || lower(ws[i+1]) END AS p01,
           CASE WHEN i + 2 <= nw
             THEN lw || ' ' || lower(ws[i+1]) || ' ' || lower(ws[i+2]) END AS p012,
           CASE
             WHEN NOT c2 THEN va2
             WHEN lower(ws[i-3]) = 'never'
               AND (lower(ws[i-2]) = 'so' OR lower(ws[i-2]) = 'this'
                 OR lower(ws[i-1]) = 'so' OR lower(ws[i-1]) = 'this')
               THEN va2 * ${d(1.25)}
             WHEN lower(ws[i-3]) = 'without'
               AND (lower(ws[i-2]) = 'doubt' OR lower(ws[i-1]) = 'doubt')
               THEN va2
             WHEN ${negated("lower(ws[i-3])")} THEN va2 * $NS
             ELSE va2 END AS vb2
         FROM d2a, mm),
       d2c AS (
         SELECT d2b.*, CASE WHEN NOT c2 THEN vb2 ELSE
           COALESCE(${spVal("p10")}, ${spVal("p210")}, ${spVal("p21")},
                    ${spVal("p321")}, ${spVal("p32")}, vb2) END AS vc2
         FROM d2b, mm),
       d2d AS (
         SELECT d2c.*,
           CASE WHEN c2 AND p01 IS NOT NULL
             THEN COALESCE(${spVal("p01")}, vc2) ELSE vc2 END AS vd2
         FROM d2c, mm),
       d2e AS (
         SELECT d2d.*,
           CASE WHEN c2 AND p012 IS NOT NULL
             THEN COALESCE(${spVal("p012")}, vd2) ELSE vd2 END AS ve2
         FROM d2d, mm),
       d2f AS (
         SELECT d2e.*,
           CASE WHEN c2 AND (${boostHas("p32")} OR ${boostHas("p21")})
             THEN ve2 + $BD ELSE ve2 END AS v3
         FROM d2e, mm),
       -- least-damping (Vader.leastCheck; 'least' in the lexicon is a
       -- render-time constant of the rendered table)
       lst AS (
         SELECT d2f.*, CASE
           WHEN NOT matched THEN v3
           WHEN i >= 3 AND lower(ws[i-1]) = 'least' AND $leastGuard
             THEN (CASE WHEN lower(ws[i-2]) <> 'at' AND lower(ws[i-2]) <> 'very'
                     THEN v3 * $NS ELSE v3 END)
           WHEN i = 2 AND lower(ws[i-1]) = 'least' THEN v3 * $NS
           ELSE v3 END AS v4
         FROM d2f),
       -- the 'but' clause re-weighting (first 'but', case-insensitive)
       bd AS (SELECT doc_id, min(i) AS bi FROM vx WHERE lw = 'but' GROUP BY doc_id),
       sent AS (
         SELECT l.doc_id, l.i, CASE WHEN b.bi IS NULL THEN v4
           WHEN l.i < b.bi THEN v4 * ${d(0.5)}
           WHEN l.i > b.bi THEN v4 * ${d(1.5)}
           ELSE v4 END AS sfin
         FROM lst l LEFT JOIN bd b USING (doc_id)),
       -- scoreValence: in-order folds (list_reduce — left fold, the
       -- Scala accumulation order), punctuation emphasis, normalize
       vagg AS (SELECT doc_id, list(sfin ORDER BY i) AS sl FROM sent GROUP BY doc_id),
       vpun AS (
         SELECT v.doc_id, v.sl,
           (length(d.text) - length(replace(d.text, '!', ''))) AS ep,
           (length(d.text) - length(replace(d.text, '?', ''))) AS qm
         FROM vagg v JOIN docs d USING (doc_id)),
       vsc AS (
         SELECT doc_id, sl,
           CAST(least(ep, 4) AS DOUBLE) * ${d(0.292)}
             + (CASE WHEN qm > 1 THEN (CASE WHEN qm <= 3
                  THEN CAST(qm AS DOUBLE) * ${d(0.18)} ELSE ${d(0.96)} END)
                ELSE 0e0 END) AS punct,
           list_reduce(list_prepend(0e0, sl), (a, b) -> a + b) AS sum0,
           list_reduce(list_prepend(0e0,
             list_transform(list_filter(sl, x -> x > 0e0), x -> x + 1e0)),
             (a, b) -> a + b) AS psum,
           list_reduce(list_prepend(0e0,
             list_transform(list_filter(sl, x -> x < 0e0), x -> x - 1e0)),
             (a, b) -> a + b) AS nsum,
           CAST(len(list_filter(sl, x -> x = 0e0)) AS DOUBLE) AS neu
         FROM vpun),
       vadj AS (
         SELECT doc_id,
           CASE WHEN sum0 > 0e0 THEN sum0 + punct
                WHEN sum0 < 0e0 THEN sum0 - punct ELSE sum0 END AS sum1,
           CASE WHEN psum > abs(nsum) THEN psum + punct ELSE psum END AS psum2,
           CASE WHEN psum < abs(nsum) THEN nsum - punct ELSE nsum END AS nsum2,
           neu
         FROM vsc),
       vtot AS (SELECT *, psum2 + abs(nsum2) + neu AS total FROM vadj),
       vnrm AS (
         SELECT *, sum1 / sqrt(sum1 * sum1 + ${d(15.0)}) AS rawn FROM vtot),
       vout AS (
         SELECT doc_id,
           floor((CASE WHEN total > 0e0 THEN abs(nsum2 / total) ELSE 0e0 END)
             * 1000e0 + 0.5e0) / 1000e0 AS neg,
           floor((CASE WHEN total > 0e0 THEN abs(neu / total) ELSE 0e0 END)
             * 1000e0 + 0.5e0) / 1000e0 AS neu,
           floor((CASE WHEN total > 0e0 THEN abs(psum2 / total) ELSE 0e0 END)
             * 1000e0 + 0.5e0) / 1000e0 AS pos,
           floor((CASE WHEN rawn < -1e0 THEN -1e0 WHEN rawn > 1e0 THEN 1e0
             ELSE rawn END) * 10000e0 + 0.5e0) / 10000e0 AS compound
         FROM vnrm),
       -- ===== TextBlob (pattern-en semantics, LexiconPolarity) =====
       ttok AS (
         SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
             x -> x <> '') AS tk
         FROM docs WHERE text IS NOT NULL AND text <> ''),
       ttx AS (
         SELECT doc_id, tk, u.i AS i, tk[u.i] AS w
         FROM ttok, unnest(generate_series(1, len(tk))) AS u(i)),
       tm AS (
         SELECT ttx.*, map_extract(mm.tblm, w)[1] AS p0,
           CASE WHEN i >= 2 THEN tk[i-1] END AS prev,
           CASE WHEN i >= 3 THEN tk[i-2] END AS prev2
         FROM ttx, mm),
       tm2 AS (
         SELECT tm.*,
           (prev IS NOT NULL AND (list_contains(mm.tbnegl, prev)
             OR ends_with(prev, 'n''t'))) AS negprev,
           (prev2 IS NOT NULL AND (list_contains(mm.tbnegl, prev2)
             OR ends_with(prev2, 'n''t'))) AS negprev2,
           CASE WHEN prev IS NOT NULL
             THEN map_extract(mm.intm, prev)[1] END AS im
         FROM tm, mm),
       tm3 AS (
         SELECT tm2.*,
           CASE WHEN p0 IS NULL THEN NULL
                WHEN prev IS NULL THEN p0
                WHEN negprev THEN p0 * ${d(-0.5)}
                WHEN im IS NOT NULL THEN
                  (CASE WHEN negprev2
                     THEN (CASE WHEN p0 * im < -1e0 THEN -1e0
                           WHEN p0 * im > 1e0 THEN 1e0
                           ELSE p0 * im END) * ${d(-0.5)}
                     ELSE (CASE WHEN p0 * im < -1e0 THEN -1e0
                           WHEN p0 * im > 1e0 THEN 1e0
                           ELSE p0 * im END) END)
                ELSE p0 END AS pc,
           (p0 IS NOT NULL AND prev IS NOT NULL AND NOT negprev
             AND im IS NOT NULL) AS hasint,
           (p0 IS NOT NULL AND prev IS NOT NULL AND im IS NOT NULL) AS cntint,
           CASE WHEN p0 IS NULL THEN NULL
             ELSE least(1e0, ${d(0.35)} + ${d(0.65)} * abs(p0)) END AS minterm
         FROM tm2),
       tba AS (
         SELECT doc_id,
           list_reduce(list_prepend(0e0, list(pc ORDER BY i)),
             (a, b) -> a + b) AS psum,
           list_reduce(list_prepend(0e0, flatten(list(
             CASE WHEN hasint THEN [${d(0.9)}, minterm]
                  ELSE [minterm] END ORDER BY i))),
             (a, b) -> a + b) AS ssum,
           CAST(sum(CASE WHEN hasint THEN 2 ELSE 1 END) AS BIGINT) AS n,
           CAST(sum(CASE WHEN cntint THEN 1 ELSE 0 END) AS BIGINT) AS nint
         FROM tm3 WHERE p0 IS NOT NULL GROUP BY doc_id),
       tbout AS (
         SELECT doc_id,
           psum / CAST(greatest(n - nint, 1) AS DOUBLE) AS tbpol,
           ssum / CAST(n AS DOUBLE) AS tbsub
         FROM tba)"""
  }

  /** Rewrite trick: `v0s` selects FROM `v0s_src` — alias the vm stage
    * so the chain text stays one template. */
  private def withChain(docsSel: String, tail: String): String =
    s"""WITH docs AS ($docsSel),
       ${chainCtes.replace("FROM v0s_src", "FROM vm")}
       $tail"""

  /** x01: per-document VADER struct + both TextBlob halves, raw text.
    * The COALESCE(…, 0e0) covers docs whose text yields no scored
    * tokens (absent from vout/tbout but scored 0.0 by the engine);
    * docs with NULL text must stay NULL instead — the engine's
    * nullSafeEval expressions return NULL for null input, and a
    * blanket coalesce would spuriously fail the compare on any corpus
    * carrying a null text row (0.0 vs NULL). */
  def x01Sql: String = withChain(
    "SELECT doc_id, text FROM documents",
    s"""SELECT d.doc_id,
         CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(v.neg, 0e0) END AS neg,
         CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(v.neu, 0e0) END AS neu,
         CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(v.pos, 0e0) END AS pos,
         CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(v.compound, 0e0) END AS compound,
         CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(t.tbpol, 0e0) END AS textblob_polarity,
         CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(t.tbsub, 0e0) END AS textblob_subjectivity
       FROM docs d
       LEFT JOIN vout v USING (doc_id)
       LEFT JOIN tbout t USING (doc_id)""")

  /** x17: the SQL-registration surface — every registered function's
    * output replayed by composing the already-hash-gated chains:
    * `vader_compound` via this object's VADER chain (vout.compound,
    * 0.0-coalesced — the registered UDF calls Vader.compound directly,
    * which scores null/empty/token-less text 0.0), `lang_id` via the
    * x05 top-list replay, `rolling_fp64` via the x08 HUGEINT fold,
    * `simhash64` via the x10 per-doc chain
    * ([[graft.OracleLsh.simhashDocCtes]]), `size(analyze_en(..))` via
    * the x21 tokenize/stop form (stemming preserves count, so no stem
    * map is needed), `size(minhash_sig(.., 16))` = 16 by construction
    * (the signature array is permutation-count-sized, sentinel-filled
    * for shingle-less docs), and `porter_stem('running')` as a
    * rendered one-token constant (independently certified by
    * tools/porter_probe.py). This was the last rows-only query with a
    * replayable surface. */
  def x17Sql: String = {
    val stops = graft.functions.Analyzer.StopWords.toSeq.sorted
      .map(s => s"'${esc(s)}'").mkString("[", ", ", "]")
    val stemLit = esc(Porter.stem("running"))
    val toks = "list_filter(regexp_split_to_array(lower(d.text), '[^a-z0-9'']+'), x -> length(x) > 0)"
    s"""WITH docs AS (SELECT doc_id, text FROM documents),
       ${chainCtes.replace("FROM v0s_src", "FROM vm")},
       lg1 AS (
         SELECT doc_id,
           list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> length(x) > 0)) AS dtoks
         FROM documents),
       lg2 AS (
         SELECT doc_id,
           len(list_intersect(dtoks, ['der','die','und','das','ist','von','mit','den','nicht','ein'])) AS s_de,
           len(list_intersect(dtoks, ['the','and','of','to','in','is','that','it','for','with'])) AS s_en,
           len(list_intersect(dtoks, ['el','la','de','que','y','en','los','del','las','por'])) AS s_es,
           len(list_intersect(dtoks, ['le','la','les','de','des','et','est','une','dans','pour'])) AS s_fr,
           len(list_intersect(dtoks, ['il','di','che','la','per','con','del','una','sono','non'])) AS s_it
         FROM lg1),
       lg3 AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_it) AS best FROM lg2),
       lg AS (
         SELECT doc_id,
           -- NULL text: every list op above yields NULL, so best IS
           -- NULL — map to 'und' like the engine's langIdOf(null)
           -- (otherwise every comparison is NULL and the CASE falls
           -- to ELSE 'de').
           CASE WHEN best IS NULL OR best = 0 THEN 'und'
                WHEN s_it = best THEN 'it' WHEN s_fr = best THEN 'fr'
                WHEN s_es = best THEN 'es' WHEN s_en = best THEN 'en'
                ELSE 'de' END AS lang_pred
         FROM lg3),
       fp1 AS (
         SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS s FROM documents),
       fp2 AS (
         SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS HUGEINT),
               [CAST(ord(s[i]) AS HUGEINT) for i in generate_series(1, length(s))]),
             (h, c) -> (h * 31 + c) % CAST(18446744073709551616 AS HUGEINT)) AS hu
         FROM fp1),
       fp AS (
         -- NULL text: hu is NULL — map to 0 like the engine's
         -- fingerprintOf(null) = 0L.
         SELECT doc_id,
           COALESCE(CAST(hu - CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT)
             THEN CAST(18446744073709551616 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT), 0) AS fp64
         FROM fp2),
       ${graft.OracleLsh.simhashDocCtes("sh")}
       SELECT d.doc_id,
         COALESCE(v.compound, 0e0) AS compound,
         '$stemLit' AS stem,
         lg.lang_pred,
         fp.fp64,
         sh3.sh64,
         CASE WHEN d.text IS NULL THEN 0
           ELSE CAST(len(list_filter($toks, x -> NOT list_contains($stops, x))) AS INT) END AS n_terms,
         CAST(16 AS INT) AS sig_len
       FROM docs d
       LEFT JOIN vout v USING (doc_id)
       JOIN lg USING (doc_id)
       JOIN fp USING (doc_id)
       JOIN sh3 USING (doc_id)"""
  }

  /** x02: the flagship histogram — sanitize (NUL-strip + trim),
    * truncate to 500 chars, score, average the two engines, ±0.1
    * trichotomy, count. `textblob_polarity` here is
    * LexiconPolarity.polarity — algebraically the SAME value as
    * sentiment().polarity (pSum over matched tokens divided by the
    * matched count; the subjectivity-side intensifier double-count
    * cancels out of the polarity denominator), so the chain's tbpol
    * replays it exactly. */
  def x02Sql: String = withChain(
    """SELECT doc_id,
         substr(trim(replace(text, chr(0), '')), 1, 500) AS text
       FROM documents
       WHERE text IS NOT NULL AND length(text) > 0
         AND length(trim(substr(trim(replace(text, chr(0), '')), 1, 500))) > 0""",
    s"""SELECT overall, CAST(count(*) AS BIGINT) AS doc_count FROM (
         SELECT CASE
             WHEN (COALESCE(v.compound, 0e0) + COALESCE(t.tbpol, 0e0)) / 2e0
               >= ${d(0.1)} THEN 'positive'
             WHEN (COALESCE(v.compound, 0e0) + COALESCE(t.tbpol, 0e0)) / 2e0
               <= -${d(0.1)} THEN 'negative'
             ELSE 'neutral' END AS overall
         FROM docs d
         LEFT JOIN vout v USING (doc_id)
         LEFT JOIN tbout t USING (doc_id))
       GROUP BY overall""")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the AllPairs /
  * PPJoin family — Bayardo et al. 2007, Xiao et al. 2008).
  *
  * [[DedupApprox.jaccardPairs]] (x11) finds Jaccard pairs through an
  * inverted-index join but CAPS posting lists (`maxNgramDf`) to bound
  * the quadratic term — pairs that share only hot shingles are lost.
  * This operator keeps the guarantee instead: every pair with
  * J(x,y) ≥ τ is emitted, no recall caveat, and the candidate volume
  * is bounded by PREFIXES rather than by dropping data.
  *
  * How: order each document's shingle set canonically by (global
  * document frequency ASC, shingle ASC) — rarest first. If
  * J(x,y) ≥ τ then |x∩y| ≥ τ·max(|x|,|y|) (since the union is at
  * least the larger set), and by the prefix-filter lemma the first
  * `|x| − ceil(τ·|x|) + 1` shingles of BOTH sets must share an
  * element. So candidates come from joining only on prefix shingles
  * — the ~(1−τ) rarest fraction of each set — and rare-first
  * ordering keeps those join buckets small by construction: a
  * shingle's bucket is at most its df, and high-df shingles are
  * pushed out of prefixes.
  *
  * At 100 TB: two shuffles build the canonical order (df count, then
  * regroup by id), one shuffle joins prefixes, and the verify step is
  * per-candidate-pair work. Nothing is all-pairs and nothing is
  * dropped; the worst case (many sets genuinely sharing rare
  * shingles) is exactly the case where the pairs are real output.
  * The threshold is a rational `num/den` and all pruning comparisons
  * are integer cross-multiplications — no float boundary cases, and
  * the DuckDB oracle replays the brute-force definition exactly.
  */
object SetJoin {

  /** Canonically-ordered shingle sets: (id, toks, n) with `toks`
    * sorted rarest-first by (global df, shingle). */
  private[graft] def canonicalSets(df: DataFrame, idCol: String,
                                       textCol: String,
                                       shingleN: Int): DataFrame = {
    val base = df
      .select(col(idCol).as("id"),
        DedupApprox.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val posts = base.select(col("id"), explode(col("sh")).as("ng"))
    val dfs = posts.groupBy("ng").agg(count(lit(1)).as("ng_df"))
    posts.join(dfs, "ng")
      .groupBy("id")
      .agg(transform(
        sort_array(collect_list(struct(col("ng_df"), col("ng")))),
        x => x.getField("ng")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
  }

  /** All pairs with shingle-set Jaccard ≥ num/den. Output columns:
    * (id_a, id_b, inter, uni, jac_micro), id_a < id_b. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0,1]")
    // materialize once: the sets subtree is referenced three times
    // (prefix explode + two joins back) and would otherwise re-run
    // its tokenize+df build per reference (plan-audited at round 10)
    val sets = canonicalSets(df, idCol, textCol, shingleN).localCheckpoint()
    // prefix length: n − ceil(num·n/den) + 1, in integer arithmetic
    val prefLen = (col("n") -
      expr(s"(${num}L * n + ${den - 1}L) div ${den}L") + lit(1L)).cast("int")
    // candidate generation runs on BARE (id, prefix-shingle, n) rows —
    // the shingle arrays never ride the self-join shuffle; they are
    // joined back only onto the DEDUPED candidate pairs
    val pref = sets.select(col("id"), col("n"),
      explode(slice(col("toks"), lit(1), prefLen)).as("ptok"))
    val candIds = pref.as("a").join(pref.as("b"),
        col("a.ptok") === col("b.ptok") && col("a.id") < col("b.id"))
      .filter( // length filter: num·max ≤ den·min rules the pair out early
        lit(num.toLong) * greatest(col("a.n"), col("b.n")) <=
          lit(den.toLong) * least(col("a.n"), col("b.n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val cand = candIds
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta"),
        col("n").as("na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb"),
        col("n").as("nb")), "id_b")
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("long")
    cand
      .withColumn("inter", inter)
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        floor(col("inter").cast("double") / col("uni").cast("double")
          * 1e6 + 0.5).cast("long").as("jac_micro"))
  }
}

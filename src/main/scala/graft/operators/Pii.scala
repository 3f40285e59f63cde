package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the standard pretraining-corpus
  * scrub (emails, IPv4 addresses, phone-like digit runs) as pure
  * native column expressions: codegen'd regexp over the scan, zero
  * shuffles, so at 100 TB it is bandwidth-bound like any other
  * filter stage.
  *
  * Stages apply in a fixed order (email → ip → phone) and each
  * stage counts matches on the text AS ALREADY REDACTED by the
  * previous stages. That makes the per-class counts well-defined
  * even where patterns overlap (an IPv4 is also a phone-like digit
  * run): each character is attributed to exactly one class, the
  * first stage that claims it.
  *
  * The patterns avoid alternation, backreferences, and lookaround,
  * so the same strings mean the same thing to Java's regex engine
  * (Spark codegen) and RE2 (DuckDB oracle) — leftmost-greedy on
  * these constructs is identical in both.
  */
object Pii {

  /** (class name, pattern, replacement token), applied in order. */
  val Stages: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+?[0-9][0-9(). -]{6,}[0-9]", "<PHONE>"))

  /** Chained redaction: text with every stage's matches replaced by
    * its token, in stage order. */
  def redact(text: Column): Column =
    Stages.foldLeft(coalesce(text, lit(""))) { case (t, (_, pat, tok)) =>
      regexp_replace(t, lit(pat), lit(tok))
    }

  /** Per-document scrub report: match count per class (counted
    * post-previous-redactions, see class doc), plus the redacted
    * text's length and md5 so the full output is hash-checkable
    * without shipping the text.
    *
    * One projection over the scan; Spark's subexpression elimination
    * shares the intermediate redacted-text expressions across the
    * count and replace uses inside the generated code.
    */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val (cols, redacted) =
      Stages.foldLeft((Vector.empty[Column], t0)) {
        case ((acc, t), (name, pat, tok)) =>
          (acc :+ regexp_count(t, lit(pat)).cast("long").as(s"n_$name"),
           regexp_replace(t, lit(pat), lit(tok)))
      }
    df.select(
      (col(idCol) +: cols) ++ Seq(
        length(redacted).cast("long").as("red_len"),
        md5(redacted.cast("binary")).as("red_md5")): _*)
  }

  /** K-ANONYMITY report (Sweeney 2002) — the aggregate governance
    * gate next to the per-record PII scan: group by the
    * quasi-identifier columns and report each equivalence class's
    * size plus its verdict (`size ≥ k`). A release ships only if
    * every class passes; the failing classes ARE the suppression
    * work-list. One map-side-combined groupBy — the corpus never
    * shuffles rows, only (QI-tuple, count) partials. */
  def kAnonymityClasses(df: DataFrame, k: Long,
                        quasiIds: Seq[String]): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("anonymous", col("class_size") >= k)

  /** L-DIVERSITY classes (Machanavajjhala 2007) — k-anonymity's
    * stronger sibling: a class of k identical rows still leaks if
    * they all share one SENSITIVE value, so each QI class must hold
    * at least `l` distinct sensitive values. Same one-groupBy shape
    * (count + exact distinct per class). */
  def lDiversityClasses(df: DataFrame, l: Long, quasiIds: Seq[String],
                        sensitiveCol: String): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)

  /** T-CLOSENESS classes (Li, Li & Venkatasubramanian 2007) — the
    * third rung of the governance ladder: l-diversity counts distinct
    * sensitive values but ignores their DISTRIBUTION (a class that is
    * 99% one diagnosis "has" 2 values yet still leaks). t-closeness
    * bounds the Earth Mover's Distance between each class's sensitive
    * distribution and the global one. For an ORDERED sensitive
    * attribute over m bins, EMD = Σ_j |P_cum(j) − Q_cum(j)| / (m−1).
    *
    * Exactness: every cumulative term is kept integral by
    * cross-multiplying — term_j = |cum_class_j·N − cum_global_j·s| —
    * and the verdict compares `Σterm·den ≤ num·N·s·(m−1)` in integers;
    * only the reported `emd_micro` takes one double division.
    * Overflow headroom (cf. Graph.scala): terms are ≤ s·N and the
    * verdict multiplies by den, so den·m·s_max·N < 2⁶³ must hold —
    * at 1e12 rows bin the sensitive domain coarsely or shard by a
    * partition column first (the report is per-release, not global).
    *
    * Shape: two grouped counts over the data (map-side combined), a
    * broadcastable domain-sized global-bin table, and a classes×bins
    * grid for the cumulative walk — the corpus itself never shuffles
    * rows. The grid requires a BOUNDED bin domain; that is what
    * "binned sensitive attribute" means in a governance report.
    */
  def tClosenessClasses(df: DataFrame, num: Long, den: Long,
                        quasiIds: Seq[String],
                        sensitiveCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qis = quasiIds.map(col)
    val sv = col(sensitiveCol)
    val g = df.groupBy(sv.as("__bin")).agg(count(lit(1)).as("__gc"))
    val gg = g.select(col("__bin"),
      sum(col("__gc")).over(Window.orderBy(col("__bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("__cum_gc"))
    val tot = g.agg(sum(col("__gc")).as("__N"),
      count(lit(1)).as("__m"))
    val sizes = df.groupBy(qis: _*).agg(count(lit(1)).as("class_size"))
    val cc = df.groupBy(qis :+ sv.as("__bin"): _*)
      .agg(count(lit(1)).as("__c"))
    val grid = sizes.crossJoin(broadcast(gg))
      .join(cc, quasiIds :+ "__bin", "left")
      .withColumn("__cum_cc",
        sum(coalesce(col("__c"), lit(0L))).over(
          Window.partitionBy(qis: _*).orderBy(col("__bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    grid
      .withColumn("__term",
        abs(col("__cum_cc") * col("__N") - col("__cum_gc") * col("class_size")))
      .groupBy(qis :+ col("class_size") :+ col("__N") :+ col("__m"): _*)
      .agg(sum(col("__term")).as("__emd_num"))
      .withColumn("__denom",
        col("__N") * col("class_size") * greatest(col("__m") - 1L, lit(1L)))
      .select(qis ++ Seq(
        col("class_size"),
        floor(col("__emd_num").cast("double") / col("__denom").cast("double")
          * 1e6 + 0.5).cast("long").as("emd_micro"),
        (col("__emd_num") * den <= col("__denom") * num).as("close")): _*)
  }

  /** The one-row gate summary: classes/rows below `k`, and whether
    * the table is k-anonymous. */
  def kAnonymityReport(df: DataFrame, k: Long,
                       quasiIds: Seq[String]): DataFrame =
    kAnonymityClasses(df, k, quasiIds).agg(
      count(lit(1)).as("n_classes"),
      sum(when(!col("anonymous"), 1L).otherwise(0L)).as("classes_at_risk"),
      sum(when(!col("anonymous"), col("class_size")).otherwise(0L))
        .as("rows_at_risk"),
      (sum(when(!col("anonymous"), 1L).otherwise(0L)) === 0L)
        .as("k_anonymous"))
}

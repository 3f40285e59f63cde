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

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl text extraction — the WET/CCNet step UPSTREAM of every
  * other corpus stage: strip script/style/comment blocks, drop tags,
  * decode the common entities, collapse whitespace. A fixed chain of
  * codegen'd `regexp_replace` over the scan: zero shuffles, bandwidth
  * bound, the same execution shape as [[Pii.redact]].
  *
  * Parity discipline (the Pii RE2-compatibility contract): every
  * pattern avoids alternation, backreferences, and lookaround; the
  * only flags are `(?is)` (dotall + case-fold) and non-greedy `.*?`,
  * which match leftmost-shortest identically in Java's engine (Spark
  * codegen) and RE2 (DuckDB — whose `regexp_replace` needs the
  * explicit `'g'` option the oracle passes). Entity decode order is
  * the standard one: named/numeric entities first, `&amp;` LAST so
  * double-encoded text does not double-decode. */
object TextExtract {

  /** (pattern, replacement), applied in order. */
  val Stages: Seq[(String, String)] = Seq(
    ("(?is)<script[^>]*>.*?</script>", " "),
    ("(?is)<style[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("<[^>]+>", " "),      // any remaining tag separates words
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&#39;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
    ("[ \\t\\r\\n]+", " "))

  /** Extracted plain text: the stage chain then a trim. */
  def extractText(html: Column): Column =
    trim(Stages.foldLeft(coalesce(html, lit(""))) {
      case (c, (pat, rep)) => regexp_replace(c, lit(pat), lit(rep))
    })
}

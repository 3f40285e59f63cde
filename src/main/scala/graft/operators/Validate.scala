package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Validation / sanitization operators.
  *
  * Reference semantics (SURVEY.md §2 F-1/F-2/F-5, X-8/X-9):
  * utilities/data_validator.py:8-33 drops an article unless `title`,
  * `url`, `publishedAt` are all present and non-empty AND `url` matches
  * an `https?://...` regex (re.match ⇒ anchored at start);
  * data_validator.py:36-44 strips NUL bytes and surrounding whitespace
  * from every string field; mongodb_consumer.py:42-48 drops messages
  * missing the envelope keys.
  *
  * All operators are pure `DataFrame => DataFrame` column transforms —
  * they stay inside whole-stage codegen and push down to the scan.
  */
object Validate {

  /** data_validator.py:15-17 — `re.match` anchors at the start only. */
  val UrlRegex: String = "^https?://(?:[-\\w.])+(?:[:\\d]+)?(?:/[\\w/_.\\-%~?=&#]*)?"

  def urlIsValid(c: Column): Column = c.isNotNull && c.rlike(UrlRegex)

  private def presentNonEmpty(c: Column): Column =
    c.isNotNull && length(c) > 0

  /** F-1: keep rows whose required string fields are present & non-empty
    * and whose `urlCol` matches the URL regex. */
  def requiredFields(df: DataFrame, urlCol: String, required: String*): DataFrame = {
    val checks = required.map(n => presentNonEmpty(col(n))) :+ urlIsValid(col(urlCol))
    df.filter(checks.reduce(_ && _))
  }

  /** X-9: `value.replace('\x00','').strip()` for one column. */
  def sanitizeCol(c: Column): Column = trim(translate(c, "\u0000", ""))

  /** F-2: apply the NUL-strip + trim sanitizer to every string column
    * (data_validator.py:39-43 iterates all keys generically). */
  def sanitize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) sanitizeCol(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** F-5: envelope shape guard — both keys present (consumer:42-48). */
  def envelopeGuard(df: DataFrame, keys: String*): DataFrame =
    df.filter(keys.map(k => col(k).isNotNull).reduce(_ && _))
}

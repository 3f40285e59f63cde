package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Analyzer, Porter}

/** DuckDB replay of the ES english-analyzer chain (x03/x04) — the
  * rendered-artifact oracle for the Porter stage: the tokenizer and
  * stop filter replay as SQL string/list ops (the x21 oracle, already
  * hash-gated), and the STEM MAP of every distinct post-stop corpus
  * token renders from [[Porter]] into a DuckDB `map` literal — the
  * same stance as x14's rendered hyperplanes: the table is DATA
  * produced by the Scala source, the pipeline around it (tokenize →
  * stop → per-token map in order → join / distinct-intersect → rank)
  * is what the oracle independently executes. Porter's rule engine
  * itself is pinned by AnalyzerSpec's published-paper vectors.
  *
  * Corpus-dependent by construction, so the SQL is generated at
  * Verify time from the ACTIVE session + sf dir ([[sfDir]] is set by
  * Verify/VerifySubset before the oracle dump); when either is
  * missing the entries are omitted and x03/x04 degrade to the
  * rows-only check they had before round 12. A token missing from the
  * map (a corpus regen mid-round) maps to NULL and fails the compare
  * LOUDLY rather than silently diverging.
  */
object OracleAnalyzer {

  @volatile var sfDir: Option[String] = None

  private def esc(s: String): String = s.replace("'", "''")

  private def listLit(xs: Seq[String]): String =
    xs.map(x => s"'${esc(x)}'").mkString("[", ", ", "]")

  private def stemMapLit(pairs: Seq[(String, String)]): String = {
    val ks = pairs.map { case (k, _) => s"'${esc(k)}'" }.mkString(", ")
    val vs = pairs.map { case (_, v) => s"'${esc(v)}'" }.mkString(", ")
    s"map([$ks], [$vs])"
  }

  private def stopsLit: String = listLit(Analyzer.StopWords.toSeq.sorted)

  /** tokenize → stop-filter as a SQL list expression (the x21 form). */
  private def noStopToks(textCol: String): String =
    s"""list_filter(
          list_filter(regexp_split_to_array(lower($textCol), '[^a-z0-9'']+'),
            x -> length(x) > 0),
          x -> NOT list_contains($stopsLit, x))"""

  /** The distinct post-stop corpus vocabulary with its Porter stems,
    * rendered. One column-pruned job over `documents`. */
  private def stemPairs(spark: SparkSession, dir: String): Seq[(String, String)] =
    graft.sources.Tables.documents(spark, dir)
      .select(explode(Analyzer.tokensNoStop(col("text"))).as("t"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
      .map(t => t -> Porter.stem(t))

  private def x03Sql(pairs: Seq[(String, String)]): String =
    s"""WITH sm AS (SELECT ${stemMapLit(pairs)} AS m)
       SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
           -- Spark array_join([]) = '' but DuckDB array_to_string([])
           -- is NULL — coalesce restores the all-stopwords/empty case
           ELSE COALESCE(array_to_string(
             list_transform(${noStopToks("text")},
               x -> map_extract(sm.m, x)[1]), ' '), '') END AS terms
       FROM documents, sm"""

  private def x04Sql(pairs: Seq[(String, String)]): String = {
    // the query string's analyzed terms are a compile-time constant of
    // the SAME chain the engine applies driver-side
    val qTerms = "sorted merging windows".toLowerCase
      .split("[^a-z0-9']+").toSeq
      .filter(t => t.nonEmpty && !Analyzer.StopWords(t))
      .map(Porter.stem).distinct
    s"""WITH sm AS (SELECT ${stemMapLit(pairs)} AS m),
       sc AS (
         SELECT doc_id,
           CAST(len(list_intersect(
             list_distinct(list_transform(${noStopToks("text")},
               x -> map_extract(sm.m, x)[1])),
             ${listLit(qTerms)})) AS INT) AS score
         FROM documents, sm),
       top AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50)
       SELECT doc_id, score FROM top WHERE score > 0"""
  }

  /** The x03/x04 oracle entries, or empty when no session/dir is
    * available to render the vocabulary from. */
  def entries: Map[String, String] =
    (SparkSession.getActiveSession, sfDir) match {
      case (Some(s), Some(d)) =>
        val pairs = stemPairs(s, d)
        Map("x03_analyze_tokens" -> x03Sql(pairs),
            "x04_analyzed_search" -> x04Sql(pairs))
      case _ => Map.empty
    }
}

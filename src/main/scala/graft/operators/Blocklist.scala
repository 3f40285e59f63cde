package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Multi-pattern phrase blocklist — the C4 §2.2 "bad words" gate
  * (Raffel et al. 2020 drop any page containing a listed phrase)
  * generalized to token-sequence patterns, matched by the
  * Aho–Corasick automaton (Aho & Corasick 1975) over the analyzer
  * token stream: ALL p patterns are matched in ONE left-to-right pass
  * per document, whatever p is.
  *
  * Why a UDF and not Column expressions (the documented exception,
  * like DedupApprox's minhash kernel): the automaton is a per-token
  * STATE MACHINE — goto/failure transitions have no expression-tree
  * form, and the Column alternatives are p `regexp_count` passes or a
  * p-way join, both of which re-scan the text per pattern. One UDF
  * pass is O(tokens + matches) per doc regardless of pattern count.
  *
  * Scale shape: the automaton is built from the pattern list (model
  * artifact, total-pattern-tokens-sized) and ships in the task
  * closure; matching is scan-local — the result is per-doc with ZERO
  * shuffles at any corpus size (plan-asserted in BlocklistSpec).
  * Match semantics: every (pattern, start-position) occurrence
  * counts, including overlapping and nested matches — the exhaustive
  * count the oracle replays position by position.
  */
object Blocklist {

  /** Token-level Aho–Corasick. Built lazily on first use on each
    * executor (the trie/failure arrays are @transient; only the
    * pattern list serializes). */
  private final class Ac(patterns: Array[Array[String]])
      extends Serializable {
    @transient private lazy val (children, fail, outCount, outIds) = {
      val ch = mutable.ArrayBuffer(mutable.Map.empty[String, Int])
      val ends = mutable.ArrayBuffer[List[Int]](Nil)
      patterns.zipWithIndex.foreach { case (p, pid) =>
        var n = 0
        p.foreach { t =>
          n = ch(n).getOrElseUpdate(t, {
            ch += mutable.Map.empty; ends += Nil; ch.size - 1
          })
        }
        ends(n) = pid :: ends(n)
      }
      val fl = Array.fill(ch.size)(0)
      val bfs = mutable.Queue.empty[Int]
      ch(0).valuesIterator.foreach(v => bfs.enqueue(v))
      while (bfs.nonEmpty) {
        val u = bfs.dequeue()
        ch(u).foreach { case (tok, v) =>
          bfs.enqueue(v)
          var f = fl(u)
          while (f != 0 && !ch(f).contains(tok)) f = fl(f)
          fl(v) = if (ch(f).contains(tok) && ch(f)(tok) != v) ch(f)(tok)
                  else 0
        }
      }
      // Output sets follow failure links; memoized in BFS order
      // (fail(v) is always processed before v).
      val oc = Array.fill(ch.size)(0)
      val oi = Array.fill[List[Int]](ch.size)(Nil)
      val order = mutable.ArrayBuffer(0)
      var i = 0
      while (i < order.size) {
        ch(order(i)).valuesIterator.foreach(v => order += v); i += 1
      }
      order.foreach { v =>
        oc(v) = ends(v).size + oc(fl(v))
        oi(v) = ends(v) ::: oi(fl(v))
      }
      (ch.map(_.toMap).toArray, fl, oc, oi)
    }

    /** (total occurrences, distinct patterns hit) over one doc. */
    def run(toks: Seq[String]): (Long, Long) = {
      val hit = new Array[Boolean](patterns.length)
      var total = 0L
      var s = 0
      toks.foreach { tok =>
        while (s != 0 && !children(s).contains(tok)) s = fail(s)
        s = children(s).getOrElse(tok, 0)
        total += outCount(s)
        outIds(s).foreach(hit(_) = true)
      }
      (total, hit.count(identity).toLong)
    }
  }

  /** The match kernel as a bare column over a text column — for
    * verdict-columns composition (CorpusPipeline's C4 bad-words
    * stage): a struct `(n_matches, n_patterns_hit)` computed in the
    * same single scan-local automaton pass as [[phraseMatches]]. */
  def matchColumn(text: org.apache.spark.sql.Column,
                  patterns: Seq[Seq[String]]): org.apache.spark.sql.Column = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty token sequences")
    val ac = new Ac(patterns.map(_.toArray).toArray)
    val m = udf { (toks: Seq[String]) => ac.run(toks) }
    m(Analyzer.tokenize(coalesce(text, lit(""))))
  }

  /** Per-doc blocklist report: `(doc_id, n_tokens, n_matches,
    * n_patterns_hit)` — total pattern occurrences (overlaps and
    * nestings counted) and distinct patterns present. Gate with
    * `n_matches > 0` for the C4 drop semantics. */
  def phraseMatches(df: DataFrame, idCol: String, textCol: String,
                    patterns: Seq[Seq[String]]): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty token sequences")
    val ac = new Ac(patterns.map(_.toArray).toArray)
    val m = udf { (toks: Seq[String]) => ac.run(toks) }
    df.select(col(idCol).as("doc_id"),
        Analyzer.tokenize(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        m(col("__t")).as("__m"))
      .select(col("doc_id"), col("n_tokens"),
        col("__m._1").as("n_matches"),
        col("__m._2").as("n_patterns_hit"))
  }

  /** DuckDB replay: exhaustive per-position slice comparison for each
    * pattern — the specification the automaton optimizes. */
  def oracleSql(patterns: Seq[Seq[String]], table: String = "documents",
                textCol: String = "text"): String = {
    val vals = patterns.zipWithIndex.map { case (p, i) =>
      p.foreach(t => require(t.matches("[a-z0-9']+"), s"bad token: $t"))
      s"(${i + 1}, [${p.map(t => s"'$t'").mkString(", ")}])"
    }.mkString(", ")
    s"""WITH t AS (
         SELECT doc_id,
           list_filter(regexp_split_to_array(lower(COALESCE($textCol, '')), '[^a-z0-9'']+'), x -> length(x) > 0) AS arr
         FROM $table),
       pats(pid, pat) AS (VALUES $vals),
       m AS (
         SELECT t.doc_id, p.pid,
           CASE WHEN len(t.arr) >= len(p.pat) THEN
             len(list_filter([i FOR i IN generate_series(1, len(t.arr) - len(p.pat) + 1)],
               i -> t.arr[i:i + len(p.pat) - 1] = p.pat))
           ELSE 0 END AS c
         FROM t CROSS JOIN pats p),
       agg AS (
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_matches,
           CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_patterns_hit
         FROM m GROUP BY doc_id)
       SELECT t.doc_id, CAST(len(t.arr) AS BIGINT) AS n_tokens,
         agg.n_matches, agg.n_patterns_hit
       FROM t JOIN agg USING (doc_id)"""
  }
}

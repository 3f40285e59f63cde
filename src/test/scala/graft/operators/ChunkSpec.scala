package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Overlapping token-window chunker: brute-force equivalence on
  * randomized docs, the coverage/count invariants, and the contract
  * edges (short doc, exact-boundary doc, stride > window rejected). */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Same semantics, independently: whitespace split of the trimmed
    * text (empty text → one empty token, the Spark/DuckDB agreement),
    * starts at i·stride, last window shortened. */
  private def brute(text: String, w: Int, s: Int)
      : Seq[(Long, Long, Long, String)] = {
    val toks = text.trim.split("\\s+", -1)
    val n = toks.length
    val k = if (n <= w) 1 else (n - w + s - 1) / s + 1
    (0 until k).map { i =>
      val start = i * s // 0-based here; op reports 1-based
      val len = math.min(w, n - start)
      (i.toLong, (start + 1).toLong, len.toLong,
        md5hex(toks.slice(start, start + len).mkString(" ")))
    }
  }

  private def run(docs: Seq[(Long, String)], w: Int, s: Int)
      : Map[Long, Seq[(Long, Long, Long, String)]] =
    TextAnalysis.tokenChunks(docs.toDF("doc_id", "text"), "doc_id", "text", w, s)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)).toSeq).toMap

  test("randomized docs == brute force at several geometries (3 seeds)") {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    for (seed <- Seq(5L, 97L, 2024L); (w, s) <- Seq((8, 8), (8, 5), (16, 3))) {
      val docs = (0L until 40L).map { id =>
        val n = math.abs((id * 2654435761L + seed) % 60).toInt
        val words = (0 until n).map(j =>
          vocab((math.abs(id * 31L + j * 7L + seed) % vocab.size).toInt))
        (id, words.mkString(" "))
      }
      val got = run(docs, w, s)
      val want = docs.map { case (id, t) => id -> brute(t, w, s) }.toMap
      assert(got == want, s"seed $seed window $w stride $s")
    }
  }

  test("every token is covered and chunk geometry is regular") {
    val text = (1 to 53).map(i => s"t$i").mkString(" ")
    val chunks = run(Seq((1L, text)), 10, 7)(1L) // (chunk_id, start, len, md5)
    assert(chunks.head._2 == 1L)                 // first chunk starts at 1
    assert(chunks.sliding(2).forall {            // starts advance by stride
      case Seq(a, b) => b._2 - a._2 == 7L; case _ => true })
    val covered = chunks.flatMap(c => c._2 until c._2 + c._3).toSet
    assert(covered == (1L to 53L).toSet)         // no token dropped
    assert(chunks.init.forall(_._3 == 10L))      // full windows except last
    assert(chunks.last._2 + chunks.last._3 - 1 == 53L)
  }

  test("short doc yields one whole-doc chunk; exact boundary no phantom") {
    val shortDoc = run(Seq((1L, "a b c")), 10, 7)(1L)
    assert(shortDoc == Seq((0L, 1L, 3L, md5hex("a b c"))))
    // n == window: exactly one chunk, not two
    val exact = run(Seq((2L, (1 to 10).map("w" + _).mkString(" "))), 10, 7)(2L)
    assert(exact.length == 1 && exact.head._3 == 10L)
    // n == window + 1: second chunk appears, shortened to stride tail
    val over = run(Seq((3L, (1 to 11).map("w" + _).mkString(" "))), 10, 7)(3L)
    assert(over.length == 2 && over(1)._2 == 8L && over(1)._3 == 4L)
  }

  test("stride wider than window is rejected (tokens would be dropped)") {
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenChunks(Seq((1L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text", window = 4, stride = 5)
    }
  }
}

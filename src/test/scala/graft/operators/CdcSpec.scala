package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content-defined chunking: brute-force equivalence on randomized
  * docs, the shift-invariance property that justifies CDC over a
  * fixed grid, and the contract edges. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash64(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  private def toksOf(t: String): Vector[String] =
    t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toVector

  /** Independent reimplementation of the chunk policy. */
  private def brute(text: String, k: Int, mask: Long)
      : Seq[(Long, Long, Long, String)] = {
    val toks = toksOf(text)
    val n = toks.length
    val starts = Seq(1) ++ (0 to n - k).collect {
      case i if (hash64(toks.slice(i, i + k).mkString(" ")) & mask) == 0L &&
        i + k + 1 <= n => i + k + 1
    }
    starts.zipWithIndex.map { case (s, idx) =>
      val next = if (idx + 1 < starts.length) starts(idx + 1) else n + 1
      (idx.toLong, s.toLong, (next - s).toLong,
        md5hex(toks.slice(s - 1, next - 1).mkString(" ")))
    }
  }

  private def run(docs: Seq[(Long, String)], k: Int, mask: Long)
      : Map[Long, Seq[(Long, Long, Long, String)]] =
    TextAnalysis.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, mask)
      .as[(Long, Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)).toSeq)
      .toMap

  /** splitmix64 — an affine index mod |vocab| would make the text
    * periodic (and gram hashes with it), starving the cut test. */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def randText(seed: Long, len: Int): String = {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu",
      "hen", "ibis", "jay", "kiwi", "lark")
    (0 until len).map(j =>
      vocab((math.floorMod(mix(seed * 7919L + j), vocab.size.toLong)).toInt))
      .mkString(" ")
  }

  test("randomized docs == brute force (3 seeds, 2 geometries)") {
    for (seed <- Seq(41L, 733L, 9090L); (k, mask) <- Seq((3, 15L), (2, 7L))) {
      val docs = (0L until 50L).map(id =>
        (id, randText(id * 1000L + seed, 5 + (id % 90).toInt)))
      val got = run(docs, k, mask)
      val want = docs.map { case (id, t) => id -> brute(t, k, mask) }.toMap
      assert(got == want, s"seed $seed k=$k mask=$mask")
    }
  }

  test("shift invariance: a prefix edit preserves every later chunk") {
    val original = randText(271828L, 300)
    val edited = "zzz qqq " + original // prepend noise
    val a = run(Seq((1L, original)), 3, 15L)(1L)
    val b = run(Seq((2L, edited)), 3, 15L)(2L)
    assert(a.length >= 3, "need real boundaries for the property")
    // every chunk of the original EXCEPT the first (whose left edge
    // moved) survives the edit with identical content hash
    val aTail = a.drop(1).map(_._4).toSet
    val bHashes = b.map(_._4).toSet
    assert(aTail.subsetOf(bHashes))
    // the fixed-grid chunker re-keys the whole tail on the same edit
    // (stride not a multiple of the 2-token shift)
    val ga = TextAnalysis.tokenChunks(Seq((1L, original)).toDF("doc_id", "text"),
        "doc_id", "text", 24, 16)
      .select(col("chunk_md5")).as[String].collect().toSet
    val gb = TextAnalysis.tokenChunks(Seq((2L, edited)).toDF("doc_id", "text"),
        "doc_id", "text", 24, 16)
      .select(col("chunk_md5")).as[String].collect().toSet
    assert((ga intersect gb).size < aTail.size)
  }

  test("repeated chunks across docs surface in `shared`") {
    val core = randText(112233L, 120)
    val docs = Seq((1L, core), (2L, "noise words here " + core))
    val shared = TextAnalysis.cdcChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", 3, 15L)
      .filter(col("shared") >= 2L).count()
    assert(shared >= 2L) // the common tail chunks pair up
  }

  test("short and empty docs form exactly one chunk") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "single"))
    val got = run(docs, 3, 15L)
    assert(got(1L) == Seq((0L, 1L, 2L, md5hex("a b"))))
    assert(got(2L) == Seq((0L, 1L, 0L, md5hex(""))))
    assert(got(3L) == Seq((0L, 1L, 1L, md5hex("single"))))
  }

  test("bad geometry is rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.cdcChunks(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", k = 3, mask = 14L) // not 2^b - 1
    }
  }
}

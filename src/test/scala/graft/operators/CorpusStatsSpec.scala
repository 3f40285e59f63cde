package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-doc TF-IDF keywords and PMI collocations vs independent
  * plain-Scala recomputation, plus the signature behaviors (rare term
  * outranks frequent, planted collocation wins, rare-pair filter). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private def toksOf(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq

  private def randDocs(seed: Long, n: Int): Seq[(Long, String)] = {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    (0L until n.toLong).map { id =>
      val len = 4 + math.abs((id * 2654435761L + seed) % 30).toInt
      (id, (0 until len).map(j =>
        vocab((math.abs(id * 31L + j * 17L + seed) % vocab.size).toInt))
        .mkString(" "))
    }
  }

  private def bruteKeywords(docs: Seq[(Long, String)], k: Int)
      : Set[(Long, String, Long, Long, Long, Long)] = {
    val nDocs = docs.size.toLong
    val tf = docs.flatMap { case (id, t) =>
      toksOf(t).groupBy(identity).map { case (w, o) => (id, w, o.size.toLong) }
    }
    val dfT = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    tf.map { case (id, w, f) =>
      (id, w, f, dfT(w), micro(f.toDouble * math.log(nDocs.toDouble / dfT(w))))
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._5, r._2)).take(k).zipWithIndex
        .map { case (r, i) => (r._1, r._2, r._3, r._4, r._5, i + 1L) }
    }.toSet
  }

  private def bruteColloc(docs: Seq[(Long, String)], minCount: Int, k: Int)
      : Seq[(String, String, Long, Long, Long, Long)] = {
    val all = docs.map(d => toksOf(d._2))
    val pairs = all.flatMap(t => t.zip(t.drop(1)))
    val uni = all.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val np = pairs.size.toLong
    val nu = uni.values.sum
    pairs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 >= minCount)
      .map { case ((a, b), cxy) =>
        val arg = (cxy.toDouble * nu * nu) / (np.toDouble * uni(a) * uni(b))
        (a, b, cxy, uni(a), uni(b), micro(math.log(arg)))
      }
      .sortBy(r => (-r._6, r._1, r._2)).take(k).toSeq
  }

  test("keywords == brute force (randomized, 3 seeds)") {
    for (seed <- Seq(13L, 404L, 6060L)) {
      val docs = randDocs(seed, 60)
      val got = Search.keywords(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
        .as[(Long, String, Long, Long, Long, Long)].collect().toSet
      assert(got == bruteKeywords(docs, 3), s"seed $seed")
    }
  }

  test("a rare term outranks a frequent one despite lower tf") {
    val docs = Seq(
      (1L, "unique common common common"),
      (2L, "common common"), (3L, "common"), (4L, "common filler"),
      (5L, "filler common"))
    val top = Search.keywords(docs.toDF("doc_id", "text"), "doc_id", "text", 1)
      .filter(col("doc_id") === 1L)
      .select(col("term")).as[String].collect().head
    assert(top == "unique") // tf 1 · ln(5/1) > tf 3 · ln(5/5) = 0
  }

  test("collocations == brute force (randomized, 3 seeds)") {
    for (seed <- Seq(31L, 512L, 7777L)) {
      val docs = randDocs(seed, 80)
      val got = TextAnalysis.collocations(docs.toDF("doc_id", "text"),
          "doc_id", "text", minCount = 3, k = 10)
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
      assert(got == bruteColloc(docs, 3, 10), s"seed $seed")
    }
  }

  test("a planted collocation ranks first; rare pairs are filtered") {
    // "strong coffee" always adjacent; its parts appear nowhere else
    val noise = (0 until 30).map(i =>
      (i.toLong, "the data the scan the merge"))
    val planted = (100 until 106).map(i =>
      (i.toLong, "strong coffee the data"))
    val df = (noise ++ planted).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(df, "doc_id", "text",
        minCount = 5, k = 5)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.head._1 == "strong" && got.head._2 == "coffee")
    // ("coffee","the") occurs 6 times but PMI is low; ("strong","coffee")
    // with c_x = c_y = 6 maximizes the lift
    assert(got.head._6 > got(1)._6)
    val rare = TextAnalysis.collocations(df, "doc_id", "text",
        minCount = 7, k = 5)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(!rare.exists(r => r._1 == "strong")) // filtered at 7
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PII scrub: per-class counts attribute each span to exactly one
  * class (stage order email → ip → phone), redaction replaces every
  * occurrence, and clean text passes through untouched. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String) =
    Pii.piiStats(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_email", "n_ip", "n_phone").as[(Long, Long, Long)].head()

  test("detects emails, IPs, and phone-like runs") {
    assert(statsOf("mail a.smith+x@sub.example.co.uk now") === ((1L, 0L, 0L)))
    assert(statsOf("hosts 10.0.0.1 and 192.168.255.3") === ((0L, 2L, 0L)))
    assert(statsOf("call +1 555 214 3001 today") === ((0L, 0L, 1L)))
    assert(statsOf("x@y.io from 10.1.2.3, dial 555-214-3001") === ((1L, 1L, 1L)))
  }

  test("overlapping spans go to the first claiming stage only") {
    // an IPv4 is also a phone-like digit run; the ip stage claims it
    // and the phone count must not double-count the redacted span
    assert(statsOf("ping 172.16.254.101 ok") === ((0L, 1L, 0L)))
  }

  test("redaction replaces all occurrences and leaves clean text alone") {
    val out = Seq(("a@b.io then c@d.io at 10.0.0.7", "no pii here"))
      .toDF("t1", "t2")
      .select(Pii.redact(col("t1")).as("r1"), Pii.redact(col("t2")).as("r2"))
      .as[(String, String)].head()
    assert(out._1 === "<EMAIL> then <EMAIL> at <IP>")
    assert(out._2 === "no pii here")
  }

  test("null text is treated as empty") {
    val r = Pii.piiStats(
      Seq((1L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_email", "red_len").as[(Long, Long)].head()
    assert(r === ((0L, 0L)))
  }

  test("k-anonymity: classes verdict by size; report gates the table") {
    // QI (city, age): one class of 5 (safe at k=5), one of 2 (at risk)
    val rows = (1 to 5).map(i => (i.toLong, "ny", 30L)) ++
      Seq((6L, "sf", 40L), (7L, "sf", 40L))
    val df = rows.toDF("id", "city", "age")
    val classes = Pii.kAnonymityClasses(df, 5L, Seq("city", "age"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(classes(("ny", 30L)) == ((5L, true)))
    assert(classes(("sf", 40L)) == ((2L, false)))
    val rep = Pii.kAnonymityReport(df, 5L, Seq("city", "age")).collect()(0)
    assert(rep.getLong(0) == 2L)      // n_classes
    assert(rep.getLong(1) == 1L)      // classes_at_risk
    assert(rep.getLong(2) == 2L)      // rows_at_risk
    assert(!rep.getBoolean(3))        // not k-anonymous
    // suppressing the risky class flips the gate
    val ok = Pii.kAnonymityReport(df.filter(col("city") =!= "sf"),
      5L, Seq("city", "age")).collect()(0)
    assert(ok.getBoolean(3))
  }

  test("l-diversity: k-anonymous class with one sensitive value fails") {
    // class (ny,30) has 5 rows but only ONE diagnosis — k-anonymous
    // at k=5 yet l-diverse only at l=1; class (sf,40) has 2 rows with
    // 2 distinct values — diverse at l=2.
    val rows = (1 to 5).map(i => (i.toLong, "ny", 30L, "flu")) ++
      Seq((6L, "sf", 40L, "flu"), (7L, "sf", 40L, "cold"))
    val df = rows.toDF("id", "city", "age", "dx")
    val out = Pii.lDiversityClasses(df, 2L, Seq("city", "age"), "dx")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("ny", 30L)) == ((5L, 1L, false)))
    assert(out(("sf", 40L)) == ((2L, 2L, true)))
  }

  test("t-closeness: hand-computed EMD, verdict at an exact edge") {
    // global bins {1,2}: 3+3; class a = (1,1) → EMD 0.5,
    // class b = (1,2,2,2) → EMD 0.25
    val df = Seq(("a", 1L), ("a", 1L),
      ("b", 1L), ("b", 2L), ("b", 2L), ("b", 2L)).toDF("qi", "bin")
    val out = Pii.tClosenessClasses(df, 3L, 10L, Seq("qi"), "bin")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") == ((2L, 500000L, false)))   // 0.5 > 0.3
    assert(out("b") == ((4L, 250000L, true)))    // 0.25 ≤ 0.3
    // exact rational edge: t = 1/4 admits b with EMD exactly 1/4
    val edge = Pii.tClosenessClasses(df, 1L, 4L, Seq("qi"), "bin")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(edge("b") && !edge("a"))
  }

  test("t-closeness: randomized data matches a brute-force EMD (3 seeds)") {
    for (seed <- Seq(11, 47, 83)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 300).map(_ =>
        (s"q${rnd.nextInt(5)}", rnd.nextInt(8).toLong))
      val df = rows.toDF("qi", "bin")
      // brute force in plain Scala: ordered-bin EMD per class
      val bins = rows.map(_._2).distinct.sorted
      val n = rows.size.toLong
      val gCum = bins.scanLeft(0L)((a, b) =>
        a + rows.count(_._2 == b)).tail
      val want = rows.groupBy(_._1).map { case (qi, rs) =>
        val s = rs.size.toLong
        val cCum = bins.scanLeft(0L)((a, b) =>
          a + rs.count(_._2 == b)).tail
        val num = cCum.zip(gCum).map { case (c, g) =>
          math.abs(c * n - g * s) }.sum
        val denom = n * s * math.max(bins.size - 1, 1)
        qi -> math.floor(num.toDouble / denom.toDouble * 1e6 + 0.5).toLong
      }
      val got = Pii.tClosenessClasses(df, 1L, 5L, Seq("qi"), "bin")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("t-closeness: classes missing middle bins get grid-filled") {
    // global bins {1,2,3}: 2 each; a holds {1,3} only, b holds {2} only
    val df = Seq(("a", 1L), ("a", 1L), ("a", 3L), ("a", 3L),
      ("b", 2L), ("b", 2L)).toDF("qi", "bin")
    val out = Pii.tClosenessClasses(df, 1L, 3L, Seq("qi"), "bin")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") == ((166667L, true)))   // EMD 1/6 ≤ 1/3
    assert(out("b") == ((333333L, true)))   // EMD 1/3 ≤ 1/3 (edge)
  }
}

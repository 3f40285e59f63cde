package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** NFC/NFD expressions: composition round-trips, idempotence,
  * accent folding, SQL registration, null safety. */
class UnicodeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "café über Español"
  private val composed = "café über Español"

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(Tuple1(decomposed)).toDF("s").select(c).as[String].head()

  test("nfc composes; nfd decomposes; both idempotent") {
    assert(one(UnicodeNorm.nfcCol($"s")) == composed)
    assert(one(UnicodeNorm.nfcCol(UnicodeNorm.nfcCol($"s"))) == composed)
    val d = Seq(Tuple1(composed)).toDF("s")
      .select(UnicodeNorm.nfdCol($"s")).as[String].head()
    assert(d == decomposed)
  }

  test("stripAccents folds the marks away") {
    assert(one(UnicodeNorm.stripAccents($"s")) == "cafe uber Espanol")
    // composed input folds identically (NFD first)
    val f = Seq(Tuple1(composed)).toDF("s")
      .select(UnicodeNorm.stripAccents($"s")).as[String].head()
    assert(f == "cafe uber Espanol")
  }

  test("null passes through; plain ASCII unchanged") {
    val r = Seq((null: String, "plain ascii")).toDF("a", "b")
      .select(UnicodeNorm.nfcCol($"a"), UnicodeNorm.nfcCol($"b"))
      .collect()(0)
    assert(r.isNullAt(0) && r.getString(1) == "plain ascii")
  }

  test("registered SQL functions resolve via the extensions builder") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      s"SELECT nfc_normalize('$decomposed'), length(nfd_normalize('$composed'))")
      .collect()(0)
    assert(got.getString(0) == composed)
    assert(got.getInt(1) == decomposed.length ||
      got.getLong(1) == decomposed.length.toLong)
  }
}

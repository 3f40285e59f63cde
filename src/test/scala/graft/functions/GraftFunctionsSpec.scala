package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{TextAnalysis}
import graft.sources.Tables

/** The SQL registry's scalar forms must agree exactly with the Column
  * operators they mirror — verified over the sf0.001 corpus. */
class GraftFunctionsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("lang_id UDF == withLangId column op") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs")
    val udfOut = spark.sql("SELECT doc_id, lang_id(text) AS l FROM gf_docs")
    val colOut = TextAnalysis.withLangId(docs, "text")
      .select(col("doc_id"), col("lang_pred").as("l2"))
    assert(udfOut.join(colOut, "doc_id")
      .filter(col("l") =!= col("l2")).isEmpty)
  }

  test("rolling_fp64 UDF == fingerprint column op") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs")
    val udfOut = spark.sql("SELECT doc_id, rolling_fp64(text) AS f FROM gf_docs")
    val colOut = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("f2"))
    assert(udfOut.join(colOut, "doc_id")
      .filter(col("f") =!= col("f2")).isEmpty)
  }

  test("analyze_en UDF == Analyzer.analyze column op") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs")
    val udfOut = spark.sql(
      "SELECT doc_id, array_join(analyze_en(text), ' ') AS a FROM gf_docs")
    val colOut = docs.select(col("doc_id"),
      array_join(Analyzer.analyze(col("text")), " ").as("a2"))
    assert(udfOut.join(colOut, "doc_id")
      .filter(col("a") =!= col("a2")).isEmpty)
  }
}

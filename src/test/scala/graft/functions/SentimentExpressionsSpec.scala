package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native Catalyst expressions must agree exactly with the pure
  * Scala kernels / UDF path, survive codegen, and resolve from SQL. */
class SentimentExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "The food here is good.", "not good at all", "GREAT news!!",
    "terrible, awful failure", "", "plain neutral words").toDF("t")

  test("native expr == UDF path == kernel, including nulls") {
    val both = texts
      .withColumn("native", Sentiment.vaderCompound(col("t")))
      .withColumn("viaUdf", Sentiment.vaderCompoundUdfCol(col("t")))
      .withColumn("pol_native", Sentiment.lexiconPolarity(col("t")))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2))
      assert(r.getDouble(1) == Vader.compound(r.getString(0)))
      assert(r.getDouble(3) == LexiconPolarity.polarity(r.getString(0)))
    }
    val n = Seq[Option[String]](None).toDF("t")
      .select(Sentiment.vaderCompound(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    // needs a non-local scan: over a LocalRelation the optimizer
    // constant-folds the deterministic expression away entirely
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(Sentiment.vaderCompound(col("text")).as("c"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // formatted mode marks codegen'd operators with '*' + a codegen id
    assert(plan.contains("* Project"), plan)
    assert(plan.contains("[codegen id :"), plan)
    assert(plan.contains("vader_compound"), plan)
  }

  test("native struct expr == UDF struct path") {
    val rows = texts
      .withColumn("n", Sentiment.vaderScores(col("t")))
      .withColumn("u", Sentiment.vaderScoresUdfCol(col("t")))
      .select(col("n.neg"), col("n.neu"), col("n.pos"), col("n.compound"),
        col("u.neg"), col("u.neu"), col("u.pos"), col("u.compound"))
      .collect()
    rows.foreach { r =>
      (0 until 4).foreach(i => assert(r.getDouble(i) == r.getDouble(i + 4)))
    }
  }

  test("SQL registration resolves the native function") {
    SentimentExpressions.register(spark)
    texts.createOrReplaceTempView("sexpr_docs")
    val r = spark.sql(
      "SELECT vader_compound_native(t) AS c FROM sexpr_docs WHERE t = 'The food here is good.'")
      .head()
    assert(math.abs(r.getDouble(0) - 0.4404) < 1e-9)
  }
}

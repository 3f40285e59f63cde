package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The native cosine expression must agree bit-for-bit with the
  * interpreted kernel, handle nulls/zero vectors, and stay inside
  * whole-stage codegen. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(-1.0, 0.5, 0.0), Seq(0.25, -0.75, 2.0)),
    (3L, Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)) // zero-norm guard
  ).toDF("id", "a", "b")

  test("bit-exact vs the interpreted kernel, zero-norm guarded") {
    val rows = vecs.select($"id",
      CosineSimExpr($"a", $"b").as("cos"), $"a", $"b")
      .as[(Long, Double, Seq[Double], Seq[Double])].collect()
    rows.foreach { case (_, cos, a, b) =>
      assert(java.lang.Double.doubleToLongBits(cos) ==
        java.lang.Double.doubleToLongBits(Similarity.cosineOf(a, b)))
    }
    assert(rows.find(_._1 == 3L).get._2 == 0.0)
  }

  test("null input yields null, not a crash") {
    val r = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b").select(CosineSimExpr($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("stays inside WholeStageCodegen (no ScalaUDF / codegen break)") {
    // spark.range (not a local relation, which short-circuits to
    // LocalTableScan with no codegen stage at all)
    val df = spark.range(100)
      .select(array($"id".cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), $"id".cast("double")).as("b"))
    val plan = df.select(CosineSimExpr($"a", $"b"))
      .queryExecution.executedPlan.toString
    // "*(1) Project [cosine_sim(...)]" — the * marks a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("cosine_sim")))
    assert(!plan.contains("ScalaUDF"))
  }

  test("a null ELEMENT poisons the result to null, never reads as 0.0") {
    // Seq[Option[Double]] encodes as array<double> with containsNull=true;
    // before the nullable-kernel fix the null slot was silently read as
    // 0.0 via ArrayData.getDouble, producing a wrong number.
    val df = Seq(
      (1L, Seq(Option(1.0), None, Option(3.0)), Seq(Option(4.0), Option(5.0), Option(6.0))),
      (2L, Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0)))
    ).toDF("id", "a", "b")
    val rows = df.select($"id", CosineSimExpr($"a", $"b").as("cos"),
      DotExpr($"a", $"b").as("dot")).orderBy($"id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    // the clean row still computes, and matches the interpreted kernel
    assert(java.lang.Double.doubleToLongBits(rows(1).getDouble(1)) ==
      java.lang.Double.doubleToLongBits(Similarity.cosineOf(Seq(1.0, 2.0), Seq(3.0, 4.0))))
    assert(rows(1).getDouble(2) == 11.0)
  }

  test("mismatched lengths use the shorter prefix (kernel semantics)") {
    val c = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 99.0))).toDF("a", "b")
      .select(CosineSimExpr($"a", $"b")).as[Double].head()
    assert(c == Similarity.cosineOf(Seq(1.0, 2.0), Seq(1.0, 2.0, 99.0)))
  }
}

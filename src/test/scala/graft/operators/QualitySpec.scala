package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A-1..A-4 / T-6 gates — thresholds exactly as dags/data_quality.py. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val cutoff = lit(ts("2024-01-01 00:00:00"))

  test("qualityReport: total/missing/rate in one pass") {
    val df = Seq(
      (ts("2024-01-01 01:00:00"), Some(0.5)),
      (ts("2024-01-01 02:00:00"), None),
      (ts("2024-01-01 03:00:00"), Some(0.2)),
      (ts("2023-12-31 23:00:00"), None) // outside window
    ).toDF("processed_at", "sentiment")
    val r = Quality.qualityReport(df, "processed_at", cutoff,
      col("sentiment").isNull).head()
    assert(r.getAs[Long]("total") == 3)
    assert(r.getAs[Long]("missing") == 1)
    assert(math.abs(r.getAs[Double]("quality_rate") - 200.0 / 3) < 1e-9)
  }

  test("assertFresh throws on an empty window (data_quality.py:33-34)") {
    val df = Seq(ts("2023-01-01 00:00:00")).toDF("fetched_at")
    assertThrows[IllegalStateException] {
      Quality.assertFresh(df, "fetched_at", cutoff)
    }
    val ok = Seq(ts("2024-06-01 00:00:00")).toDF("fetched_at")
    assert(Quality.assertFresh(ok, "fetched_at", cutoff) == 1)
  }

  test("assertComplete enforces the 90% gate (data_quality.py:65)") {
    def df(missing: Int, present: Int) = {
      val rows = Seq.fill(missing)((ts("2024-01-01 01:00:00"), None: Option[Double])) ++
        Seq.fill(present)((ts("2024-01-01 01:00:00"), Some(1.0)))
      rows.toDF("processed_at", "sentiment")
    }
    assertThrows[IllegalStateException] {
      Quality.assertComplete(df(2, 8), "processed_at", cutoff, col("sentiment").isNull)
    }
    assert(Quality.assertComplete(df(1, 9), "processed_at", cutoff,
      col("sentiment").isNull) == 90.0)
  }
}

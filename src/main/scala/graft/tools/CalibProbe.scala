package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the Bench calibration kernel standalone: prints N timed
  * runs so the committed reference band (Bench.CalibRef) can be set
  * from an unloaded box and re-checked after environment changes.
  * Usage: sbt "runMain graft.tools.CalibProbe [n]" (default 12). */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.calibKernel(spark) // untimed codegen/JIT warm-up
    val ts = (1 to n).map { _ =>
      System.gc() // match Bench's inter-run hygiene
      val t0 = System.nanoTime()
      graft.Bench.calibKernel(spark)
      (System.nanoTime() - t0) / 1e9
    }
    println("calib runs: " + ts.map(t => f"$t%.3f").mkString(", "))
    val sorted = ts.sorted
    println(f"median ${sorted(n / 2)}%.3f  min ${sorted.head}%.3f  max ${sorted.last}%.3f")
    spark.stop()
  }
}

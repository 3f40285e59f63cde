package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the Bench ITERATIVE-plan sentinel kernel standalone
  * (round-15 VERDICT directive 2) so its quiet band
  * (`iter_bands` in records/calib_ref_r16.json) can be set from an
  * unloaded box, exactly like CalibProbe does for the scalar kernel.
  * Usage: sbt "runMain graft.tools.IterProbe [n]" (default 12). */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.iterKernel(spark) // untimed codegen/JIT warm-up
    val ts = (1 to n).map { _ =>
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc() // match Bench's iterSample hygiene
      val t0 = System.nanoTime()
      graft.Bench.iterKernel(spark)
      (System.nanoTime() - t0) / 1e9
    }
    println("iter runs: " + ts.map(t => f"$t%.3f").mkString(", "))
    val sorted = ts.sorted
    println(f"median ${sorted(n / 2)}%.3f  min ${sorted.head}%.3f  max ${sorted.last}%.3f")
    spark.stop()
  }
}

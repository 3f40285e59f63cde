package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Measures whole-stage-codegen coverage per query (dev tool): how
  * many physical operators sit INSIDE a WholeStageCodegen span vs
  * outside. Operators outside codegen pay virtual-call + row
  * materialization costs per row — at 100 TB the difference between
  * a fused loop and an iterator chain. UDF-bearing projections and
  * exchanges legitimately sit outside; anything else outside is a
  * candidate to fix. */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def walk(p: SparkPlan, inside: Boolean): (Int, Int, Seq[String]) = {
      import org.apache.spark.sql.execution.InputAdapter
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      val wrapper = p.isInstanceOf[WholeStageCodegenExec] ||
        p.isInstanceOf[AdaptiveSparkPlanExec] ||
        p.isInstanceOf[InputAdapter] || p.isInstanceOf[QueryStageExec]
      val self =
        if (wrapper) (0, 0, Nil)
        else if (inside) (1, 0, Seq.empty[String])
        else (0, 1, Seq(p.nodeName))
      // an InputAdapter's (or a new query stage's) subtree is OUTSIDE
      // the enclosing codegen span
      val nowInside = (inside || p.isInstanceOf[WholeStageCodegenExec]) &&
        !p.isInstanceOf[InputAdapter] && !p.isInstanceOf[QueryStageExec]
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case _ => p.children
      }
      kids.map(walk(_, nowInside)).foldLeft(self) {
        case ((i1, o1, n1), (i2, o2, n2)) => (i1 + i2, o1 + o2, n1 ++ n2)
      }
    }

    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-30s ${"in"}%4s ${"out"}%4s  outside-codegen operators")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // collect() (not a noop write) so THIS QueryExecution finalizes:
      // a write action clones the plan and leaves ours isFinalPlan=false
      df.collect()
      val (in, out, outs) = walk(df.queryExecution.executedPlan, inside = false)
      val uniq = outs.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }
        .toSeq.sorted.mkString(", ")
      println(f"$n%-30s $in%4d $out%4d  $uniq")
    }
    spark.stop()
  }
}

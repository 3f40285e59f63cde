package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run ONLY the named queries through the Verify dump shape
  * so `tools/check_oracle.py` can gate them without paying for the
  * full ~90-query sweep. Usage:
  *   runMain graft.tools.VerifySubset <sfDir> <outDir> q71_cms_token_freq ...
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    graft.OracleAnalyzer.sfDir = Some(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.sources.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      // No coalesce(1): it would collapse the final shuffle stage to a
      // single task (a 150M×600M semi-join ran one-threaded at sf100).
      // check_oracle.py reads the multi-file dir with a glob anyway.
      fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val stagesJson = SparkEntry.oracleStages.filter(kv => names(kv._1))
      .map { case (k, (stages, main)) =>
        s"${q(k)}: {${q("stages")}: [${stages.map(q).mkString(",")}], ${q("main")}: ${q(main)}}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_stages.json"), stagesJson)
    spark.stop()
  }
}

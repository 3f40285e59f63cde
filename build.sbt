ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sentimentanalysisdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: local[32] shares ONE heap across driver + all 32
  // executor threads; 8g left the allocation-heavy queries (simhash
  // bucket loops, CC rounds, ~100 localCheckpoints per bench sweep)
  // one GC hiccup from thrash. Note for benchmark forensics: the
  // dominant run-to-run variance on this box is HOST-side CPU
  // throttling under sustained load (round 5 measured x24 at 6.5 s /
  // 8.8 s / 142 s across identical invocations bracketing an hour of
  // continuous sbt load; the machine idles back to fast) — treat
  // in-session bench numbers as upper bounds and the driver's
  // fresh-round sweep as authoritative. The box has 128 GiB; a real
  // cluster sizes executors itself.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

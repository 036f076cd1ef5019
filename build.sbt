ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ccmspark"
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
// Pass the forked JVM's stdout through UNPREFIXED: sbt's default logger
// decorates every line with [info]/[error], which broke the driver's parse
// of Bench's single JSON output line two rounds running (BENCH_r0{1,2}.json
// both have "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default (round 15): the sf1 mini-gate runs 10x-replica queries at
  // the tail of a 283-query session, where 8g left graph_betweenness one
  // task-OOM from taking the local context down (measured; clean at 64g).
  // SPARK_DRIVER_MEM still overrides in both directions.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++
  // Extra forked-JVM flags (e.g. -Dspark.executor.extraClassPath=... for
  // the local-cluster multi-executor probe); space-separated.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)

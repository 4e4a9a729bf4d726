ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parcelanalyticsetlnotebookspark"
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
// The forked run's stdout otherwise goes through sbt's logger, which
// prefixes every line with "[info] " — that prefix is what kept the
// driver from machine-parsing the Bench JSON artifact line in rounds
// 3-5 (BENCH_r0{3,4,5}.json all show "parsed": null with the line
// visibly wrapped in the tail). StdoutOutput inherits the parent's
// stdio, so the one-line JSON contract reaches stdout bare.
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
// Heap is CLAMPED at 31g (CompressedOops ceiling), not passed through
// verbatim: the round-12 same-host A/B isolated the r11 "q17@sf1 reads
// 10x in the official artifact" mystery to exactly this knob — at
// SPARK_DRIVER_MEM=89g the identical tree reads q17@sf1 at 59.0s
// (heap peaks 20-42 GB, gc 4-22 s/sample, compressed oops off, the
// giant G1 young gen turns the allocation-heavy JSON synth+parse into
// a memory-bandwidth-bound path) vs 16.1s at -Xmx16g thirty minutes
// apart. No workload in this repo peaks above ~8 GB used at 16g; a
// >31g request is an environment default, not a need, and costs 3.7x
// on the heaviest query. Smaller explicit values pass through.
val forkedHeap: String = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g").trim.toLowerCase
  val mb: Long =
    try {
      val num = raw.takeWhile(_.isDigit).toLong
      raw.dropWhile(c => c.isDigit) match {
        case "m" | "mb"      => num
        case "k" | "kb"      => num / 1024
        case _ /* g | gb */  => num * 1024
      }
    } catch { case _: Throwable => 16 * 1024L }
  if (mb > 31 * 1024L) "16g" else raw
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkedHeap",
  // Spark generates a janino class per codegen stage; the JVM's default
  // 240MB code cache fills over a many-query session, the JIT stops
  // compiling, and stages silently run interpreted (observed 40x
  // slowdowns on later bench queries).
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)

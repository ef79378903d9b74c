ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlprocessforfraudtransactionsspark"
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
// Local mode = driver-only JVM, so the heap IS the executor memory.
// Default: half of MemAvailable, clamped to [4g, 48g] — the bench host
// (~125 GiB) still gets the full 48g that local[32] wants, while a small
// machine gets a heap its RAM can actually back instead of a fixed 48g
// that fails to start or swaps (ADVICE r2). SPARK_DRIVER_MEM overrides.
val driverMem: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val availKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemAvailable:") =>
        l.split("\\s+")(1).toLong }
      .getOrElse(16L * 1024 * 1024)
    catch { case _: Throwable => 16L * 1024 * 1024 }   // non-Linux fallback
  s"${math.min(49152L, math.max(4096L, availKb / 1024 / 2))}m"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kinesistoopensearchlambdaspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON (BENCH_r10..r13 all `parsed: null`). Two sbt behaviors broke that:
// the forked JVM's stdout was routed through sbt's logger (every line got
// an "[info] " prefix) and "[success] Total time: ..." printed AFTER the
// JSON. StdoutOutput passes the forked process's stdout through verbatim;
// showSuccess kills the footer.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task, so the
// unused-key lint misfires on it:
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---------------------------------------------------------------------
// Release packaging — the `build_tag.sh:1-32` equivalent. The reference
// zips its application + pip deps and posts a tagged GitHub release; the
// Spark analogue of that Lambda bundle is the library jar alone (Spark
// supplies the runtime exactly as Lambda supplies Python's, and this
// project adds zero non-Spark dependencies), so the release artifact is
// target/release/graft-spark-<version>.zip containing the jar plus the
// same release metadata build_tag.sh posts (tag/commit/name/body) as
// release.json — the zero-egress seam where a CI job would call the
// GitHub API — and a sha256 manifest. `sbt releasePackage` is the one
// command, mirroring the reference's one script.
lazy val releasePackage = taskKey[File](
  "Build the versioned release zip (build_tag.sh parity)")
releasePackage := {
  val jar = (Compile / packageBin).value
  val v = version.value
  val commit = scala.util.Try(
    scala.sys.process.Process(Seq("git", "rev-parse", "HEAD"),
      baseDirectory.value).!!.trim).getOrElse("unknown")
  val dist = target.value / "release"
  IO.createDirectory(dist)
  val notes = dist / "release.json"
  IO.write(notes,
    s"""{
       |  "tag_name": "v$v",
       |  "target_commitish": "$commit",
       |  "name": "v$v",
       |  "body": "new version v$v",
       |  "draft": false,
       |  "prerelease": false,
       |  "artifact": "${jar.getName}",
       |  "launch": "spark-submit --class <entry_point> ${jar.getName} <args>",
       |  "entry_points": {
       |    "verify": "graft.Verify <sfDir> <outDir>",
       |    "bench": "graft.Bench (env SPARK_GRAFT_SF_DIR)",
       |    "streaming": "graft.streaming.StreamingFanOut.startKinesis"
       |  }
       |}""".stripMargin)
  // The jar deliberately ships ONLY this project's classes: Spark is the
  // runtime, exactly as Lambda supplies the reference's Python, and the
  // project adds zero non-Spark dependencies — so plain spark-submit from
  // any Spark 4.x installation runs it with no --packages / assembly step.
  // LAUNCH.md states the clean-machine commands; releasePackage smoke-runs
  // the first one before zipping so the shipped instructions are proven,
  // not aspirational.
  val launch = dist / "LAUNCH.md"
  IO.write(launch,
    s"""# Running graft-spark v$v from this zip
       |
       |Requirements: a Spark 4.x installation (`spark-submit` on PATH or
       |`$$SPARK_HOME/bin`). The jar has no dependencies outside Spark's own
       |runtime — no assembly, no `--packages`, no extra classpath.
       |
       |```sh
       |# correctness dump (writes one parquet dir per query + oracle_sql.json)
       |spark-submit --class graft.Verify ${jar.getName} <sfDir> <outDir>
       |
       |# benchmark (one JSON line on stdout)
       |SPARK_GRAFT_SF_DIR=<sfDir> spark-submit --class graft.Bench ${jar.getName}
       |
       |# executed-plan dump for a query at a scale factor
       |spark-submit --class graft.ExecPlan ${jar.getName} <queryName> <sfDir>
       |```
       |
       |`<sfDir>` is a directory of the ten parquet tables (region nation
       |customer supplier part orders lineitem events documents embeddings).
       |Streaming entry points (`graft.streaming.StreamingFanOut.startKinesis`
       |et al.) are library API — call them from your own driver against your
       |endpoints.
       |""".stripMargin)
  val sparkSubmit =
    file(sys.env.getOrElse("SPARK_HOME", "/opt/spark")) / "bin" / "spark-submit"
  val smokeSf = file("/root/testdata/sf0.001")
  if (sparkSubmit.exists && smokeSf.exists) {
    val smokeOut = IO.createTemporaryDirectory / "release_smoke"
    val rc = scala.sys.process.Process(
      Seq(sparkSubmit.getAbsolutePath, "--class", "graft.Verify",
        jar.getAbsolutePath, smokeSf.getAbsolutePath, smokeOut.getAbsolutePath),
      baseDirectory.value, "SPARK_GRAFT_ONLY" -> "q01_pricing_summary").!
    require(rc == 0 && (smokeOut / "q01_pricing_summary").exists,
      "release smoke failed: spark-submit --class graft.Verify on the shipped jar")
    streams.value.log.info("release smoke: spark-submit graft.Verify OK")
  } else streams.value.log.warn(
    "release smoke skipped (spark-submit or sf0.001 testdata not present)")
  val zipFile = dist / s"graft-spark-$v.zip"
  IO.zip(Seq(jar -> jar.getName, notes -> "release.json",
    launch -> "LAUNCH.md"), zipFile, None)
  val digest = java.security.MessageDigest.getInstance("SHA-256")
    .digest(IO.readBytes(zipFile)).map(b => f"$b%02x").mkString
  IO.write(dist / s"${zipFile.getName}.sha256", s"$digest  ${zipFile.getName}\n")
  streams.value.log.info(s"release artifact: $zipFile (sha256 $digest)")
  zipFile
}

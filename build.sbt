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
       |  "entry_points": {
       |    "verify": "graft.Verify <sfDir> <outDir>",
       |    "bench": "graft.Bench (env SPARK_GRAFT_SF_DIR)",
       |    "streaming": "graft.streaming.StreamingFanOut.startKinesis"
       |  }
       |}""".stripMargin)
  val zipFile = dist / s"graft-spark-$v.zip"
  IO.zip(Seq(jar -> jar.getName, notes -> "release.json"), zipFile, None)
  val digest = java.security.MessageDigest.getInstance("SHA-256")
    .digest(IO.readBytes(zipFile)).map(b => f"$b%02x").mkString
  IO.write(dist / s"${zipFile.getName}.sha256", s"$digest  ${zipFile.getName}\n")
  streams.value.log.info(s"release artifact: $zipFile (sha256 $digest)")
  zipFile
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet: JSONL, CSV, and ORC must
  * round-trip the event table losslessly (timestamps, doubles, and JSON
  * payload strings full of commas/quotes — the CSV-escaping hazard), and a
  * partitioned write must prune partitions on read. These are the
  * interchange formats a 100 TB ingest actually meets; fidelity bugs here
  * corrupt silently, so the assertion is symmetric-difference-empty, not
  * rows-equal. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def events: DataFrame =
    Tables.events(spark, dir).limit(500)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "round-trip changed at least one row")
  }

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("out").toString

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Text formats default to millisecond timestamp patterns; event
    * timestamps carry microseconds, so a default-options round-trip
    * silently truncates — the explicit pattern is part of the recipe. */
  private val TsMicros = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  test("JSONL round-trip is lossless") {
    val out = tmp("jsonl")
    events.write.mode("overwrite").option("timestampFormat", TsMicros).json(out)
    val back = spark.read.schema(schema).option("timestampFormat", TsMicros).json(out)
    assertSameRows(events, back)
  }

  test("CSV round-trip is lossless, including quoted JSON payloads") {
    val out = tmp("csv")
    events.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", TsMicros).csv(out)
    val back = spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", TsMicros).csv(out)
    assertSameRows(events, back)
    // the payload column really does stress the quoting path
    assert(events.filter(col("props").contains("\"")).count() > 0,
      "fixture must contain quotes in props")
  }

  test("ORC round-trip is lossless") {
    val out = tmp("orc")
    events.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assertSameRows(events, back)
  }

  test("partitioned write prunes partitions on read") {
    val out = tmp("part")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)
    val one = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition pruning in plan:\n$plan")
    val expected = events.filter(col("event_type") === "click").count()
    assert(one.count() == expected)
  }
}

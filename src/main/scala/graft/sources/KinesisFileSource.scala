package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-backed stand-in for the Kinesis source (no connector jar / no
  * network in this harness; the real deployment swaps in
  * `spark.readStream.format("kinesis")` with the same downstream code).
  *
  * Shard files are text files of base64(JSON) payloads, one record per
  * line — the shape of `event["Records"][i]["kinesis"]["data"]`
  * (lambda_function.py:141,45). `maxFilesPerTrigger` plays the role of the
  * Lambda poll batch: one micro-batch consumes a bounded set of shard
  * files, giving the same at-least-once redelivery unit as one Lambda
  * invocation.
  */
object KinesisFileSource {

  /** Streaming DataFrame with the single `data` column of base64 payloads.
    * Feed into `AuditPipeline.decodeKinesis(df, "data")`. */
  def stream(spark: SparkSession, shardDir: String, filesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", filesPerTrigger)
      .text(shardDir)
      .select(col("value").as("data"))

  /** Batch view of the same shard files (replay / backfill path). */
  def batch(spark: SparkSession, shardDir: String): DataFrame =
    spark.read.text(shardDir).select(col("value").as("data"))
}

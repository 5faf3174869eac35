package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: an opaque binary payload + typed metadata.
  *
  * The multimodal design for a 100 TB training-data pipeline: image/audio/
  * video travel as `binary` columns (parquet stores them page-compressed,
  * scans prune them unless selected) with a typed metadata map alongside.
  * Decode/feature-extraction runs batch-at-a-time inside `mapPartitions`, so
  * each task amortizes codec setup over its whole partition — the Scala
  * analogue of a batched pandas UDF.
  */
case class MediaRecord(
    doc_id: Long,
    media: Array[Byte],
    format: String,
    meta: Map[String, String])

/** Deterministic per-object features extracted from the decoded media. */
case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    n_frames: Long,
    width: Long,
    height: Long,
    format: String)

object Multimodal {

  /** Wrap the documents table as media objects: the text payload stands in
    * for an encoded image (this container has no image codecs — see
    * [[decodeStub]]); metadata carries the typed sidecar fields. */
  def toMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("img").as("format"),
        map(
          lit("lang"), col("lang"),
          lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB DECODER — deterministic fake.
    *
    * A real deployment would decode the payload here (e.g. JPEG → pixel
    * array) with a native codec initialized once per partition. No image
    * libraries exist in this container, so the stub derives pseudo-features
    * purely from the payload length and doc id; it is deterministic so the
    * DuckDB oracle can reproduce it from `octet_length(text)`. The Spark-side
    * plumbing (binary column, partition-batched mapPartitions, typed output
    * encoder) is the real thing.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val nBytes = r.media.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = nBytes,
      n_frames = nBytes / 1000 + 1,
      width = 64 + nBytes % 577,
      height = 64 + (r.doc_id * 31) % 417,
      format = r.format)
  }

  /** Batch feature extraction: one decoder "session" per partition, streamed
    * over the partition's records (no per-row setup, no driver collect). */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen here, once per partition
      it.map(decodeStub)
    }
  }
}

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

/** One sampled frame: payload slice + its index within the media object. */
case class FrameRecord(doc_id: Long, frame_no: Long, frame: Array[Byte])

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
      n_frames = frameCount(nBytes),
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

  /** Frame width of the stub codec: 1000 payload bytes per "frame". */
  val FrameBytes = 1000

  /** Ceil-divide frame count; an empty payload still counts as one (empty)
    * frame so every media object yields at least one row downstream, but an
    * exact-multiple payload no longer emits a spurious zero-length tail. */
  def frameCount(nBytes: Long): Long =
    math.max(1L, (nBytes + FrameBytes - 1) / FrameBytes)

  /** Sample every `every`-th frame of each media object as a real payload
    * slice. This is the video-frame-sampling shape: a flatMap generator that
    * multiplies rows WITHOUT shuffling — each task samples its own split's
    * objects, output row count is corpus-frames/every. A real deployment
    * replaces the byte-slice with a codec keyframe extraction; the slicing,
    * row explosion, and typed output encoder are the real plumbing. */
  def sampleFrames(media: Dataset[MediaRecord], every: Int)(
      implicit spark: SparkSession): Dataset[FrameRecord] = {
    require(every >= 1, "sampling stride must be >= 1")
    import spark.implicits._
    media.flatMap { r =>
      val nb = r.media.length
      val nFrames = frameCount(nb.toLong).toInt
      (0 until nFrames).iterator.filter(_ % every == 0).map { i =>
        val from = i * FrameBytes
        val until = math.min(from + FrameBytes, nb)
        FrameRecord(r.doc_id, i.toLong, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }

  /** STUB RESIZE — deterministic fake: truncate or zero-pad the payload to
    * `targetBytes` and record the new size in the metadata sidecar. A real
    * deployment does pixel resampling here (per-partition codec session);
    * the binary-column rewrite + metadata update is the real plumbing. */
  def resizeStub(media: Dataset[MediaRecord], targetBytes: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    require(targetBytes >= 0, "target size must be non-negative")
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val out = java.util.Arrays.copyOf(r.media, targetBytes)
        r.copy(media = out, meta = r.meta + ("resized_bytes" -> targetBytes.toString))
      }
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One LSH bucket's resident document: the first arrival owns the bucket. */
case class BucketDoc(doc_id: Long, shingles: Array[String])

/** A (band, hash) bucket key + the arriving document's payload. */
case class BandedDoc(band_id: Int, band_hash: Long, doc_id: Long, shingles: Array[String])

/** An emitted suppression: `doc_id` is a near-duplicate of `dup_of`. */
case class NearDup(doc_id: Long, dup_of: Long, jaccard: Double)

/** Cross-batch near-duplicate suppression for CONTINUOUS ingestion — the
  * streaming twin of the batch MinHash-LSH dedup (q37/q66): documents
  * arriving over many micro-batches are checked against everything seen so
  * far, without ever joining against the full history.
  *
  * Shape: per-document codegen `minhash_bands` signature → explode to
  * (band, hash) bucket keys → `flatMapGroupsWithState` keyed on the
  * bucket. Each bucket's state holds the FIRST resident document (id +
  * shingle set); later arrivals verify exact Jaccard against the resident
  * in-state and emit a [[NearDup]] when ≥ threshold. A pair colliding in
  * several bands emits once per band — dedup downstream with
  * `dropDuplicates("doc_id", "dup_of")` (stateless within a batch) or
  * `dropDuplicatesWithinWatermark` across batches.
  *
  * 100 TB posture: state is per-bucket and holds ONE resident document
  * (the canonical copy), so state size tracks bucket count, not corpus
  * size — the same reason the batch formulation shuffles only (band,
  * hash). Production deployments bound bucket lifetime with the state
  * timeout (TTL) knob below and the RocksDB state store; verification
  * cost per arrival is one merge over two sorted shingle arrays.
  */
object StreamingNearDup {

  /** Sorted-merge overlap — same algorithm as the codegen
    * [[graft.functions.SortedOverlap]] kernel, here on JVM objects because
    * it runs inside the state function, not in a query plan. */
  private def overlap(a: Array[String], b: Array[String]): Int = {
    var i = 0; var j = 0; var ovl = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { ovl += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    ovl
  }

  private def bucketFn(threshold: Double)(
      key: (Int, Long), rows: Iterator[BandedDoc],
      state: GroupState[BucketDoc]): Iterator[NearDup] = {
    // arrival order within a batch is not guaranteed — process
    // deterministically by doc_id so the resident is stable
    val arrivals = rows.toSeq.sortBy(_.doc_id)
    val out = Seq.newBuilder[NearDup]
    var resident = state.getOption
    arrivals.foreach { d =>
      resident match {
        case None =>
          resident = Some(BucketDoc(d.doc_id, d.shingles))
          state.update(resident.get)
        case Some(r) if r.doc_id != d.doc_id =>
          val ovl = overlap(r.shingles, d.shingles)
          val union = r.shingles.length + d.shingles.length - ovl
          val j = if (union == 0) 0.0 else ovl.toDouble / union
          if (j >= threshold) out += NearDup(d.doc_id, r.doc_id, j)
        case _ => () // replayed resident, ignore
      }
    }
    out.result().iterator
  }

  /** Wire the detector onto a (streaming or batch) DataFrame with
    * `doc_id: bigint` and `text: string` columns. */
  def detect(docs: DataFrame, threshold: Double): Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.MinHashBands.register(spark)
    graft.functions.TextKernels.register(spark)
    val banded = docs
      .withColumn("sh", expr("word_shingles(text, 3)"))
      .filter(size(col("sh")) > 0)
      .withColumn("sh", sort_array(array_distinct(col("sh"))))
      .select(col("doc_id"),
        posexplode(expr("minhash_bands(sh)")).as(Seq("band_id", "band_hash")),
        col("sh").as("shingles"))
      .select(col("band_id"), col("band_hash"), col("doc_id"), col("shingles"))
      .as[BandedDoc]
    banded
      .groupByKey(b => (b.band_id, b.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bucketFn(threshold))
  }
}

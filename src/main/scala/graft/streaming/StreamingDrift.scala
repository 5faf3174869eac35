package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distribution-DRIFT monitor — the continuous-ingestion twin of
  * the batch q171 PSI audit: documents arriving over micro-batches update a
  * running per-(source, bin) histogram (state is O(sources·bins) COUNTS,
  * never documents — the q161 monoid-merge discipline applied to streaming
  * state), and after every batch the monitor emits each source's PSI
  * against a static reference histogram in the same exact integer
  * micro-nat arithmetic as q171, so batch and stream agree number-for-
  * number on identical history (StreamingDriftSpec pins the parity).
  *
  * Shape: intended inside `foreachBatch` — the caller holds the running
  * histogram (a tiny DataFrame, checkpointable as parquet) and calls
  * [[updatedCounts]] then [[psiMicro]]; the reference is broadcast-sized
  * by construction. 100 TB posture: per batch, one hash aggregate over
  * the batch + a spine-sized merge — the corpus is never rescanned, which
  * is the entire point of monitoring drift on a stream.
  */
object StreamingDrift {

  /** Fixed value-domain binning (no stats pass): `n_chars div 64`,
    * clamped to [0, bins-1] so outliers land in the edge bin instead of
    * growing the state. */
  private def binCol(bins: Int) =
    least(greatest(expr("n_chars div 64"), lit(0L)), lit(bins - 1L)).as("bin")

  /** Reference corpus → its (source, bin, n) histogram. */
  def prepareReference(docs: DataFrame, bins: Int = 10): DataFrame =
    docs.select(col("source"), binCol(bins))
      .groupBy("source", "bin").agg(count(lit(1)).as("n"))

  /** Merge one micro-batch into the running histogram — the (count)
    * monoid merge: union of partials re-aggregated on the key. `state`
    * may be empty (first batch). */
  def updatedCounts(state: DataFrame, batch: DataFrame, bins: Int = 10): DataFrame = {
    val part = batch.select(col("source"), binCol(bins))
      .groupBy("source", "bin").agg(count(lit(1)).as("n"))
    state.unionByName(part).groupBy("source", "bin").agg(sum(col("n")).as("n"))
  }

  /** PSI per source between `reference` and `current` histograms, in the
    * exact q171 integer micro-nat arithmetic (add-one smoothing over the
    * full bin spine, floor-ln of identical double ratios, order-free
    * integer term sum). Sources present in only one side still score:
    * the spine is the union of sources, missing bins smooth to 1. */
  def psiMicro(reference: DataFrame, current: DataFrame, bins: Int = 10): DataFrame = {
    val spine = reference.select(col("source"))
      .unionByName(current.select(col("source"))).distinct()
      .crossJoin(reference.sparkSession.range(bins).select(col("id").as("bin")))
    val filled = spine
      .join(reference.withColumnRenamed("n", "ra"), Seq("source", "bin"), "left")
      .join(current.withColumnRenamed("n", "cb"), Seq("source", "bin"), "left")
      .select(col("source"), col("bin"),
        (coalesce(col("ra"), lit(0L)) + 1).as("a1"),
        (coalesce(col("cb"), lit(0L)) + 1).as("b1"))
    val totals = filled.groupBy("source")
      .agg(sum(col("a1")).as("na"), sum(col("b1")).as("nb"))
    filled.join(totals, Seq("source"))
      .select(col("source"), col("na"), col("nb"),
        (col("a1") * col("nb") - col("b1") * col("na")).as("diff_num"),
        expr("CAST(floor(1000000.0 * ln((CAST(a1 AS DOUBLE) * CAST(nb AS DOUBLE)) / " +
          "(CAST(b1 AS DOUBLE) * CAST(na AS DOUBLE)))) AS BIGINT)").as("ln_micro"))
      .groupBy(col("source"))
      .agg(sum(expr("diff_num * ln_micro div (na * nb)")).as("psi_micro"))
  }
}

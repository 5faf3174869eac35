package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact GLOBAL order statistics without a global sort: iterative
  * histogram refinement.
  *
  * q81 computes exact per-group quantiles with a window sort — the honest
  * formulation when groups are small. For a GLOBAL quantile over 100 TB a
  * sort (or a single-partition window) is the one shape that cannot ship:
  * `ORDER BY` over everything is a full-data range-exchange, and
  * `ROW_NUMBER() OVER ()` serializes into ONE task. This operator finds the
  * exact k-th smallest of a Long column in O(log_B(range)) full scans
  * instead:
  *
  *  1. one min/max/count pass seeds every target's search interval;
  *  2. each refinement pass histograms the column into ≤B equal-width
  *     buckets PER UNRESOLVED TARGET (all targets share the scan: the
  *     per-row work is a ≤T-element array projection, the shuffle is the
  *     ≤T·B (target,bucket) count cells — map-side combined, bytes not
  *     terabytes);
  *  3. the driver walks the tiny histogram, keeps the bucket containing the
  *     residual rank, and narrows the interval; a bucket of width 1 is the
  *     answer.
  *
  * With B=1024, a range spanning up to Long.MaxValue−1 resolves in ≤7
  * scans (spans are signed-Long arithmetic, so a data range of the FULL
  * 2⁶⁴ domain is rejected up front — see the require below); money-sized
  * ranges (≤2³⁴ cents) in ≤4. Skew-immune (no key ever shuffles), spill-immune
  * (state is T·B counters), and every pass is one WholeStageCodegen scan.
  * The driver-side state is O(targets · B) longs — bounded like the KMeans
  * centroid collect (KMeansLloyd.scala), not data-sized.
  *
  * Ties are handled by multiset rank semantics: the k-th order statistic of
  * the column as a sorted multiset, exactly what `ROW_NUMBER() OVER (ORDER
  * BY x)` + `rn = k` selects regardless of tie order.
  *
  * Lineage audit (round-12 iterative-operator sweep): FLAT by
  * construction, no CheckpointTracker needed — every refinement pass
  * builds a fresh single-scan plan directly from the caller's `df`
  * (scan → explode(≤T cells) → hash agg → driver collect); the state
  * carried between passes is the T·B Long histogram plus interval
  * bounds, which live on the DRIVER, never in a DataFrame lineage.
  */
object HistogramQuantiles {

  /** The k-th smallest (1-indexed, multiset semantics) for each rank in
    * `ranks`, over `valueCol` (must be integral — cast money to cents
    * first). One min/max pass + ≤ log_B(range) histogram passes, each a
    * single scan with a ≤targets·buckets-cell shuffle. Empty input → empty
    * result. Ranks outside [1, n] throw. */
  def orderStatistics(df: DataFrame, valueCol: String,
      ranks: Seq[Long], buckets: Int = 1024): Seq[Long] = {
    require(ranks.nonEmpty, "need at least one rank")
    require(buckets >= 2, s"need >=2 buckets, got $buckets")
    val v = col(valueCol).cast("long")
    val seed = df.agg(min(v).as("lo"), max(v).as("hi"), count(v).as("n")).head()
    if (seed.getLong(2) == 0L) return Seq.empty
    val (gLo, gHi, n) = (seed.getLong(0), seed.getLong(1), seed.getLong(2))
    ranks.foreach(k => require(k >= 1 && k <= n, s"rank $k outside [1, $n]"))
    // Fail fast, not hang: the interval arithmetic below computes signed
    // spans (hi - lo + 1), which wraps when the data range exceeds
    // Long.MaxValue - 1 (e.g. values at both ±2⁶²). A wrapped span makes
    // the refinement walk diverge; real monetary/count/ppm columns are
    // orders of magnitude inside the bound. Callers with genuinely full
    // 64-bit ranges should pre-shift or split the domain.
    require(gHi - gLo >= 0 && gHi - gLo < Long.MaxValue,
      s"value range [$gLo, $gHi] too wide for signed span arithmetic")

    // per-target state: interval [lo, hi] and residual rank within it
    final case class T(lo: Long, hi: Long, r: Long)
    val state = scala.collection.mutable.ArrayBuffer(ranks.map(k => T(gLo, gHi, k)): _*)
    val resolved = scala.collection.mutable.Map.empty[Int, Long]

    while (resolved.size < state.length) {
      val open = state.zipWithIndex.filter { case (t, i) => !resolved.contains(i) }
      open.foreach { case (t, i) => if (t.lo == t.hi) resolved(i) = t.lo }
      val todo = open.filter { case (_, i) => !resolved.contains(i) }
      if (todo.nonEmpty) {
        // bucket width per target: ceil(span / B) >= 1 (span > 1 here)
        val widths = todo.map { case (t, _) =>
          val span = t.hi - t.lo + 1 // lo < hi => span >= 2, no overflow at cents scale
          (span + buckets - 1) / buckets
        }
        // one scan: per row, per unresolved target, its (targetIdx, bucket)
        // cell — nulls (out of interval) drop before the count
        val cells = todo.zip(widths).map { case ((t, i), w) =>
          when(v >= t.lo && v <= t.hi,
            struct(lit(i).as("t"), ((v - t.lo) / w).cast("long").as("b")))
        }
        val hist = df
          .select(explode(array(cells.toSeq: _*)).as("c"))
          .filter(col("c").isNotNull)
          .groupBy(col("c.t"), col("c.b")).agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
          .toMap
        todo.zip(widths).foreach { case ((t, i), w) =>
          var residual = t.r
          var b = 0L
          var found = false
          while (!found) {
            val c = hist.getOrElse((i, b), 0L)
            if (residual <= c) found = true
            else { residual -= c; b += 1 }
          }
          val lo2 = t.lo + b * w
          val hi2 = math.min(t.hi, lo2 + w - 1)
          state(i) = T(lo2, hi2, residual)
          if (lo2 == hi2) resolved(i) = lo2
        }
      }
    }
    ranks.indices.map(resolved)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval×interval OVERLAP join on a fixed time grid — the standard
  * dedup-free grid join (the interval generalization of q52's
  * point-in-range bucketing; the batch shape of KDB/Flink interval joins).
  *
  * Both sides explode to the grid cells their closed interval covers
  * (fan-out bounded by interval length ÷ cell width), the join is an
  * EQUI-join on the cell — shuffle keyed by cell, never a theta product —
  * and each qualifying pair is emitted exactly once: only the cell
  * containing the overlap's START (`greatest(starts) div cell`) emits, so
  * no distinct pass ever runs over pair space. Work is
  * O(intervals · cells-per-interval + true-overlap pairs); the all-pairs
  * theta join exists only as the oracle/spec witness.
  */
object IntervalJoin {

  /** `left` must carry long columns `ls`/`le` (closed interval, micros or
    * any consistent unit), `right` long columns `rs`/`re`; all other
    * columns are carried through. Overlap predicate: `ls <= re && rs <= le`. */
  def overlapJoin(left: DataFrame, right: DataFrame, cell: Long): DataFrame = {
    require(cell > 0, s"cell width must be positive, got $cell")
    val lc = left.withColumn("_c",
      explode(expr(s"sequence(ls div ${cell}L, le div ${cell}L)")))
    val rc = right.withColumn("_c",
      explode(expr(s"sequence(rs div ${cell}L, re div ${cell}L)")))
    lc.join(rc, Seq("_c"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .filter(expr(s"greatest(ls, rs) div ${cell}L") === col("_c"))
      .drop("_c")
  }
}

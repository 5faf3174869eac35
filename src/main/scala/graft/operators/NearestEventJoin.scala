package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-event temporal join — the BIDIRECTIONAL tolerance variant of
  * [[AsOfJoin]] (sensor-fusion / measurement-alignment semantics: for every
  * left event, the right event on the same key with the smallest |Δt|,
  * within a tolerance, ties to the earlier right event). Spark has no
  * primitive; the naive range join explodes per key.
  *
  * Shape: the AsOfJoin union trick run in BOTH directions over ONE key
  * shuffle — a backward window (`last` right payload ≤ t, right rows
  * sorting before left at equal timestamps) and a forward window (`first`
  * right payload ≥ t over the [current, following] frame, left rows
  * sorting before right so equal-t rights stay eligible), then a per-row
  * pick of the closer candidate inside the tolerance. Cost: one exchange
  * on the key + two per-partition sorts; no pair explosion, state is one
  * running value per direction.
  */
object NearestEventJoin {

  /** `left`/`right` must carry `key` and their time column (LONG micros —
    * exact arithmetic); `right` additionally `payloadCol`, at most one row
    * per (key, time) (pre-aggregate otherwise — the match is ambiguous).
    * Output: every left row + `match_t` / `match_payload` / `dt_us`
    * (NULLs when nothing lies within `toleranceUs`). */
  def nearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCol: String,
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"tolerance must be >= 0, got $toleranceUs")
    val leftCols = left.columns.toSeq
    val r = right.select(col(key), col(rightTime).as("__t"), lit(0).as("__rs"),
      struct(col(rightTime).as("t"), col(payloadCol).as("p")).as("__rp"))
    val l = left.select(
      (col(key) +: col(leftTime).as("__t") +: lit(1).as("__rs") +:
        lit(null).cast(r.schema("__rp").dataType).as("__rp") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val union = r.select(
      (col(key) +: col("__t") +: col("__rs") +: col("__rp") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(l)
    // backward: rights (__rs=0) sort BEFORE lefts at equal t => ties match
    val wb = Window.partitionBy(col(key)).orderBy(col("__t"), col("__rs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: lefts (1 - __rs = 0) sort BEFORE rights => equal-t rights
    // stay inside the [current, following] frame
    val wf = Window.partitionBy(col(key))
      .orderBy(col("__t"), (lit(1) - col("__rs")))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cand = union
      .withColumn("__b", last(col("__rp"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__rp"), ignoreNulls = true).over(wf))
      .filter(col("__rs") === 1)
    val bd = col("__t") - col("__b.t")
    val fd = col("__f.t") - col("__t")
    val bOk = col("__b").isNotNull && bd <= toleranceUs
    val fOk = col("__f").isNotNull && fd <= toleranceUs
    // ties (bd == fd) go backward: the earlier right event
    val pickB = bOk && (!fOk || bd <= fd)
    cand
      .withColumn("match_t",
        when(pickB, col("__b.t")).when(fOk, col("__f.t")))
      .withColumn("match_payload",
        when(pickB, col("__b.p")).when(fOk, col("__f.p")))
      .withColumn("dt_us", when(pickB, bd).when(fOk, fd))
      .drop("__t", "__rs", "__rp", "__b", "__f")
  }
}

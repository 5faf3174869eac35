package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the newest right row with
  * `rightTime <= leftTime` on the same key. Spark has no ASOF primitive;
  * the usual workarounds are a range join (quadratic blowup per key) or
  * per-key collect (driver-bound). This is the scalable formulation:
  *
  *  1. union the two sides, tagged, with right-side payload columns nulled
  *     on left rows;
  *  2. one window `last(payload, ignoreNulls) OVER (PARTITION BY key
  *     ORDER BY time, side)` carries the most recent right payload forward;
  *  3. keep left rows.
  *
  * Cost: ONE shuffle on the key (same as any equi-join) + a per-partition
  * sort — no pair explosion, no state beyond the running last value, skew
  * behaves exactly like a group-by on the same key. Right rows sort before
  * left rows at equal timestamps, so ties match (ASOF `>=` semantics).
  */
object AsOfJoin {

  /** @param left        left side; must contain `key` and `leftTime`
    * @param right       right side; must contain `key`, `rightTime`, and the
    *                    payload columns — at most one row per (key, time)
    *                    (pre-aggregate otherwise: the match is ambiguous)
    * @param key         equi-join key column name (same name both sides)
    * @param leftTime    event-time column name on the left
    * @param rightTime   event-time column name on the right
    * @param payloadCols right columns carried onto matching left rows
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows: payload present, left columns (minus key) nulled
    val taggedRight = right.select(
      col(key) +: (col(rightTime).as("__t") +: lit(0).as("__side") +:
        (leftCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(col))): _*)
    val taggedLeft = left.select(
      col(key) +: (col(leftTime).as("__t") +: lit(1).as("__side") +:
        (leftCols.filterNot(c => c == key).map(col) ++
          payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe total-order row numbering.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY forces the whole
  * input through a single partition — a one-task OOM at 100 TB. This helper
  * produces the identical result with a range partition on the order keys, a
  * within-partition sort, and `RDD.zipWithIndex` (which runs one lightweight
  * count job to learn per-partition offsets, O(numPartitions) driver state).
  * Every partition then stamps its rows independently.
  */
object GlobalIndex {

  /** Append a 1-based global row number named `name`, ordered by `order`. */
  def withRowNumber(df: DataFrame, name: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }
}

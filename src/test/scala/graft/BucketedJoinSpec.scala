package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing co-locates both sides of a recurring join: written bucketed by
  * the join key, the sort-merge join needs NO shuffle exchange at read time
  * — the pre-partitioning strategy for fact-to-fact joins repeated across a
  * 100 TB pipeline's runs. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans no shuffle") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b").hint("merge")
      .join(spark.table("lineitem_b").hint("merge"), "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    joined.collect() // force final plan (AQE)

    val exec = joined.queryExecution.executedPlan
    val shufflesBeforeAgg = exec.collect { case e: ShuffleExchangeExec => e }
    // only the final groupBy aggregation may shuffle; the join itself must not
    assert(shufflesBeforeAgg.size <= 1,
      s"bucketed join should not shuffle its inputs:\n$exec")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{assert_true, coalesce, lit}

/** Loud-failure guards for the integer-exact arithmetic queries.
  *
  * Several drift/statistics queries (q143/q170/q171/q172) keep their
  * results bit-exact across engines by staying in Long arithmetic; each
  * documents the input cardinality past which an intermediate product
  * would wrap. These guards turn that documented cliff from a
  * silent-wrong-answer into an executor-side error: `assert_true` rides
  * the plan as a WHERE predicate (no extra action, no extra scan — the
  * predicate is true on every in-bound row, so Catalyst keeps the plan
  * shape and the oracle comparison is unchanged), and throws
  * `SparkRuntimeException` with the query's own message the moment an
  * over-bound input appears. The documented escape hatch stays DECIMAL(38)
  * promotion.
  */
object Guard {

  /** Keep `df` unchanged while asserting `cond` holds on every row;
    * violation fails the job loudly with `msg`. `assert_true` returns
    * NULL when the condition holds, so `coalesce(..., true)` makes the
    * predicate a tautology for in-bound data. */
  def require(df: DataFrame, cond: Column, msg: String): DataFrame =
    df.where(coalesce(assert_true(cond, lit(msg)).cast("boolean"), lit(true)))
}

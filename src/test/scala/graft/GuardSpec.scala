package graft

import graft.functions.Guard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Long-overflow guards (q143/q170/q171/q172) must be invisible on
  * in-bound data and FAIL LOUDLY — not wrap silently — the moment an
  * over-bound input appears. The round-8 verdict's finding: the bounds
  * were documented in comments but nothing enforced them. */
class GuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("in-bound rows pass through unchanged") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val out = Guard.require(df, col("v") <= 1000L, "must not fire")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 20L)))
  }

  test("an over-bound row fails the job loudly with the query's message") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 5000000000L)).toDF("k", "v")
    val ex = intercept[Exception] {
      Guard.require(df, col("v") <= 3000000000L,
        "qXX: integer-exact bound exceeded - promote to DECIMAL(38)")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("integer-exact bound exceeded")),
      s"guard must surface the query's own message, got: ${messages(ex)}")
  }

  test("the guarded drift queries stay green on the test corpus") {
    // q171/q172 carry the guard in-plan; on in-bound data the plan runs
    // to completion and produces rows (the oracle run checks the values).
    val sf = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("q171_psi_drift")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q172_ks_drift")(spark, sf).count() > 0)
  }
}

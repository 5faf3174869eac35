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

  test("component-wise bounds catch inputs where the product form breaks past the cliff") {
    import spark.implicits._
    // The advisor's q143 finding: a guard written as
    //   (n + 1) * total <= Max div 1e6
    // is itself unsound when n·total ≳ 9.2e18. Under non-ANSI Long
    // arithmetic the product wraps NEGATIVE and wrongly passes; under
    // this engine's ANSI mode (Spark 4 default) the guard predicate
    // ITSELF throws a bare ARITHMETIC_OVERFLOW — the user sees an
    // arithmetic crash from inside the guard, not the query's own
    // diagnostic. Either way the guard fails at its one job. The
    // component form divides the ceiling FIRST, cannot overflow, and
    // always surfaces the query's message.
    val n = 4L
    val total = 2000000000000000000L // n*total ~ 1e19 > Long.MaxValue
    val df = Seq((n, total)).toDF("n_sources", "total_tokens")
    val productForm = (expr("(n_sources + 1) * total_tokens") <=
      expr("9223372036854775807L div 1000000L"))
    val componentForm = (col("total_tokens") <=
      expr("(9223372036854775807L div 1000000L) div (n_sources + 1)"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // the broken form really is broken: ANSI overflow from the guard
    // predicate, no query diagnostic anywhere in the chain
    val exProduct = intercept[Exception] {
      Guard.require(df, productForm, "q143-shape: integer-exact bound exceeded")
        .count()
    }
    assert(messages(exProduct).exists(_.contains("ARITHMETIC_OVERFLOW")))
    assert(!messages(exProduct).exists(_.contains("integer-exact bound exceeded")))
    // the shipped form evaluates cleanly and fails loudly with the message
    val ex = intercept[Exception] {
      Guard.require(df, componentForm,
        "q143-shape: integer-exact bound exceeded").collect()
    }
    assert(messages(ex).exists(_.contains("integer-exact bound exceeded")))
    assert(!messages(ex).exists(_.contains("ARITHMETIC_OVERFLOW")))
  }

  test("the guarded BM25 and Gini queries stay green on the test corpus") {
    // q110 (round-10 guards: tf*a and n_docs/df cliffs) and q143
    // (component-wise rewrite) must be invisible on in-bound data.
    val sf = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("q110_bm25_retrieval")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q143_source_gini")(spark, sf).count() > 0)
  }

  test("PackedArgMin: min(long) winner equals the struct-min winner, negatives included") {
    import graft.functions.PackedArgMin
    import spark.implicits._
    // votes: group 1 -> label 7 wins on count (2 votes); group 2 ties at
    // one vote each -> smallest label 3 wins; keys are NEGATED counts
    val votes = Seq((1L, 7L, 2L), (1L, 9L, 1L), (2L, 5L, 1L), (2L, 3L, 1L))
      .toDF("g", "label", "c")
    val packed = PackedArgMin.guard(votes, -col("c"), col("label"), 40, "spec")
      .groupBy(col("g"))
      .agg(min(PackedArgMin.pack(-col("c"), col("label"), 40)).as("w"))
      .select(col("g"), PackedArgMin.payload(col("w"), 40).as("won"),
        (-PackedArgMin.key(col("w"), 40)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(packed == Set((1L, 7L, 2L), (2L, 3L, 1L)),
      s"packed argmax with tiebreak must match struct-min semantics: $packed")
  }

  test("PackedArgMin: out-of-range payload or key fails loudly, never a wrong winner") {
    import graft.functions.PackedArgMin
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // payload >= 2^20 with bits=20
    val badPayload = Seq((1L, 1L << 21, 1L)).toDF("g", "label", "c")
    val ex1 = intercept[Exception] {
      PackedArgMin.guard(badPayload, col("c"), col("label"), 20, "specP")
        .agg(min(PackedArgMin.pack(col("c"), col("label"), 20))).collect()
    }
    assert(messages(ex1).exists(_.contains("packed argmin out of range")))
    // |key| > 2^(62-40) with bits=40
    val badKey = Seq((1L, 5L, 1L << 30)).toDF("g", "label", "c")
    val ex2 = intercept[Exception] {
      PackedArgMin.guard(badKey, -col("c"), col("label"), 40, "specK")
        .agg(min(PackedArgMin.pack(-col("c"), col("label"), 40))).collect()
    }
    assert(messages(ex2).exists(_.contains("packed argmin out of range")))
  }

  test("the round-10 additions carry their guards: q184 votes, q185 ppm, q186 weights") {
    // each must be invisible on in-bound data (the oracle run checks
    // values; here: the guarded plan completes and yields rows)
    val sf = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("q184_label_propagation")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q185_transition_matrix")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q186_weighted_quantiles")(spark, sf).count() > 0)
  }
}

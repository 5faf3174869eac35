package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen shingle/ngram kernels must reproduce the declarative
  * transform+array_distinct formulation exactly (same elements, same order),
  * including empty-token and short-document edge cases. */
class TextKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("word_shingles == array_distinct(transform(...)) on real and edge-case docs") {
    import spark.implicits._
    graft.functions.TextKernels.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "a b c",
      "x  y z  w",            // double spaces -> empty tokens kept
      " leading and trailing ",
      "rep rep rep rep rep"   // heavy duplication
    ).toDF("text")
    assert(spark.sql("SELECT word_shingles('a b', 3)").collect()(0)
      .getSeq[String](0).isEmpty, "sub-width doc must yield empty array")
    val both = docs.select(
      expr("word_shingles(text, 3)").as("kernel"),
      array_distinct(expr(
        "transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1], ' ', split(text, ' ')[i + 2]))"))
        .as("declarative"))
      .collect()
    both.foreach { r =>
      val k = r.getSeq[String](0)
      val d = Option(r.getSeq[String](1)).getOrElse(Seq.empty)
      assert(k == d, s"kernel=$k declarative=$d")
    }
  }

  test("word_segments == transform(slice(...)) spans incl. empty/short/ragged docs") {
    import spark.implicits._
    graft.functions.TextKernels.register(spark)
    // q112's old declarative span builder, restated verbatim as the truth:
    // non-overlapping 3-word slices joined by ' ', last one possibly short,
    // empty text -> one empty segment (split(' ') keeps the empty token).
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "one two three four",   // ragged tail (1-word last segment)
      "a b c",                // exactly one full segment
      "a b",                  // single short segment
      "",                     // empty text -> [""]
      "x  y z  w",            // double spaces -> empty tokens kept
      " leading and trailing "
    ).toDF("text")
    val both = docs.select(
      expr("word_segments(text, 3)").as("kernel"),
      expr("transform(sequence(0, cast(ceil(size(split(text, ' ')) / 3.0) as int) - 1), " +
        "i -> array_join(slice(split(text, ' '), i * 3 + 1, 3), ' '))").as("declarative"))
      .collect()
    both.foreach { r =>
      val k = r.getSeq[String](0)
      val d = r.getSeq[String](1)
      assert(k == d, s"kernel=$k declarative=$d")
    }
  }

  test("word_ngrams == transform(...) bigrams with duplicates kept") {
    import spark.implicits._
    graft.functions.TextKernels.register(spark)
    val docs = Seq(
      "a b a b a",
      "two words",
      "x  y"                  // empty middle token
    ).toDF("text")
    val both = docs.select(
      expr("word_ngrams(text, 2)").as("kernel"),
      expr("transform(sequence(0, size(split(text, ' ')) - 2), " +
        "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))").as("declarative"))
      .collect()
    assert(spark.sql("SELECT word_ngrams('single', 2)").collect()(0)
      .getSeq[String](0).isEmpty, "sub-width doc must yield empty array")
    both.foreach { r =>
      val k = r.getSeq[String](0)
      val d = r.getSeq[String](1)
      assert(k == d, s"kernel=$k declarative=$d")
    }
  }
}

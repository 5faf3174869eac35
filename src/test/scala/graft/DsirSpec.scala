package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q124 (DSIR importance selection) that the hash
  * oracle cannot express: the weights must actually DISCRIMINATE — the
  * target language's selection rate strictly exceeds every other
  * language's — and the census must be total over scoreable documents. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("target-language selection rate strictly exceeds every other language") {
    val got = SparkEntry.queries("q124_dsir_importance")(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val rates = got.join(docs, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(avg(col("selected")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = rates("en")
    rates.filter(_._1 != "en").foreach { case (lang, r) =>
      assert(en > r, s"en rate $en not above $lang rate $r — weights don't discriminate")
    }
  }

  test("census is total over >=2-word documents, weights finite, flags consistent") {
    val got = SparkEntry.queries("q124_dsir_importance")(spark, dir).collect()
    val scoreable = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(got.length == scoreable)
    got.foreach { r =>
      val (nf, lw, sel) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nf >= 1)
      assert(sel == (if (lw >= 0L) 1L else 0L))
    }
  }
}

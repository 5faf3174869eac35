package graft

import graft.streaming.StreamingDecontam
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming decontamination: documents arriving across micro-batches are
  * flagged at ingest time when they share verbatim shingles with the
  * static eval suite; clean documents pass untouched. */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("contaminated docs are flagged across micro-batches, clean docs pass") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evalDocs = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog tonight"),
      (1001L, "pack my box with five dozen liquor jugs right now")
    ).toDF("doc_id", "text")
    val evalShingles = StreamingDecontam.prepareEval(evalDocs, "doc_id", "text")

    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        flagged ++= StreamingDecontam
          .flagContaminated(batch, evalShingles, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        ()
      }
      .start()

    // batch 1: one doc embedding eval 1000's text verbatim, one clean doc
    stream.addData(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog tonight and more"),
      (2L, "completely unrelated content about spark partitions and shuffles"))
    q.processAllAvailable()
    // batch 2: a doc embedding eval 1001's text
    stream.addData(
      (3L, "pack my box with five dozen liquor jugs right now said the label"),
      (4L, "another clean document with nothing shared at all here"))
    q.processAllAvailable()
    q.stop()

    val pairs = flagged.map(f => (f._1, f._2)).toSet
    assert(pairs.contains((1L, 1000L)), s"doc 1 must flag against eval 1000: $flagged")
    assert(pairs.contains((3L, 1001L)), s"doc 3 must flag against eval 1001: $flagged")
    assert(!flagged.exists(f => f._1 == 2L || f._1 == 4L), s"clean docs flagged: $flagged")
    // the embedded span shares many 3-shingles, well past the >= 3 bar
    assert(flagged.filter(_._1 == 1L).forall(_._3 >= 3))
  }
}

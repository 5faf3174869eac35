package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: frame sampling must slice the payload losslessly
  * and resize must produce exact-size payloads with updated metadata. */
class MultimodalSpec extends AnyFunSuite {
  private implicit lazy val spark: SparkSession = TestSpark.spark

  private def media() =
    Multimodal.toMedia(Tables.documents(spark, "/root/testdata/sf0.001"))

  test("sampleFrames(1) reassembles the original payload exactly") {
    val m = media()
    val frames = Multimodal.sampleFrames(m, every = 1).collect()
      .groupBy(_.doc_id)
    val originals = m.collect().map(r => r.doc_id -> r.media).toMap
    originals.foreach { case (id, bytes) =>
      val rebuilt = frames(id).sortBy(_.frame_no).flatMap(_.frame)
      assert(java.util.Arrays.equals(rebuilt, bytes), s"doc $id reassembly mismatch")
    }
  }

  test("sampleFrames(3) keeps exactly the frames with index % 3 == 0") {
    val sampled = Multimodal.sampleFrames(media(), every = 3).collect()
    assert(sampled.nonEmpty)
    assert(sampled.forall(_.frame_no % 3 == 0))
  }

  test("resizeStub pads/truncates to the exact target and tags metadata") {
    val resized = Multimodal.resizeStub(media(), targetBytes = 256).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.media.length == 256)
      assert(r.meta("resized_bytes") == "256")
    }
  }
}

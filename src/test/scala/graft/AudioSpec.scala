package graft

import graft.multimodal.Audio
import org.scalatest.funsuite.AnyFunSuite

/** The WAV container must round-trip: parseWav(wavFor(...)) recovers the
  * header fields and the exact sample formula; malformed containers must
  * throw, not decode to garbage; the window fold must equal a scalar
  * reference on awkward lengths. */
class AudioSpec extends AnyFunSuite {

  test("synthesize-parse roundtrip recovers rate and samples exactly") {
    for (id <- Seq(0L, 1L, 17L, 4999L); n <- Seq(1, 63, 64, 65, 200)) {
      val (sr, samples) = Audio.parseWav(Audio.wavFor(id, n))
      assert(sr == Audio.sampleRateFor(id))
      assert(samples.length == n)
      (0 until n).foreach { i =>
        assert(samples(i) == Audio.sampleAt(id, i.toLong), s"id=$id i=$i")
      }
    }
  }

  test("negative amplitudes survive the s16le encode/decode") {
    // doc_id chosen so (31*id) % 65536 = 32705 sits just under the sign
    // boundary: the +7i ramp crosses it at i=9, so both signs occur.
    val (_, samples) = Audio.parseWav(Audio.wavFor(1055L, 500))
    assert(samples.exists(_ < 0) && samples.exists(_ > 0))
    assert(samples.forall(s => s >= -32768 && s <= 32767))
  }

  test("malformed containers throw instead of decoding to zeros") {
    val good = Audio.wavFor(1L, 10)
    intercept[IllegalArgumentException](Audio.parseWav(good.take(20)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Audio.parseWav(badMagic))
    val badBits = good.clone(); badBits(34) = 8.toByte
    intercept[IllegalArgumentException](Audio.parseWav(badBits))
    val shortData = good.clone()
    // inflate declared data size beyond the container
    shortData(40) = 0xff.toByte; shortData(41) = 0xff.toByte
    intercept[IllegalArgumentException](Audio.parseWav(shortData))
  }

  test("window fold equals the scalar reference on awkward lengths") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq((1L, 63L), (2L, 64L), (3L, 65L), (4L, 200L))
      .toDF("doc_id", "n_chars")
    val got = Audio.features(Audio.toAudio(docs)).collect()
      .map(f => f.doc_id -> f).toMap
    docs.collect().foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1).toInt)
      val abs = (0 until n).map(i => math.abs(Audio.sampleAt(id, i.toLong).toLong))
      val wins = abs.grouped(Audio.WindowSamples).map(_.sum).toSeq
      val f = got(id)
      assert(f.n_samples == n && f.n_windows == wins.size)
      assert(f.tot_abs == abs.sum && f.max_win_abs == wins.max,
        s"doc $id windowed fold mismatch")
      assert(f.sample_rate == Audio.sampleRateFor(id))
    }
  }

  test("vad run census equals an independent run-length recompute") {
    // Independent reference: split the silence mask into runs with a
    // plain fold (not the kernel's loop), on lengths that exercise the
    // boundary cases — run ending at EOF, run starting at 0, all-silent
    // and no-silent edge docs can't occur with the synthetic signal, so
    // hand-check those two on crafted masks below.
    for (id <- Seq(0L, 1L, 17L, 1055L, 4999L); n <- Seq(1, 7, 8, 9, 200, 500)) {
      val row = Audio.vad(Audio.wavFor(id, n))
      val mask = (0 until n).map(i =>
        math.abs(Audio.sampleAt(id, i.toLong)) < Audio.VadThreshold)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (start, len)
      var i = 0
      while (i < n) {
        if (mask(i)) {
          val start = i
          while (i < n && mask(i)) i += 1
          runs += ((start, i - start))
        } else i += 1
      }
      assert(row.getLong(0) == n.toLong, s"id=$id n=$n n_samples")
      assert(row.getLong(1) == runs.map(_._2).sum.toLong, s"id=$id n=$n n_silent")
      assert(row.getLong(2) == runs.count(_._2 >= Audio.VadMinRun).toLong,
        s"id=$id n=$n n_runs")
      assert(row.getLong(3) == (if (runs.isEmpty) 0L else runs.map(_._2).max.toLong),
        s"id=$id n=$n max_run")
      assert(row.getLong(4) ==
        runs.find(_._1 == 0).map(_._2.toLong).getOrElse(0L),
        s"id=$id n=$n lead_run")
    }
  }
}

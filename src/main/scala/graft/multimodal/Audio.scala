package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One audio object: a REAL RIFF/WAVE container (canonical 44-byte PCM
  * header + s16le samples) carried as an opaque binary column. */
case class AudioRecord(doc_id: Long, wav: Array[Byte])

/** Features the decode stage EARNS by parsing the container bytes. */
case class AudioFeatures(doc_id: Long, sample_rate: Long, n_samples: Long,
    n_windows: Long, tot_abs: Long, max_win_abs: Long)

/** Audio leg of the multimodal column family (brief: image/audio/video as
  * opaque binary + typed metadata): every document becomes a WAV object
  * whose header fields — 'RIFF'/'WAVE'/'fmt ' magics, PCM format tag,
  * channel count, little-endian sample rate, 'data' chunk length — are
  * written and then parsed back out of the bytes by [[parseWav]] (a
  * genuine signature check + field decode; malformed containers throw,
  * they do not flow on as zeros — the [[Multimodal.parseDims]] contract).
  *
  * The SAMPLE VALUES are a deterministic function of (doc_id, index)
  * (`sampleAt`), so the DuckDB oracle replays the windowed-energy math
  * arithmetically while the Spark side must earn it through the s16le
  * byte decode — a wrong endianness or a misplaced data offset fails the
  * hash compare. (No audio codecs exist in this container, so PCM
  * synthesis IS the honest stand-in; the parse/window/aggregate plumbing
  * — batch iteration, schema, shuffle-free explosion — is the real
  * deliverable, per the multimodal stubbing mandate.)
  *
  * Scale shape: map-only synthesis and decode (mapPartitions batch at a
  * time, no shuffle); windowed energy folds inside the per-object loop so
  * the operator emits one bounded feature row per object regardless of
  * duration. */
object Audio {
  /** Samples per analysis window (fixed, both engines). */
  val WindowSamples = 64

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Deterministic per-object sample rate, 8000..16000 Hz. */
  def sampleRateFor(docId: Long): Int = (8000L + (docId * 13) % 8001L).toInt

  /** Deterministic s16 sample value at index i. */
  def sampleAt(docId: Long, i: Long): Int =
    ((docId * 31 + i * 7) % 65536L - 32768L).toInt

  /** Canonical 44-byte PCM WAV container with n s16le mono samples. */
  def wavFor(docId: Long, nSamples: Int): Array[Byte] = {
    // dataBytes = nSamples * 2 in Int: reject sizes that would wrap to a
    // negative count and surface later as a confusing parseWav overrun
    // (the Multimodal.scala explicit len.toInt overflow-handling contract).
    require(nSamples >= 0 && nSamples <= (Int.MaxValue - 44) / 2,
      s"audio object too large: $nSamples samples overflows the container size")
    val sr = sampleRateFor(docId)
    val dataBytes = nSamples * 2
    val b = new java.io.ByteArrayOutputStream(44 + dataBytes)
    b.write("RIFF".getBytes("US-ASCII")); b.write(le32(36L + dataBytes))
    b.write("WAVE".getBytes("US-ASCII"))
    b.write("fmt ".getBytes("US-ASCII")); b.write(le32(16L))
    b.write(le16(1)) // PCM
    b.write(le16(1)) // mono
    b.write(le32(sr.toLong))
    b.write(le32(sr.toLong * 2)) // byte rate = sr * channels * 16/8
    b.write(le16(2)) // block align
    b.write(le16(16)) // bits per sample
    b.write("data".getBytes("US-ASCII")); b.write(le32(dataBytes.toLong))
    var i = 0L
    while (i < nSamples) { b.write(le16(sampleAt(docId, i) & 0xffff)); i += 1 }
    b.toByteArray
  }

  /** Parse a canonical PCM WAV: verify magics and format fields, return
    * (sampleRate, samples). Throws on any malformed container. */
  def parseWav(wav: Array[Byte]): (Int, Array[Int]) = {
    def u8(i: Int): Int = wav(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def ascii(i: Int, n: Int): String = new String(wav, i, n, "US-ASCII")
    require(wav.length >= 44, s"truncated container: ${wav.length} bytes")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
      "not a RIFF/WAVE container")
    require(ascii(12, 4) == "fmt " && u32(16) == 16, "missing canonical fmt chunk")
    require(u16(20) == 1, s"not PCM: format tag ${u16(20)}")
    require(u16(22) == 1, s"not mono: ${u16(22)} channels")
    require(u16(34) == 16, s"not s16: ${u16(34)} bits")
    val sr = u32(24).toInt
    require(ascii(36, 4) == "data", "missing data chunk at canonical offset")
    val dataBytes = u32(40)
    require(44 + dataBytes <= wav.length, "data chunk overruns container")
    val n = (dataBytes / 2).toInt
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val raw = u16(44 + 2 * i)
      out(i) = if (raw >= 0x8000) raw - 0x10000 else raw // s16le
      i += 1
    }
    (sr, out)
  }

  /** Wrap every document as an audio object: one sample per text char. */
  def toAudio(docs: DataFrame)(implicit spark: SparkSession): Dataset[AudioRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .filter(col("n_chars") >= 1)
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, n) =>
        // guard BEFORE the silent n.toInt truncation — a >2^31-char doc
        // must fail loudly here, not wrap into a malformed container
        require(n <= (Int.MaxValue - 44) / 2,
          s"doc $id: $n chars exceeds the single-object WAV capacity")
        AudioRecord(id, wavFor(id, n.toInt))
      })
  }

  /** Decode + windowed energy: per object, total |amplitude| and the
    * hottest WindowSamples-sample window's |amplitude| mass. */
  def features(audio: Dataset[AudioRecord])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions(_.map { r =>
      val (sr, samples) = parseWav(r.wav)
      var tot = 0L; var winAbs = 0L; var maxWin = 0L
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toLong)
        tot += a; winAbs += a
        if ((i + 1) % WindowSamples == 0 || i == samples.length - 1) {
          if (winAbs > maxWin) maxWin = winAbs
          winAbs = 0L
        }
        i += 1
      }
      val nw = (samples.length + WindowSamples - 1) / WindowSamples
      AudioFeatures(r.doc_id, sr.toLong, samples.length.toLong, nw.toLong, tot, maxWin)
    })
  }
}

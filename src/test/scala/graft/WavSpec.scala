package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Audio, AudioMeta, AudioRecord, Wav}

/** Unit tests for the RIFF/WAVE PCM-16 codec and the audio feature
  * pipeline — the audio twin of NetpbmSpec. */
class WavSpec extends AnyFunSuite with SparkFixture {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("mono round-trip: encode then decode preserves rate and samples") {
    val s = Array[Short](0, 1000, -1000, 32767, -32768, 12345)
    val a = Wav.decode(Wav.encode(16000, 1, s)).get
    assert((a.sampleRate, a.channels) === ((16000, 1)))
    assert(a.samples.toSeq === s.toSeq)
  }

  test("stereo round-trip preserves interleaved channels") {
    val s = Array[Short](100, -100, 200, -200, 300, -300)
    val a = Wav.decode(Wav.encode(44100, 2, s)).get
    assert((a.sampleRate, a.channels) === ((44100, 2)))
    assert(a.samples.toSeq === s.toSeq)
  }

  test("unknown chunks are skipped, including odd-size word alignment") {
    // hand-build RIFF: a 3-byte LIST chunk (odd → 1 pad byte) before fmt
    val tail = Wav.encode(8000, 1, Array[Short](5, 6, 7, 8)).drop(12)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4 + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 4 + tail.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // 3 payload bytes + alignment pad
      .put(tail)
    val a = Wav.decode(bb.array()).get
    assert(a.samples.toSeq === Seq[Short](5, 6, 7, 8))
  }

  test("malformed inputs decode to None") {
    val ok = Wav.encode(8000, 1, Array[Short](1, 2, 3, 4))
    assert(Wav.decode(Array.emptyByteArray) === None)
    assert(Wav.decode("RIFFxxxxJUNK".getBytes("US-ASCII")) === None)
    // truncated raster: data chunk declares more bytes than remain
    assert(Wav.decode(ok.dropRight(2)) === None)
    // data before any fmt chunk
    val noFmt = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(4)
      .putShort(1).putShort(2)
    assert(Wav.decode(noFmt.array()) === None)
    // header only, no data chunk at all
    assert(Wav.decode(ok.take(36)) === None)
    // hostile chunk size near Int.MaxValue: `pos + 8 + size` in Int
    // wrapped negative and sailed past the bound check into a ~2 GB
    // allocation — the guard must compare in Long and decode to None
    val hostile = ok.clone()
    val bb = java.nio.ByteBuffer.wrap(hostile)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 4) // the data chunk's declared size
    assert(Wav.decode(hostile) === None)
  }

  test("non-PCM-16 formats are rejected by design") {
    def patched(off: Int, v: Short): Array[Byte] = {
      val b = Wav.encode(8000, 1, Array[Short](1, 2))
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(off, v)
      b
    }
    assert(Wav.decode(patched(20, 3)) === None)  // IEEE float format tag
    assert(Wav.decode(patched(34, 24)) === None) // 24-bit samples
    assert(Wav.decode(patched(22, 0)) === None)  // zero channels
    assert(Wav.decode(patched(22, 100)) === None) // implausible channels
  }

  test("decimate keeps every factor-th frame with all its channels") {
    // 6 stereo frames, sample value = 10*frame + channel
    val stereo = Array.tabulate[Short](12)(i => (10 * (i / 2) + i % 2).toShort)
    val a = Wav.Audio(48000, 2, stereo)
    val half = Wav.decimate(a, 2)
    assert(half.sampleRate === 24000 && half.channels === 2)
    assert(half.samples.toSeq === Seq[Short](0, 1, 20, 21, 40, 41))
    // factor 1 is the identity
    assert(Wav.decimate(a, 1).samples.toSeq === a.samples.toSeq)
    // frame count rounds UP (frame 0 always kept): 5 mono frames / 2 -> 3
    val mono = Wav.Audio(16000, 1, Array.tabulate[Short](5)(_.toShort))
    assert(Wav.decimate(mono, 2).samples.toSeq === Seq[Short](0, 2, 4))
    // the decimated audio re-encodes and decodes back identically
    val rt = Wav.decode(Wav.encode(half.sampleRate, half.channels,
      half.samples)).get
    assert(rt.sampleRate === 24000 && rt.samples.toSeq === half.samples.toSeq)
  }

  test("features: duration, RMS, peak, and bins from known samples") {
    // 16 frames at 8000 Hz, constant half-scale amplitude
    val half = (16384).toShort
    val (dur, rms, peak, energy) = Wav.features(
      Wav.decode(Wav.encode(8000, 1, Array.fill(16)(half))).get)
    assert(dur === 16.0 / 8000)
    val amp = 16384 / 32768.0
    assert(math.abs(rms - amp) < 1e-12)
    assert(peak === amp)
    // constant signal: every bin holds the same mean-square energy
    assert(energy.forall(e => math.abs(e - amp * amp) < 1e-12))
    // silence is all zeros
    val (_, rms0, peak0, e0) = Wav.features(
      Wav.decode(Wav.encode(8000, 1, Array.fill(4)(0.toShort))).get)
    assert(rms0 === 0.0 && peak0 === 0.0 && e0.forall(_ === 0.0))
  }

  test("features: stereo mixes to mono before measuring") {
    // L = +x, R = -x: the mono mix cancels to silence
    val s = Array[Short](2000, -2000, 3000, -3000)
    val (_, rms, peak, _) = Wav.features(Wav.decode(Wav.encode(8000, 2, s)).get)
    assert(rms === 0.0 && peak === 0.0)
  }

  test("audio pipeline: real codec features, deterministic, invalid flagged") {
    implicit val s = spark
    import spark.implicits._
    val media = Audio.withAudioColumn(docs((1L, "abcd"), (2L, "zzzz")))
    val records = media.collect().sortBy(_.doc_id)
    val feats = Audio.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.map(_.doc_id).toSeq === Seq(1L, 2L))
    val f1 = feats.head
    // doc 1 (odd id): mono, 101 frames at 8000 Hz
    assert(f1.format === "wav")
    assert(f1.n_bytes === records.head.media.length)
    assert(f1.n_bytes === 44 + 101 * 2)
    assert(math.abs(f1.duration_s - 101.0 / 8000) < 1e-12)
    assert(f1.peak > 0.0 && f1.rms > 0.0 && f1.rms <= f1.peak)
    assert(f1.energy.length === 16)
    // doc 2 (even id): stereo, 102 frames → 2 samples per frame
    assert(feats(1).n_bytes === 44 + 102 * 2 * 2)
    // determinism: a second run produces identical features
    val again = Audio.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(again.map(_.rms).toSeq === feats.map(_.rms).toSeq)
    assert(again.map(_.energy.toSeq).toSeq === feats.map(_.energy.toSeq).toSeq)
    // corrupt payload flags instead of failing
    val bad = spark.createDataset(Seq(
      AudioRecord(9L, "not audio".getBytes("US-ASCII"), AudioMeta("wav", 0, 0))))
    val out = Audio.extractFeatures(bad).collect()
    assert(out.head.format === "invalid" && out.head.energy.forall(_ === 0.0))
  }
}

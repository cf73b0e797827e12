package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed metadata carried alongside an opaque audio payload. */
case class AudioMeta(format: String, sample_rate: Int, n_frames: Int)

/** One audio row: payload is opaque binary, interpreted only inside the
  * decode stage — the audio twin of [[MediaRecord]]. */
case class AudioRecord(doc_id: Long, media: Array[Byte], meta: AudioMeta)

/** Decoded waveform features: wall duration, RMS level, peak amplitude
  * (both on [0,1] full-scale), and a 16-bin temporal energy profile —
  * the audio analog of the image grid. */
case class AudioFeatures(doc_id: Long, format: String, n_bytes: Int,
                         duration_s: Double, rms: Double, peak: Double,
                         energy: Array[Double])

/** Minimal REAL audio codec: RIFF/WAVE holding 16-bit PCM — the image
  * codec's ([[Netpbm]]) audio twin. The container is genuine WAV: RIFF
  * header, chunk walk (unknown chunks skipped with RIFF word alignment),
  * a PCM `fmt ` chunk validated before `data` is accepted. Anything
  * malformed — bad magic, non-PCM, non-16-bit, implausible rates or
  * channel counts, a declared chunk size past the payload end — decodes
  * to None instead of producing features from garbage. 16-bit PCM only:
  * float/ADPCM/24-bit WAVs are rejected by design. */
object Wav {

  /** Decoded audio: interleaved 16-bit PCM frames. */
  case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le(bytes: Array[Byte]) =
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  /** Canonical 44-byte-header WAV: RIFF + `fmt ` (PCM, 16-bit) + `data`. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0, "channels must be positive")
    require(samples.length % channels == 0, "samples not a whole frame count")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Integer-factor DECIMATION resample: keep every `factor`-th frame
    * (all channels of it), sample rate divides by `factor` — the audio
    * twin of [[Netpbm.resize]]'s nearest-neighbor mapping, and like it
    * bit-deterministic pure integer indexing (a real pipeline inserts a
    * low-pass first; decimation is the standard cheap path when the
    * content is speech-band and the factor small). Identity at
    * factor=1. Frame count becomes ⌈frames/factor⌉ (frame 0 always
    * kept). */
  def decimate(a: Audio, factor: Int): Audio = {
    require(factor >= 1, "factor must be >= 1")
    if (factor == 1) a
    else {
      val frames = a.samples.length / a.channels
      val outFrames = (frames + factor - 1) / factor
      val out = new Array[Short](outFrames * a.channels)
      var f = 0
      while (f < outFrames) {
        val src = f * factor * a.channels
        var c = 0
        while (c < a.channels) { out(f * a.channels + c) = a.samples(src + c); c += 1 }
        f += 1
      }
      Audio(a.sampleRate / factor, a.channels, out)
    }
  }

  /** Parse a RIFF/WAVE 16-bit PCM payload; None on anything malformed.
    * Allocation is bounded by the payload length itself (a declared data
    * size larger than the remaining bytes is rejected as truncated), so
    * no separate cap is needed against hostile headers. */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 12) return None
    val bb = le(bytes)
    def str4(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (str4(0) != "RIFF" || str4(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var out: Option[Audio] = None
    while (out.isEmpty && pos + 8 <= bytes.length) {
      val id = str4(pos)
      val size = bb.getInt(pos + 4)
      // Long arithmetic: a hostile size near Int.MaxValue would wrap
      // `pos + 8 + size` negative and sail past this guard straight into
      // a ~2 GB allocation — the exact task-killing crash the
      // decode-to-None contract exists to prevent
      if (size < 0 || pos + 8 + size.toLong > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = bb.getShort(pos + 8) & 0xffff
          val channels = bb.getShort(pos + 10) & 0xffff
          val rate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22) & 0xffff
          if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 8 ||
            rate < 1 || rate > 384000) return None
          fmt = Some((channels, rate))
        case "data" =>
          fmt match {
            case Some((channels, rate)) =>
              if (size % (2 * channels) != 0) return None
              val n = size / 2
              val samples = new Array[Short](n)
              var i = 0
              while (i < n) { samples(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
              out = Some(Audio(rate, channels, samples))
            case None => return None // data before fmt: can't interpret
          }
        case _ => () // unknown chunk (LIST, cue, fact, …): skip
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    out
  }

  /** Waveform features from DECODED samples, channel-mixed to mono and
    * normalized to [-1, 1): duration, RMS, peak, and mean-square energy
    * over 16 equal time bins. */
  def features(a: Audio): (Double, Double, Double, Array[Double]) = {
    val frames = a.samples.length / a.channels
    val energy = Array.fill(16)(0.0)
    if (frames == 0) return (0.0, 0.0, 0.0, energy)
    val counts = Array.fill(16)(0L)
    var sumSq = 0.0
    var peak = 0.0
    var f = 0
    while (f < frames) {
      var c = 0
      var acc = 0.0
      while (c < a.channels) {
        acc += a.samples(f * a.channels + c) / 32768.0
        c += 1
      }
      val mono = acc / a.channels
      val sq = mono * mono
      sumSq += sq
      if (math.abs(mono) > peak) peak = math.abs(mono)
      val bin = (f.toLong * 16 / frames).toInt
      energy(bin) += sq
      counts(bin) += 1
      f += 1
    }
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) energy(b) /= counts(b)
      b += 1
    }
    (frames.toDouble / a.sampleRate, math.sqrt(sumSq / frames), peak, energy)
  }
}

/** Audio column plumbing — the [[Multimodal]] pattern applied to sound:
  * opaque binary WAV payloads with typed metadata, decoded and
  * feature-extracted inside a batched `mapPartitions` stage (no shuffle,
  * no driver involvement, corrupt payloads flagged instead of fatal).
  * Only the payload SYNTHESIS in [[Audio.withAudioColumn]] is synthetic
  * (the test corpus has no audio column); the codec and the features are
  * real, and the waveform generator is pure integer arithmetic so the
  * payloads are bit-identical across runs and platforms. */
object Audio {

  val BatchSize = 64

  /** Attach a synthetic audio column to `documents`: a REAL encoded WAV
    * (mono for odd ids, stereo for even) whose PCM samples derive
    * deterministically from the text bytes. */
  def withAudioColumn(docs: DataFrame)(implicit spark: SparkSession): Dataset[AudioRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val rate = 8000
        val channels = if (id % 2 == 0) 2 else 1
        val frames = (id % 800 + 100).toInt
        val tb = text.getBytes("UTF-8")
        val samples = Array.tabulate(frames * channels) { i =>
          val b = if (tb.isEmpty) (i * 31 + id).toInt & 0xff
                  else tb(i % tb.length) & 0xff
          // integer-only: a byte-driven carrier plus a slow position
          // ramp, spanning a wide dynamic range without overflow; the
          // ramp is computed on the LONG id (ADVICE r15: `id.toInt`
          // wrapped negative past 2^31, diverging from the oracle's
          // BIGINT `(i*37 + doc_id) % 64` — value-identical on any
          // non-negative doc_id that fits an Int, so the corpus
          // payloads are unchanged)
          (((b - 128) * 200) + ((((i * 37 + id) % 64).toInt - 32) * 50)).toShort
        }
        AudioRecord(id, Wav.encode(rate, channels, samples),
          AudioMeta("wav", rate, frames))
    }
  }

  /** Batched decode + feature extraction; undecodable payloads yield a
    * flagged `format="invalid"` row (zero features) — corrupt media must
    * not kill a 100 TB pass. */
  def extractFeatures(media: Dataset[AudioRecord])(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Wav.decode(r.media) match {
            case Some(audio) =>
              val (dur, rms, peak, energy) = Wav.features(audio)
              AudioFeatures(r.doc_id, "wav", r.media.length, dur, rms, peak,
                energy)
            case None =>
              AudioFeatures(r.doc_id, "invalid", r.media.length, 0.0, 0.0,
                0.0, Array.fill(16)(0.0))
          }
        }
      }
    }
  }

  /** Batched audio TRANSFORM: decode → integer-factor decimation →
    * re-encode, inside the one codec boundary ([[Multimodal
    * .resizeMedia]]'s audio twin). Undecodable payloads dropped — a
    * transform emits only valid media. */
  def resampleAudio(media: Dataset[AudioRecord], factor: Int)(
      implicit spark: SparkSession): Dataset[AudioRecord] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          Wav.decode(r.media).map { a =>
            val d = Wav.decimate(a, factor)
            AudioRecord(r.doc_id, Wav.encode(d.sampleRate, d.channels,
              d.samples), AudioMeta("wav", d.sampleRate,
              d.samples.length / d.channels))
          }
        }
      }
    }
  }

  /** Driver query: decimate the synthetic audio corpus 2× and
    * fingerprint the re-encoded payloads (scalar columns only). */
  def mediaResampleQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val media = withAudioColumn(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism))
    resampleAudio(media, 2).toDF()
      .select(col("doc_id"), col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"),
        length(col("media")).as("n_bytes"),
        // xxhash64, not md5 (r15): the XXH64 SQL replay hashes the
        // SQL-reconstructed WAV bytes — full value oracle
        xxhash64(col("media")).as("media_fp"))
  }

  /** Driver entry: attach audio column, decode, flat scalar feature
    * frame. The 16-bin energy profile goes out as sixteen scalar
    * columns (r15; previously an md5-of-JSON fingerprint whose float
    * RENDERING differs between engines): every moment here is
    * order-independent EXACT in IEEE double — samples/2¹⁵ are dyadic
    * with ≤16-bit fractions, their squares need ≤32 mantissa bits, and
    * ≤900 sub-1 terms keep every partial sum under 2⁴², so DuckDB's
    * arbitrary-order sums reproduce the loop bit-for-bit and the whole
    * frame is a full value oracle.
    *
    * RAW doubles since r16 (ADVICE r15 #3): the r15 6dp rounding was
    * itself the only cross-engine divergence window (Spark rounds the
    * double's shortest decimal repr HALF_UP, DuckDB rounds the scaled
    * double — they disagree exactly on 7th-digit ties, which the
    * power-of-two denominators here make likely). The UNROUNDED values
    * are bit-identical by the exactness argument above — each output
    * is one correctly-rounded division/sqrt of exact operands — so
    * dropping the rounding removes the divergence window instead of
    * papering over it. */
  def mediaAudioQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val media = withAudioColumn(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism))
    val energyCols = (0 until 16).map(i =>
      col("energy").getItem(i).as(s"e$i"))
    extractFeatures(media).toDF()
      .select(Seq(col("doc_id"), col("format"), col("n_bytes"),
        col("duration_s"), col("rms"), col("peak")) ++ energyCols: _*)
  }
}

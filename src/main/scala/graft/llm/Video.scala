package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed metadata carried alongside an opaque video payload. */
case class VideoMeta(format: String, width: Int, height: Int, n_frames: Int)

/** One video row: payload is opaque binary, interpreted only inside the
  * decode stage — the video member of the [[MediaRecord]] family. */
case class VideoRecord(doc_id: Long, media: Array[Byte], meta: VideoMeta)

/** Frame-sampled video features: stream geometry, the sample count, and
  * luma statistics over the SAMPLED frames — spatial (mean + 4×4 grid
  * averaged across samples) and temporal (mean absolute Y-plane delta
  * between consecutive samples, the motion proxy). */
case class VideoFeatures(doc_id: Long, format: String, n_bytes: Int,
                         n_frames: Int, n_sampled: Int, fps: Double,
                         mean_luma: Double, motion: Double,
                         grid: Array[Double])

/** Minimal REAL video codec: YUV4MPEG2 (`.y4m`) — the uncompressed
  * interchange format mjpegtools/ffmpeg emit. An ASCII stream header
  * (`YUV4MPEG2 W.. H.. F..:..` plus optional tagged params), then per
  * frame an ASCII `FRAME`[params] line followed by the raw planar
  * payload. Supported pixel formats: C420 (4:2:0, the spec default —
  * the C420jpeg/C420mpeg2/C420paldv siting variants share the layout)
  * and Cmono (luma only); anything else, malformed headers, odd-dim
  * 4:2:0, truncated frames, or trailing garbage decode to None.
  * Like [[Netpbm]] and [[Wav]]: a genuine on-disk format parsed
  * strictly, never features hallucinated from garbage. */
object Y4m {

  /** A decoded stream: `frames` hold each frame's full planar payload
    * (Y then Cb then Cr for C420; Y only for mono). */
  case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                   mono: Boolean, frames: IndexedSeq[Array[Byte]]) {
    def lumaPlane(f: Int): Array[Byte] = frames(f) // Y is the prefix
  }

  private val Magic = "YUV4MPEG2"

  def frameBytes(width: Int, height: Int, mono: Boolean): Int =
    if (mono) width * height
    else width * height + 2 * ((width / 2) * (height / 2))

  /** Encode a C420 (or mono) stream; each frame must carry exactly
    * [[frameBytes]] bytes of planar data. */
  def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
             frames: Seq[Array[Byte]], mono: Boolean = false): Array[Byte] = {
    require(mono || (width % 2 == 0 && height % 2 == 0),
      "C420 requires even dimensions")
    val need = frameBytes(width, height, mono)
    frames.foreach(f => require(f.length == need,
      s"frame has ${f.length} bytes, expected $need"))
    val cs = if (mono) "Cmono" else "C420"
    val header = s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 $cs\n"
      .getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.map(_.length + frameHdr.length).sum)
    out.write(header)
    frames.foreach { f => out.write(frameHdr); out.write(f) }
    out.toByteArray
  }

  /** Parse a YUV4MPEG2 payload; None on anything malformed. Allocation
    * is bounded by the payload itself — every frame copy is validated
    * against the remaining bytes first, and the 4096 dim cap bounds the
    * per-frame size a hostile header can claim. */
  def decode(bytes: Array[Byte]): Option[Video] = {
    var eol = -1
    var i = 0
    while (eol < 0 && i < bytes.length) {
      if (bytes(i) == '\n') eol = i
      i += 1
    }
    if (eol < 0) return None
    val header = new String(bytes, 0, eol, "US-ASCII")
    val tokens = header.split(" ").filter(_.nonEmpty)
    if (tokens.isEmpty || tokens.head != Magic) return None
    // the 4096 cap bounds per-frame ALLOCATION, so it applies to W/H
    // only — the framerate ratio never sizes a buffer, and real encoders
    // emit F30000:1001 (NTSC 29.97), which a blanket cap would reject
    def posInt(s: String, max: Int = Int.MaxValue): Option[Int] =
      scala.util.Try(s.toInt).toOption.filter(n => n > 0 && n <= max)
    var w, h = -1
    var fn = 25
    var fd = 1
    var mono = false
    for (t <- tokens.tail) t.head match {
      case 'W' => w = posInt(t.tail, max = 4096).getOrElse(return None)
      case 'H' => h = posInt(t.tail, max = 4096).getOrElse(return None)
      case 'F' => t.tail.split(":") match {
        case Array(n, d) =>
          fn = posInt(n).getOrElse(return None)
          fd = posInt(d).getOrElse(return None)
        case _ => return None
      }
      case 'C' => t match {
        case "Cmono" => mono = true
        case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" => mono = false
        case _ => return None // 422/444/alpha: out of the codec's scope
      }
      case _ => () // I (interlace), A (aspect), X (extensions): ignored
    }
    if (w < 0 || h < 0) return None
    if (!mono && (w % 2 != 0 || h % 2 != 0)) return None
    val perFrame = frameBytes(w, h, mono)
    val frameMagic = "FRAME".getBytes("US-ASCII")
    val frames = Vector.newBuilder[Array[Byte]]
    var pos = eol + 1
    while (pos < bytes.length) {
      // each frame: the ASCII FRAME marker, optional params up to '\n'
      if (pos + frameMagic.length > bytes.length) return None
      var k = 0
      while (k < frameMagic.length) {
        if (bytes(pos + k) != frameMagic(k)) return None
        k += 1
      }
      var nl = pos + frameMagic.length
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      if (nl >= bytes.length) return None
      val dataStart = nl + 1
      if (dataStart + perFrame > bytes.length) return None // truncated
      frames += java.util.Arrays.copyOfRange(bytes, dataStart,
        dataStart + perFrame)
      pos = dataStart + perFrame
    }
    val fs = frames.result()
    if (fs.isEmpty) None
    else Some(Video(w, h, fn, fd, mono, fs))
  }

  /** Frame-sampled features from DECODED luma planes: every
    * `sampleEvery`-th frame contributes its Y plane to the mean, to a
    * 4×4 average-pool grid (averaged across samples), and to the motion
    * proxy (mean |ΔY| between consecutive SAMPLED frames). */
  def features(v: Video, sampleEvery: Int = 2): (Int, Double, Double, Array[Double]) = {
    require(sampleEvery > 0, "sampleEvery must be positive")
    val sampled = v.frames.indices.by(sampleEvery)
    val n = v.width * v.height
    var lumaSum = 0.0
    var motionSum = 0.0
    val grid = Array.fill(16)(0.0)
    val counts = Array.fill(16)(0L)
    var prev: Array[Byte] = null
    for (f <- sampled) {
      val y = v.lumaPlane(f)
      var p = 0
      while (p < n) {
        val l = y(p) & 0xff
        lumaSum += l
        val row = p / v.width
        val cell = (row * 4 / v.height) * 4 + (p % v.width) * 4 / v.width
        grid(cell) += l
        counts(cell) += 1
        if (prev != null) motionSum += math.abs(l - (prev(p) & 0xff))
        p += 1
      }
      prev = y
    }
    var c = 0
    while (c < 16) {
      if (counts(c) > 0) grid(c) /= counts(c)
      c += 1
    }
    val meanLuma = lumaSum / (sampled.size.toLong * n)
    val motion =
      if (sampled.size < 2) 0.0
      else motionSum / ((sampled.size - 1).toLong * n)
    (sampled.size, meanLuma, motion, grid)
  }
}

/** Video column plumbing — the [[Multimodal]] pattern completed for the
  * media triple: opaque binary Y4M payloads with typed metadata, decoded
  * and frame-sampled inside the same batched `mapPartitions` stage. Only
  * the payload SYNTHESIS is synthetic (the test corpus has no video
  * column); the container parse, the frame sampling, and the luma/motion
  * features are real, and the frame generator is pure integer arithmetic
  * so payloads are bit-identical across runs and platforms. */
object Video {

  val BatchSize = 64

  /** Attach a synthetic video column to `documents`: a REAL encoded Y4M
    * stream (C420 for even ids, mono for odd) of 3-10 frames whose luma
    * drifts per frame, so motion is non-zero and deterministic. */
  def withVideoColumn(docs: DataFrame)(implicit spark: SparkSession): Dataset[VideoRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val w = ((id % 16) * 2 + 16).toInt
        val h = ((id % 12) * 2 + 16).toInt
        val mono = id % 2 == 1
        val nFrames = (id % 8 + 3).toInt
        val tb = text.getBytes("UTF-8")
        val perFrame = Y4m.frameBytes(w, h, mono)
        val luma = w * h
        val frames = (0 until nFrames).map { f =>
          Array.tabulate(perFrame) { i =>
            if (i < luma) {
              val b = if (tb.isEmpty) (i * 31 + id).toInt & 0xff
                      else tb(i % tb.length) & 0xff
              ((b + f * 11 + i / 64) & 0xff).toByte // per-frame drift
            } else 128.toByte // flat chroma
          }
        }
        VideoRecord(id, Y4m.encode(w, h, 25, 1, frames, mono),
          VideoMeta("y4m", w, h, nFrames))
    }
  }

  /** Batched decode + frame-sampled feature extraction; undecodable
    * payloads yield a flagged `format="invalid"` row (zero features). */
  def extractFeatures(media: Dataset[VideoRecord], sampleEvery: Int = 2)(
      implicit spark: SparkSession): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Y4m.decode(r.media) match {
            case Some(v) =>
              val (nSampled, meanLuma, motion, grid) =
                Y4m.features(v, sampleEvery)
              VideoFeatures(r.doc_id, if (v.mono) "y4m_mono" else "y4m",
                r.media.length, v.frames.size, nSampled,
                v.fpsNum.toDouble / v.fpsDen, meanLuma, motion, grid)
            case None =>
              VideoFeatures(r.doc_id, "invalid", r.media.length, 0, 0, 0.0,
                0.0, 0.0, Array.fill(16)(0.0))
          }
        }
      }
    }
  }

  /** Batched video TRANSFORM: decode → keep every `every`-th frame
    * (frame 0 always; the fps numerator divides so wall duration is
    * preserved) → re-encode — [[Multimodal.resizeMedia]]'s video twin,
    * completing the transform trio across all three codecs. Streams
    * whose fps numerator does not divide by `every` keep their frame
    * subset with the original fps (duration shrinks — the honest
    * fallback for a ratio that can't stay integral); undecodable
    * payloads are dropped. */
  def sampleFrames(media: Dataset[VideoRecord], every: Int)(
      implicit spark: SparkSession): Dataset[VideoRecord] = {
    require(every >= 1, "every must be >= 1")
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          Y4m.decode(r.media).map { v =>
            val kept = v.frames.indices.by(every).map(v.frames)
            val num = if (v.fpsNum % every == 0) v.fpsNum / every else v.fpsNum
            VideoRecord(r.doc_id,
              Y4m.encode(v.width, v.height, num, v.fpsDen, kept, v.mono),
              VideoMeta("y4m", v.width, v.height, kept.length))
          }
        }
      }
    }
  }

  /** Driver query: 2× frame-sample the synthetic video corpus and
    * fingerprint the re-encoded payloads (scalar columns only). */
  def mediaFramesQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val media = withVideoColumn(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism))
    sampleFrames(media, 2).toDF()
      .select(col("doc_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_frames").as("n_frames"),
        length(col("media")).as("n_bytes"),
        // xxhash64, not md5 (r15): the XXH64 SQL replay hashes the
        // SQL-reconstructed Y4M bytes — full value oracle
        xxhash64(col("media")).as("media_fp"))
  }

  /** Driver entry (r15: full value oracle): luma/motion/grid moments
    * accumulate INTEGER pixel values and |diffs| (< 2⁵³ total), so
    * they are order-independent EXACT in IEEE double and DuckDB's
    * arbitrary-order sums reproduce the loop bit-for-bit — the 4×4
    * grid goes out as sixteen scalar columns (previously an
    * md5-of-JSON fingerprint whose float rendering differs between
    * engines). RAW doubles since r16 (ADVICE r15 #3, the
    * [[graft.llm.Audio.mediaAudioQ]] argument): each output is one
    * correctly-rounded division of exact integer operands, so the
    * unrounded values are bit-identical across engines and the 6dp
    * rounding — the only remaining divergence window (7th-digit ties
    * under two different HALF_UP implementations, observed live on
    * doc 252's 131.4734375) — is simply dropped. */
  def mediaVideoQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val media = withVideoColumn(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism))
    val gridCols = (0 until 16).map(i =>
      col("grid").getItem(i).as(s"g$i"))
    extractFeatures(media).toDF()
      .select(Seq(col("doc_id"), col("format"), col("n_bytes"),
        col("n_frames"), col("n_sampled"), col("fps"),
        col("mean_luma"), col("motion")) ++ gridCols: _*)
  }

  /** Cross-modality media health rollup: per (modality, format) —
    * including each codec's `invalid` bucket — row counts, byte
    * volume, and the decode success rate per modality. The one table
    * an ingest operator reads to see WHICH pipeline is rotting (a
    * rising image `invalid` share = a scraper handing us truncated
    * files; audio fine, video fine ⇒ it's not the transport). Each
    * modality pays its one batched `mapPartitions` decode pass (the
    * codec boundary — features are computed anyway in a real pipeline;
    * this reuses the same pass shape), then everything collapses
    * map-side-combined to a ≤ (3 × formats)-row frame.
    *
    * Determinism: counts and byte sums are exact integers; the rate is
    * an exact-int ratio rounded 4dp — but the media columns are
    * deterministic synthetic payloads, so the whole report replays
    * bit-identically. */
  def mediaReport(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val img = Multimodal.extractFeatures(Multimodal.withMediaColumn(docs))
      .toDF().select(lit("image").as("modality"), col("format"),
        col("n_bytes").cast("long"))
    val aud = Audio.extractFeatures(Audio.withAudioColumn(docs))
      .toDF().select(lit("audio").as("modality"), col("format"),
        col("n_bytes").cast("long"))
    val vid = extractFeatures(withVideoColumn(docs))
      .toDF().select(lit("video").as("modality"), col("format"),
        col("n_bytes").cast("long"))
    val cells = img.unionByName(aud).unionByName(vid)
      .groupBy(col("modality"), col("format"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_bytes")).as("total_bytes"))
    val w = Window.partitionBy("modality")
    cells.withColumn("decode_rate",
      round(sum(when(col("format") =!= "invalid", col("n_files"))
        .otherwise(0L)).over(w).cast("double") /
        sum(col("n_files")).over(w), 4))
  }

  def mediaReportQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    mediaReport(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Video, VideoMeta, VideoRecord, Y4m}

/** Unit tests for the YUV4MPEG2 codec and the frame-sampled video
  * feature pipeline — the video member of NetpbmSpec/WavSpec. */
class Y4mSpec extends AnyFunSuite with SparkFixture {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def frame(w: Int, h: Int, mono: Boolean)(y: Int => Int): Array[Byte] = {
    val luma = w * h
    Array.tabulate(Y4m.frameBytes(w, h, mono)) { i =>
      if (i < luma) y(i).toByte else 128.toByte
    }
  }

  test("C420 round-trip preserves geometry, fps, and every frame") {
    val fs = (0 until 3).map(f => frame(4, 4, mono = false)(i => i * 10 + f))
    val v = Y4m.decode(Y4m.encode(4, 4, 30, 1, fs)).get
    assert((v.width, v.height, v.fpsNum, v.fpsDen, v.mono) ===
      ((4, 4, 30, 1, false)))
    assert(v.frames.size === 3)
    v.frames.zip(fs).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("mono round-trip and unknown header params are tolerated") {
    val fs = Seq(frame(3, 2, mono = true)(_ * 40)) // odd dims legal in mono
    val v = Y4m.decode(Y4m.encode(3, 2, 24, 1, fs, mono = true)).get
    assert((v.width, v.height, v.mono) === ((3, 2, true)))
    // hand-built header with X extension and FRAME params
    val raw = "YUV4MPEG2 W2 H2 F25:1 Xcustom=1 Cmono\nFRAME Ipt\n"
      .getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    val v2 = Y4m.decode(raw).get
    assert(v2.frames.head.toSeq === Seq[Byte](1, 2, 3, 4))
  }

  test("malformed inputs decode to None") {
    val ok = Y4m.encode(4, 4, 25, 1,
      Seq(frame(4, 4, mono = false)(identity)))
    assert(Y4m.decode(Array.emptyByteArray) === None)
    assert(Y4m.decode("MPEG4 W4 H4\n".getBytes("US-ASCII")) === None)
    // no newline ending the stream header
    assert(Y4m.decode("YUV4MPEG2 W4 H4".getBytes("US-ASCII")) === None)
    // missing dims, zero dims, dims past the 4096 cap
    assert(Y4m.decode("YUV4MPEG2 W4\nFRAME\n".getBytes("US-ASCII")) === None)
    assert(Y4m.decode("YUV4MPEG2 W0 H4\n".getBytes("US-ASCII")) === None)
    assert(Y4m.decode(("YUV4MPEG2 W5000 H5000\nFRAME\n")
      .getBytes("US-ASCII")) === None)
    // odd dims under 4:2:0 subsampling
    assert(Y4m.decode("YUV4MPEG2 W3 H4\nFRAME\n".getBytes("US-ASCII")
      ++ Array.fill(18)(0.toByte)) === None)
    // unsupported colorspace
    assert(Y4m.decode("YUV4MPEG2 W4 H4 C444\n".getBytes("US-ASCII")) === None)
    // truncated final frame / trailing garbage after a frame
    assert(Y4m.decode(ok.dropRight(1)) === None)
    assert(Y4m.decode(ok ++ "JUNK".getBytes("US-ASCII")) === None)
    // zero frames is not a video
    assert(Y4m.decode("YUV4MPEG2 W4 H4\n".getBytes("US-ASCII")) === None)
  }

  test("NTSC framerate F30000:1001 decodes: the dim cap is W/H-only") {
    // ffmpeg emits exactly this for 29.97 fps material; the 4096
    // allocation cap must not apply to the framerate ratio
    val v = Y4m.decode(Y4m.encode(4, 4, 30000, 1001,
      Seq(frame(4, 4, mono = false)(identity)))).get
    assert(v.fpsNum === 30000 && v.fpsDen === 1001)
  }

  test("features: sampling picks every k-th frame; luma and motion exact") {
    // 4 mono 2x2 frames with constant planes 10, 20, 30, 40
    val fs = (0 until 4).map(f => frame(2, 2, mono = true)(_ => (f + 1) * 10))
    val v = Y4m.decode(Y4m.encode(2, 2, 25, 1, fs, mono = true)).get
    // sampleEvery=2 → frames 0 and 2: mean (10+30)/2, motion |30-10|
    val (n2, mean2, motion2, grid2) = Y4m.features(v, sampleEvery = 2)
    assert(n2 === 2)
    assert(mean2 === 20.0)
    assert(motion2 === 20.0)
    // constant planes: the 4 cells a 2x2 frame lands in hold the mean,
    // the unpopulated cells stay zero
    assert(Seq(0, 2, 8, 10).map(grid2) === Seq(20.0, 20.0, 20.0, 20.0))
    assert(grid2.zipWithIndex.filterNot(p => Seq(0, 2, 8, 10).contains(p._2))
      .forall(_._1 === 0.0))
    // sampleEvery=1 → all frames: mean 25, motion mean(10,10,10)
    val (n1, mean1, motion1, _) = Y4m.features(v, sampleEvery = 1)
    assert((n1, mean1, motion1) === ((4, 25.0, 10.0)))
    // a single sampled frame has zero motion by definition
    val (n4, _, motion4, _) = Y4m.features(v, sampleEvery = 4)
    assert((n4, motion4) === ((1, 0.0)))
  }

  test("sampleFrames keeps every k-th frame, halves fps, drops corrupt rows") {
    implicit val s = spark
    import s.implicits._
    // 5 distinct mono frames at 30 fps, sampled 2x -> frames 0,2,4 at 15
    val fs = (0 until 5).map(f => frame(4, 2, mono = true)(i => i + 50 * f))
    val payload = Y4m.encode(4, 2, 30, 1, fs, mono = true)
    val rows = spark.createDataset(Seq(
      VideoRecord(1L, payload, VideoMeta("y4m", 4, 2, 5)),
      VideoRecord(2L, "garbage".getBytes("US-ASCII"), VideoMeta("y4m", 0, 0, 0))))
    val out = Video.sampleFrames(rows, 2).collect()
    assert(out.length === 1 && out.head.doc_id === 1L) // corrupt row dropped
    val v = Y4m.decode(out.head.media).get
    assert(v.frames.size === 3 && (v.fpsNum, v.fpsDen) === ((15, 1)))
    assert(v.frames(0).toSeq === fs(0).toSeq)
    assert(v.frames(1).toSeq === fs(2).toSeq)
    assert(v.frames(2).toSeq === fs(4).toSeq)
    assert(out.head.meta.n_frames === 3)
    // NTSC 30000:1001 by 7: numerator does not divide -> fps kept as-is
    val ntsc = spark.createDataset(Seq(VideoRecord(3L,
      Y4m.encode(4, 2, 30000, 1001, fs, mono = true),
      VideoMeta("y4m", 4, 2, 5))))
    val n = Y4m.decode(Video.sampleFrames(ntsc, 7).collect().head.media).get
    assert((n.fpsNum, n.fpsDen) === ((30000, 1001)) && n.frames.size === 1)
  }

  test("video pipeline: real codec features, deterministic, invalid flagged") {
    implicit val s = spark
    import spark.implicits._
    val media = Video.withVideoColumn(docs((1L, "abcd"), (2L, "zzzz")))
    val records = media.collect().sortBy(_.doc_id)
    val feats = Video.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.map(_.doc_id).toSeq === Seq(1L, 2L))
    val f1 = feats.head
    // doc 1 (odd id): mono 18x18, 4 frames → 2 sampled at the default
    assert(f1.format === "y4m_mono")
    assert(f1.n_bytes === records.head.media.length)
    assert((f1.n_frames, f1.n_sampled, f1.fps) === ((4, 2, 25.0)))
    // per-frame luma drift of +11 over a sampling stride of 2 ⇒ the
    // motion proxy is exactly 22 (no wraparound at these sizes)
    assert(math.abs(f1.motion - 22.0) < 1e-9)
    assert(f1.grid.length === 16)
    // doc 2 (even id): C420 color, 5 frames → 3 sampled
    assert(feats(1).format === "y4m")
    assert((feats(1).n_frames, feats(1).n_sampled) === ((5, 3)))
    // determinism: a second run produces identical features
    val again = Video.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(again.map(_.mean_luma).toSeq === feats.map(_.mean_luma).toSeq)
    assert(again.map(_.grid.toSeq).toSeq === feats.map(_.grid.toSeq).toSeq)
    // corrupt payload flags instead of failing
    val bad = spark.createDataset(Seq(
      VideoRecord(9L, "not video".getBytes("US-ASCII"), VideoMeta("y4m", 0, 0, 0))))
    val out = Video.extractFeatures(bad).collect()
    assert(out.head.format === "invalid" && out.head.n_frames === 0)
  }

  test("media_report: three modalities, conserving counts, clean rates") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = Video.mediaReportQ(spark, sfDir)
    import spark.implicits._
    val perModality = out.groupBy("modality")
      .agg(sum(col("n_files")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(perModality.keySet === Set("image", "audio", "video"))
    assert(perModality.values.forall(_ === n))
    // the synthetic payloads all decode: rate 1.0, no invalid bucket
    assert(out.filter(col("decode_rate") =!= 1.0).isEmpty)
    assert(out.filter(col("format") === "invalid").isEmpty)
    assert(out.filter(col("total_bytes") <= 0).isEmpty)
  }
}

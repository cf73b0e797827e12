package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Netpbm

/** Unit tests for the binary Netpbm (P6/P5) codec: round-trips through
  * the encoders, header edge cases (comments, odd whitespace), and the
  * malformed-input paths that must yield None rather than garbage. */
class NetpbmSpec extends AnyFunSuite {

  private def gray(n: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(n)(i => f(i).toByte)

  test("P6 round-trip: encode then decode preserves dims and raster") {
    val rgb = gray(2 * 2 * 3)(i => i * 20)
    val img = Netpbm.decode(Netpbm.encodeP6(2, 2, rgb)).get
    assert(img.format === "ppm")
    assert((img.width, img.height, img.channels) === ((2, 2, 3)))
    assert(img.raster.toSeq === rgb.toSeq)
  }

  test("P5 round-trip: encode then decode preserves dims and raster") {
    val g = gray(3 * 2)(i => 40 * i)
    val img = Netpbm.decode(Netpbm.encodeP5(3, 2, g)).get
    assert(img.format === "pgm")
    assert((img.width, img.height, img.channels) === ((3, 2, 1)))
    assert(img.raster.toSeq === g.toSeq)
  }

  test("header comments and mixed whitespace are skipped") {
    val raster = gray(4)(_ => 7)
    val bytes = "P5 # magic comment\n# a full comment line\n2\t2\r\n255\n"
      .getBytes("US-ASCII") ++ raster
    val img = Netpbm.decode(bytes).get
    assert((img.width, img.height) === ((2, 2)))
    assert(img.raster.toSeq === raster.toSeq)
  }

  test("raster bytes that look like whitespace or '#' survive intact") {
    // 0x0a (newline), 0x20 (space), 0x23 ('#') inside the raster must be
    // treated as pixels, not header syntax
    val raster = Array[Byte](0x0a, 0x20, 0x23, 0x00)
    val img = Netpbm.decode(Netpbm.encodeP5(2, 2, raster)).get
    assert(img.raster.toSeq === raster.toSeq)
  }

  test("malformed inputs decode to None") {
    val ok = Netpbm.encodeP5(2, 2, gray(4)(_ => 1))
    assert(Netpbm.decode(Array.emptyByteArray) === None)
    assert(Netpbm.decode("garbage".getBytes("US-ASCII")) === None)
    // bad magic (P4 is bitmap, unsupported)
    assert(Netpbm.decode("P4\n2 2\n255\n"
      .getBytes("US-ASCII")) === None)
    // truncated raster: drop the last byte
    assert(Netpbm.decode(ok.dropRight(1)) === None)
    // header only, no raster at all
    assert(Netpbm.decode("P5\n2 2\n255\n".getBytes("US-ASCII")) === None)
    // non-numeric and non-positive dims
    assert(Netpbm.decode("P5\nx 2\n255\n".getBytes("US-ASCII")) === None)
    assert(Netpbm.decode("P5\n0 2\n255\n".getBytes("US-ASCII")) === None)
  }

  test("maxval other than 255 is rejected (8-bit-only decoder)") {
    val raster = gray(4)(_ => 3)
    assert(Netpbm.decode("P5\n2 2\n15\n".getBytes("US-ASCII") ++ raster) === None)
    assert(Netpbm.decode("P5\n2 2\n65535\n".getBytes("US-ASCII")
      ++ gray(8)(_ => 0)) === None)
  }

  test("dimension cap bounds hostile headers at 4096") {
    // a tiny payload claiming a huge raster must be rejected by the dim
    // cap before any allocation is attempted
    assert(Netpbm.decode("P6\n500000 500000\n255\n\u0000"
      .getBytes("US-ASCII")) === None)
    assert(Netpbm.decode("P5\n4097 1\n255\n".getBytes("US-ASCII")
      ++ gray(4097)(_ => 0)) === None)
    // 4096 itself is allowed
    assert(Netpbm.decode("P5\n4096 1\n255\n".getBytes("US-ASCII")
      ++ gray(4096)(_ => 0)).isDefined)
  }

  test("features: grayscale mean/grid are plain byte averages") {
    val img = Netpbm.decode(Netpbm.encodeP5(4, 4, gray(16)(i => i))).get
    val (mean, grid) = Netpbm.features(img)
    assert(mean === (0 until 16).sum / 16.0)
    // 4x4 image on a 4x4 grid: each cell is exactly its own pixel
    assert(grid.toSeq === (0 until 16).map(_.toDouble))
  }

  test("resize: nearest-neighbor picks floor(target*src/dst) sources exactly") {
    // 4x4 grayscale with pixel value = index: downsample to 2x2 must
    // sample sources (0,0) (2,0) (0,2) (2,2) -> bytes 0, 2, 8, 10
    val g4 = Array.tabulate(16)(_.toByte)
    val img = Netpbm.decode(Netpbm.encodeP5(4, 4, g4)).get
    val small = Netpbm.resize(img, 2, 2)
    assert(small.raster.toSeq === Seq[Byte](0, 2, 8, 10))
    assert((small.width, small.height, small.channels) === ((2, 2, 1)))
    // identity at the same size
    val same = Netpbm.resize(img, 4, 4)
    assert(same.raster.toSeq === img.raster.toSeq)
    // upscale 2x2 -> 4x4 replicates each source into a 2x2 block
    val up = Netpbm.resize(small, 4, 4)
    assert(up.raster.toSeq === Seq[Byte](0, 0, 2, 2, 0, 0, 2, 2,
      8, 8, 10, 10, 8, 8, 10, 10))
    // round trip: the re-encoded payload decodes back to the same image
    val back = Netpbm.decode(Netpbm.encode(small)).get
    assert(back.raster.toSeq === small.raster.toSeq &&
      back.width === 2 && back.height === 2 && back.channels === 1)
    // RGB channels move together
    val rgb = Array[Int](255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val c = Netpbm.decode(Netpbm.encodeP6(2, 2, rgb)).get
    val one = Netpbm.resize(c, 1, 1)
    assert(one.raster.toSeq === Seq[Byte](255.toByte, 0, 0))
  }

  test("features: RGB luminance uses BT.601 weights") {
    // one red, one green, one blue, one white pixel (2x2 P6)
    val rgb = Array[Int](
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val img = Netpbm.decode(Netpbm.encodeP6(2, 2, rgb)).get
    val (mean, grid) = Netpbm.features(img)
    val want = Seq(0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0)
    assert(math.abs(mean - want.sum / 4) < 1e-9)
    // 2x2 image: pixels land in grid cells (0,0)=0 (0,1)=2 (1,0)=8 (1,1)=10
    assert(math.abs(grid(0) - want(0)) < 1e-9)
    assert(math.abs(grid(2) - want(1)) < 1e-9)
    assert(math.abs(grid(8) - want(2)) < 1e-9)
    assert(math.abs(grid(10) - want(3)) < 1e-9)
  }
}

package graft

import graft.operators.{AutoFrameDecoder, Codecs, StubFrameDecoder}
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage for the pure-JVM PNM/WAV decoders (no Spark
  * session needed): hand-computed expectations on byte-level fixtures,
  * malformed inputs falling back through [[AutoFrameDecoder]] to the stub.
  */
class CodecsSpec extends AnyFunSuite {

  // ---- fixture builders ----------------------------------------------------

  /** P5 (grayscale) with a header comment: 4x3, maxval 255, rows with
    * hand-computed means 15.0 / 100.0 / 127.5.
    */
  private def p5Fixture: Array[Byte] = {
    val header = "P5\n# a header comment\n4 3\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](
      0, 10, 20, 30, // mean 15.0
      100, 100, 100, 100, // mean 100.0
      255, 0, 255, 0 // mean 127.5
    ).map(_.toByte)
    header ++ raster
  }

  /** P6 (RGB): 2x2, maxval 255; row means pool the 3 planes:
    * (10+20+30+40+50+60)/6 = 35.0 and (0*3 + 255*3)/6 = 127.5.
    */
  private def p6Fixture: Array[Byte] = {
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](10, 20, 30, 40, 50, 60, 0, 0, 0, 255, 255, 255).map(_.toByte)
    header ++ raster
  }

  private def u16le(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** RIFF/WAVE, 16-bit PCM mono, with an odd-sized LIST chunk between fmt
    * and data (exercises the even-byte padding skip). 300 samples:
    * the first 256 are ±3277 (block-0 envelope exactly 3277/32768), the
    * last 44 are 16384 (block-1 envelope exactly 0.5).
    */
  private def wavFixture(bitsPerSample: Int = 16): Array[Byte] = {
    val samples: Array[Short] =
      (Array.tabulate(256)(i => if (i % 2 == 0) 3277 else -3277) ++ Array.fill(44)(16384)).map(_.toShort)
    val data = samples.flatMap(s => u16le(s & 0xffff))
    val fmt = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++
      u16le(1) ++ u16le(1) ++ u32le(8000) ++ u32le(8000 * bitsPerSample / 8) ++
      u16le(bitsPerSample / 8) ++ u16le(bitsPerSample)
    val list = "LIST".getBytes("US-ASCII") ++ u32le(3) ++ Array[Byte](1, 2, 3, 0) // 3 + 1 pad
    val dataChunk = "data".getBytes("US-ASCII") ++ u32le(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ list ++ dataChunk
    "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
  }

  // ---- PNM -----------------------------------------------------------------

  test("P5 decode: one float per row, mean intensity, comments skipped") {
    val frames = Codecs.tryDecodePnm(p5Fixture).get
    assert(frames.toSeq == Seq(15.0f, 100.0f, 127.5f))
  }

  test("P6 decode pools the three RGB planes per row") {
    val frames = Codecs.tryDecodePnm(p6Fixture).get
    assert(frames.toSeq == Seq(35.0f, 127.5f))
  }

  test("malformed PNM returns None: truncated raster, bad maxval, text") {
    // truncated: header promises 4x3=12 raster bytes, supply 5
    val truncated = "P5\n4 3\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5)
    assert(Codecs.tryDecodePnm(truncated).isEmpty)
    // 16-bit maxval (2 bytes/sample) is out of scope and must not misparse
    val deep = "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill[Byte](8)(7)
    assert(Codecs.tryDecodePnm(deep).isEmpty)
    // a text doc that merely starts with 'P' is not a raster
    assert(Codecs.tryDecodePnm("Peter piped 42 bytes".getBytes("US-ASCII")).isEmpty)
    assert(Codecs.tryDecodePnm(Array[Byte]('P', '5')).isEmpty)
  }

  test("ASCII P2 decode: tokenized samples, comments, 16-bit maxval") {
    // 3x2, maxval 1000: rows [0 500 1000] mean 500.0 and [250 250 250] mean 250.0
    val p2 = "P2\n# ascii gray\n3 2\n1000\n0 500 1000\n250 250 250\n".getBytes("US-ASCII")
    assert(Codecs.tryDecodePnm(p2).get.toSeq == Seq(500.0f, 250.0f))
  }

  test("ASCII P3 decode pools RGB planes per row") {
    // 2x1 RGB: (10,20,30) (40,50,60) -> row mean 35.0
    val p3 = "P3\n2 1\n255\n10 20 30 40 50 60\n".getBytes("US-ASCII")
    assert(Codecs.tryDecodePnm(p3).get.toSeq == Seq(35.0f))
  }

  test("malformed ASCII PNM returns None: short, out-of-range, non-numeric") {
    // promises 6 samples, supplies 4
    assert(Codecs.tryDecodePnm("P2\n3 2\n255\n1 2 3 4".getBytes("US-ASCII")).isEmpty)
    // sample exceeds maxval
    assert(Codecs.tryDecodePnm("P2\n2 1\n100\n50 101\n".getBytes("US-ASCII")).isEmpty)
    // non-numeric token mid-raster
    assert(Codecs.tryDecodePnm("P2\n2 1\n255\n12 zap\n".getBytes("US-ASCII")).isEmpty)
  }

  test("ASCII PNM signature is strict: text payloads cannot half-decode as rasters") {
    // trailing prose after a valid token prefix → reject (full consumption:
    // a text document that merely STARTS like a P2 must not decode)
    assert(Codecs.tryDecodePnm(
      "P2\n2 1\n255\n10 20\nthis is prose, not a raster".getBytes("US-ASCII")).isEmpty)
    // even one extra sample token beyond w*h → reject
    assert(Codecs.tryDecodePnm("P2\n2 1\n255\n10 20 30\n".getBytes("US-ASCII")).isEmpty)
    // magic not followed immediately by whitespace → reject
    assert(Codecs.tryDecodePnm("P23 2 1 255 10 20".getBytes("US-ASCII")).isEmpty)
    // trailing whitespace and comments after the raster stay legal
    assert(Codecs.tryDecodePnm(
      "P2\n2 1\n255\n10 20\n# trailer comment\n  \n".getBytes("US-ASCII"))
      .get.toSeq == Seq(15.0f))
  }

  // ---- WAV -----------------------------------------------------------------

  test("WAV decode: 256-sample |amplitude| envelope, unknown chunks skipped") {
    val frames = Codecs.tryDecodeWav(wavFixture()).get
    assert(frames.length == 2) // ceil(300 / 256)
    assert(frames(0) == 3277.0f / 32768.0f) // hand-computed block-0 envelope
    assert(frames(1) == 0.5f) // 16384 / 32768, 44-sample tail block
  }

  test("stereo WAV pools both channels into the envelope") {
    // 2 channels, 128 interleaved L/R pairs = 256 samples = 1 block;
    // L = +8192, R = -8192 -> mean |amplitude| exactly 0.25
    val data = Array.fill(128)(Seq(8192, -8192)).flatten.flatMap(s => u16le(s & 0xffff))
    val fmt = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++ u16le(1) ++ u16le(2) ++
      u32le(8000) ++ u32le(32000) ++ u16le(4) ++ u16le(16)
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++
      "data".getBytes("US-ASCII") ++ u32le(data.length) ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
    assert(Codecs.tryDecodeWav(wav).get.toSeq == Seq(0.25f))
  }

  test("WAV decode rejects non-16-bit PCM and truncated containers") {
    assert(Codecs.tryDecodeWav(wavFixture(bitsPerSample = 8)).isEmpty)
    assert(Codecs.tryDecodeWav(wavFixture().take(40)).isEmpty) // < minimal header
    // valid RIFF/WAVE but no data chunk
    val noData = {
      val fmt = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++ u16le(1) ++ u16le(1) ++
        u32le(8000) ++ u32le(16000) ++ u16le(2) ++ u16le(16)
      val body = "WAVE".getBytes("US-ASCII") ++ fmt
      "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body ++ Array.fill[Byte](8)(0)
    }
    assert(Codecs.tryDecodeWav(noData).isEmpty)
  }

  test("WAV chunk walk always advances on a zero-size chunk (no infinite loop)") {
    // a hostile sz=0 chunk before data must not hang the parser
    val evil = "RIFF".getBytes("US-ASCII") ++ u32le(100) ++ "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ u32le(0) ++
      "junk".getBytes("US-ASCII") ++ u32le(0) ++ Array.fill[Byte](64)(0)
    assert(Codecs.tryDecodeWav(evil).isEmpty) // terminates, no data/fmt found
  }

  // ---- auto dispatch -------------------------------------------------------

  // ---- compressed images (javax.imageio) -----------------------------------
  // fixture + expected row means shared with MultimodalSpec via TestRasters

  private def encode(fmt: String): Array[Byte] = TestRasters.encode(fmt)
  private val rowMeans = TestRasters.RowMeans

  test("PNG/BMP/GIF decode: per-row pooled means, exact (lossless formats)") {
    for (fmt <- Seq("png", "bmp")) {
      val got = Codecs.tryDecodeImage(encode(fmt))
      assert(got.isDefined, s"$fmt did not decode")
      assert(got.get.toSeq == rowMeans, s"$fmt row means: ${got.get.toSeq}")
    }
    // the JDK's GIF WRITER mangles tiny rasters (rows duplicated/shifted
    // on roundtrip), so the writer output is not ground truth for pixel
    // values — assert the decoder agrees exactly with an independent
    // ImageIO read of the same bytes instead
    val gifBytes = encode("gif")
    val got = Codecs.tryDecodeImage(gifBytes)
    assert(got.isDefined, "gif did not decode")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gifBytes))
    val want = Array.tabulate(img.getHeight) { y =>
      val s = (0 until img.getWidth).map { x =>
        val rgb = img.getRGB(x, y)
        ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }.sum
      s.toFloat / (3 * img.getWidth)
    }
    assert(got.get.toSeq == want.toSeq, s"gif row means: ${got.get.toSeq} vs ${want.toSeq}")
  }

  test("JPEG decode: per-row pooled means within lossy tolerance") {
    val got = Codecs.tryDecodeImage(encode("jpg"))
    assert(got.isDefined, "jpeg did not decode")
    val want = rowMeans
    got.get.toSeq.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 10.0f, s"jpeg row mean $g vs $w out of tolerance")
    }
  }

  test("image sniffing is strict: printable prefixes and corrupt bodies fall through") {
    // "BM"-prefixed text: printable prefix, no plausible pixel offset
    val bmText = ("BM" + "the quick brown corpus document padded out to well over fifty four bytes")
      .getBytes("US-ASCII")
    assert(Codecs.tryDecodeImage(bmText).isEmpty)
    assert(AutoFrameDecoder.decode(bmText).toSeq == StubFrameDecoder.decode(bmText).toSeq)
    // real PNG magic, body cut inside the IHDR chunk: signature matches,
    // ImageIO rejects (a longer cut can still carry the whole raster and
    // legitimately decode — truncation before the header ends cannot)
    val corrupt = encode("png").take(30)
    assert(Codecs.tryDecodeImage(corrupt).isEmpty)
    assert(AutoFrameDecoder.decode(corrupt).toSeq == StubFrameDecoder.decode(corrupt).toSeq)
    // sub-minimum payloads never reach ImageIO
    assert(Codecs.tryDecodeImage("GIF8".getBytes("US-ASCII")).isEmpty)
  }

  test("decompression-bomb guard: absurd declared dimensions fall back before allocation") {
    // BMP headers carry no CRC, so the declared dimensions can be forged:
    // patch width/height (offsets 18/22, LE) to 60000x60000 — 3.6G pixels.
    // The header probe must reject on the declared size without ever
    // asking ImageIO to materialize the raster.
    val bomb = encode("bmp").clone()
    def putLe(off: Int, v: Int): Unit = {
      bomb(off) = (v & 0xff).toByte; bomb(off + 1) = ((v >> 8) & 0xff).toByte
      bomb(off + 2) = ((v >> 16) & 0xff).toByte; bomb(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe(18, 60000); putLe(22, 60000)
    assert(Codecs.tryDecodeImage(bomb).isEmpty, "forged 3.6G-pixel header must be rejected")
    assert(AutoFrameDecoder.decode(bomb).toSeq == StubFrameDecoder.decode(bomb).toSeq)
  }

  test("AutoFrameDecoder dispatches compressed images by magic") {
    assert(AutoFrameDecoder.decode(encode("png")).toSeq == rowMeans)
    assert(AutoFrameDecoder.decode(encode("bmp")).toSeq == rowMeans)
  }

  test("AutoFrameDecoder dispatches by magic and falls back to the stub") {
    assert(AutoFrameDecoder.decode(p5Fixture).toSeq == Seq(15.0f, 100.0f, 127.5f))
    assert(AutoFrameDecoder.decode(wavFixture())(1) == 0.5f)
    // arbitrary binary and malformed members of both formats → stub output
    val opaque = Array.tabulate[Byte](100)(i => ((i * 7 + 13) % 256).toByte)
    assert(AutoFrameDecoder.decode(opaque).toSeq == StubFrameDecoder.decode(opaque).toSeq)
    val badPnm = "P5\n4 3\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)
    assert(AutoFrameDecoder.decode(badPnm).toSeq == StubFrameDecoder.decode(badPnm).toSeq)
    assert(AutoFrameDecoder.decode(Array.emptyByteArray).isEmpty)
  }
}

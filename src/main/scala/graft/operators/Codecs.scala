package graft.operators

/** Pure-JVM multimodal decoders for the [[FrameDecoder]] slot — the round-5
  * answer to "make the decode real without native codec libraries":
  * PNM rasters (binary P5/P6 and ASCII P2/P3, grayscale + RGB) and
  * RIFF/WAVE 16-bit PCM (mono or multi-channel, channels pooled) are
  * all fully decodable from headers + raw sample bytes/tokens, no JNI,
  * no external deps — and since round 9 the COMPRESSED raster formats
  * (PNG/JPEG/GIF/BMP) decode too, via the JDK's own `javax.imageio`
  * (java.desktop module, headless-safe, still zero added dependencies).
  * [[AutoFrameDecoder]] sniffs magic bytes and dispatches;
  * payloads in neither format keep the deterministic stub behavior, so the
  * declared `multimodal_features` output over text payloads is unchanged.
  *
  * Frame semantics per modality:
  *  - PNM image: one float per raster ROW = mean pixel intensity of that
  *    row (P6 pools the 3 RGB planes), on the raw 0..maxval scale. The
  *    downstream sample/resize steps then read as row subsampling /
  *    vertical mean-pooling — the image-pipeline analog the stub only
  *    pretended at.
  *  - WAV audio: one float per 256-sample block = mean |amplitude| / 32768
  *    (all channels pooled) — a loudness envelope; sample/resize read as
  *    decimation / fixed-bin pooling of the envelope.
  *
  * Both parsers are TOTAL: any malformed header/truncated raster returns
  * None from `tryDecode` and the auto decoder falls back to the stub —
  * a corrupt file degrades to byte-statistics instead of failing the job
  * (same quarantine philosophy as the JsonLines source).
  */
object Codecs {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Next whitespace/comment-delimited ASCII token at or after `start`;
    * PNM headers allow `#`-to-end-of-line comments anywhere between
    * tokens. Returns (token, index just past its last byte).
    */
  private def token(p: Array[Byte], start: Int): Option[(String, Int)] = {
    var i = start
    var moved = true
    while (moved && i < p.length) {
      moved = false
      while (i < p.length && isWs(p(i))) { i += 1; moved = true }
      if (i < p.length && p(i) == '#') {
        while (i < p.length && p(i) != '\n') i += 1
        moved = true
      }
    }
    if (i >= p.length) None
    else {
      val sb = new StringBuilder
      while (i < p.length && !isWs(p(i)) && p(i) != '#') { sb.append(p(i).toChar); i += 1 }
      Some((sb.toString, i))
    }
  }

  private def intToken(p: Array[Byte], start: Int): Option[(Int, Int)] =
    token(p, start).flatMap { case (s, i) => s.toIntOption.map((_, i)) }

  /** PNM raster (binary P5/P6 with maxval ≤ 255, or ASCII P2/P3 with
    * maxval ≤ 65535): per-row mean intensity on the raw 0..maxval scale
    * (P3/P6 pool the three RGB planes).
    */
  def tryDecodePnm(p: Array[Byte]): Option[Array[Float]] = {
    if (p.length < 2 || p(0) != 'P') return None
    p(1) match {
      case '5' => decodeBinaryPnm(p, planes = 1)
      case '6' => decodeBinaryPnm(p, planes = 3)
      case '2' => decodeAsciiPnm(p, planes = 1)
      case '3' => decodeAsciiPnm(p, planes = 3)
      case _ => None
    }
  }

  private def decodeBinaryPnm(p: Array[Byte], planes: Int): Option[Array[Float]] =
    for {
      (w, i1) <- intToken(p, 2)
      (h, i2) <- intToken(p, i1)
      (mv, i3) <- intToken(p, i2)
      if w > 0 && h > 0 && mv > 0 && mv <= 255 && i3 < p.length && isWs(p(i3))
      rowBytes = w.toLong * planes
      // raster begins exactly one whitespace byte after maxval
      if i3 + 1 + rowBytes * h <= p.length && rowBytes <= Int.MaxValue
    } yield {
      val start = i3 + 1
      Array.tabulate(h) { r =>
        var j = start + r * rowBytes.toInt
        val end = j + rowBytes.toInt
        var s = 0L
        while (j < end) { s += (p(j) & 0xff); j += 1 }
        s.toFloat / rowBytes
      }
    }

  /** ASCII samples are whitespace/comment-separated int tokens; any
    * missing, malformed, or out-of-range (> maxval) sample fails the
    * whole decode (total parser — the auto decoder then falls back).
    *
    * Because the ASCII variants are ALL printable text, a text document
    * could in principle masquerade as one — a data-dependent behavior
    * change on the declared `multimodal_features` key. Two signature
    * requirements beyond token validity shrink that residual to
    * documents that ARE valid PNM end to end: the magic must be followed
    * immediately by a whitespace byte (every real encoder emits this),
    * and the payload must be FULLY consumed — exactly w·h·planes
    * samples with nothing but whitespace/comments after the raster. A
    * text payload with trailing prose after a token-shaped prefix is
    * rejected, not half-decoded.
    */
  private def decodeAsciiPnm(p: Array[Byte], planes: Int): Option[Array[Float]] =
    for {
      _ <- if (p.length > 2 && isWs(p(2))) Some(()) else None
      (w, i1) <- intToken(p, 2)
      (h, i2) <- intToken(p, i1)
      (mv, i3) <- intToken(p, i2)
      if w > 0 && h > 0 && mv > 0 && mv <= 65535
      // each sample token needs >= 2 bytes (digit + separator) minus the
      // final one — a cheap bound that rejects absurd dimensions before
      // allocating
      n = w.toLong * h * planes
      if n <= p.length && n <= Int.MaxValue
      (samples, end) <- readAsciiSamples(p, i3, n.toInt, mv)
      // full consumption: only whitespace/comments may follow the raster
      if token(p, end).isEmpty
    } yield {
      val rowN = w * planes
      Array.tabulate(h) { r =>
        var s = 0L
        var j = r * rowN
        val end = j + rowN
        while (j < end) { s += samples(j); j += 1 }
        s.toFloat / rowN
      }
    }

  /** Reads exactly `n` in-range samples; returns them plus the index just
    * past the last sample byte (for the caller's full-consumption check).
    */
  private def readAsciiSamples(p: Array[Byte], start: Int, n: Int, mv: Int)
      : Option[(Array[Int], Int)] = {
    val out = new Array[Int](n)
    var i = start
    var k = 0
    while (k < n) {
      intToken(p, i) match {
        case Some((v, ni)) if v >= 0 && v <= mv =>
          out(k) = v; i = ni; k += 1
        case _ => return None
      }
    }
    Some((out, i))
  }

  /** Compressed raster formats (PNG/JPEG/GIF/BMP) via `javax.imageio` —
    * pure JVM, ships in the JDK's java.desktop module, fully functional
    * headless (no display, no JNI, no external codec libraries; the
    * earlier "compressed formats need JNI" assumption was simply wrong).
    * Same frame semantics as the PNM path: one float per raster ROW =
    * mean pixel intensity of that row, channels pooled, 0..255 scale —
    * so sample/resize read identically across compressed and
    * uncompressed images.
    *
    * Magic bytes are checked BEFORE handing the payload to ImageIO: a
    * text/WAV/garbage payload costs two byte compares, not a
    * codec-plugin scan. PNG/JPEG signatures contain non-printable bytes
    * no natural document carries; BMP's printable "BM" additionally
    * requires the header's pixel-offset field to point inside the
    * payload; GIF's "GIF8" IS printable, so a document that happens to
    * start with "GIF87a"/"GIF89a" DOES reach ImageIO — the stub-
    * identical outcome there rests on the TOTAL PARSER (a prose body is
    * never a valid LZW stream → None → stub), not on the sniff.
    *
    * Decode is bomb-guarded: the header's declared dimensions are read
    * via the format reader FIRST (header-only, no raster allocation),
    * and anything over [[MaxImagePixels]] falls back to the stub — a
    * ~1 KB payload declaring a 60000×60000 raster would otherwise make
    * `ImageIO.read` allocate multi-GB and throw OutOfMemoryError, which
    * is not catchable-in-good-faith and would kill the executor,
    * violating the corrupt-file-degrades contract. The explicit
    * MemoryCacheImageInputStream also keeps ImageIO off its default
    * per-read disk-cache temp file (pure waste — the bytes are already
    * in memory) without flipping the global `ImageIO.setUseCache` state.
    */
  def tryDecodeImage(p: Array[Byte]): Option[Array[Float]] = {
    if (!looksLikeImage(p)) return None
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) None
          else {
            val img = reader.read(0)
            Some(Array.tabulate(h) { y =>
              var s = 0L
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              s.toFloat / (3 * w)
            })
          }
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode ceiling, default 64 M pixels (an 8192×8192 RGBA raster
    * ≈ 256 MB) — far above any sane training-corpus image. Headers
    * declaring more fall back to the stub. NOTE the per-executor
    * multiplier: each decode TASK may hold one raster at the cap, so an
    * executor running c concurrent decode tasks can pin c × 256 MB of
    * heap — deployments with many cores per executor and modest heaps
    * should lower the cap via the `graft.codecs.maxImagePixels` system
    * property (an executor-JVM knob, set through
    * `spark.executor.extraJavaOptions`, because decode runs inside
    * codegen'd expressions with no session conf in scope).
    */
  val MaxImagePixels: Long =
    java.lang.Long.getLong("graft.codecs.maxImagePixels", 64L * 1024 * 1024)

  private def looksLikeImage(p: Array[Byte]): Boolean = {
    def u8(i: Int) = p(i) & 0xff
    // a minimal GIF (header+palette+1 image block) can be ~35 bytes;
    // nothing real in any of the four formats is smaller than this
    if (p.length < 26) return false
    val png = u8(0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
    val jpeg = u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff
    val gif = p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'
    // "BM" is printable, so require the full 54-byte BITMAPFILEHEADER +
    // BITMAPINFOHEADER and a pixel-data offset (bytes 10-13,
    // little-endian) landing inside the payload
    val bmp = p.length >= 54 && p(0) == 'B' && p(1) == 'M' && {
      val off = u8(10) | (u8(11) << 8) | (u8(12) << 16) | (u8(13) << 24)
      off >= 54 && off < p.length
    }
    png || jpeg || gif || bmp
  }

  /** Samples per WAV envelope frame. */
  val WavFrameSamples = 256

  /** RIFF/WAVE, PCM (format 1), 16-bit: mean |amplitude|/32768 per
    * 256-sample block. Unknown chunks (LIST, fact, …) are skipped with
    * even-byte padding per the RIFF spec; a data chunk truncated by the
    * container is clamped to the bytes present.
    */
  def tryDecodeWav(p: Array[Byte]): Option[Array[Float]] = {
    def ascii(i: Int) = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int) = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    if (p.length < 44 || ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    var i = 12
    var pcm16 = false
    var data: Option[(Int, Int)] = None
    while (i + 8 <= p.length && (data.isEmpty || !pcm16)) {
      val id = ascii(i)
      val sz = u32(i + 4)
      if (id == "fmt " && sz >= 16 && i + 8 + 16 <= p.length)
        pcm16 = u16(i + 8) == 1 && u16(i + 8 + 14) == 16
      else if (id == "data")
        data = Some((i + 8, math.min(sz, (p.length - i - 8).toLong).toInt))
      i += (8 + sz + (sz & 1)).toInt max 9 // always advance, even on sz=0
    }
    for ((off, len) <- data if pcm16 && len >= 2) yield {
      val nSamp = len / 2
      val frames = (nSamp + WavFrameSamples - 1) / WavFrameSamples
      Array.tabulate(frames) { f =>
        val lo = f * WavFrameSamples
        val hi = math.min(nSamp, lo + WavFrameSamples)
        var s = 0L
        var j = lo
        while (j < hi) {
          val v = (((p(off + 2 * j + 1) & 0xff) << 8) | (p(off + 2 * j) & 0xff)).toShort
          s += math.abs(v.toLong)
          j += 1
        }
        (s.toDouble / ((hi - lo) * 32768.0)).toFloat
      }
    }
  }
}

/** Magic-byte-sniffing decoder: real PNM/WAV decode when the payload is
  * one, deterministic stub byte-statistics otherwise (including malformed
  * or truncated members of either format). This is the default decoder for
  * the multimodal feature pass.
  */
object AutoFrameDecoder extends FrameDecoder {
  override def decode(payload: Array[Byte]): Array[Float] =
    Codecs.tryDecodePnm(payload)
      .orElse(Codecs.tryDecodeImage(payload))
      .orElse(Codecs.tryDecodeWav(payload))
      .getOrElse(StubFrameDecoder.decode(payload))
}

package graft.ops

/** From-scratch media codecs for the multimodal pipeline — formats simple
  * enough to decode with zero external libraries, so the decode stage is
  * REAL, not stubbed: PPM (P6) and 24-bit uncompressed BMP for images,
  * RIFF/WAVE PCM-16 for audio, and RIFF/AVI with uncompressed RGB24
  * ('DIB ') frames for video. COMPRESSED video codecs (H.264 & co.)
  * genuinely need an external library and remain out of scope — a
  * compressed payload simply fails decode onto the error channel.
  *
  * All functions are pure byte-array transforms — safe inside mapPartitions
  * at any parallelism.
  */
object MediaCodecs {

  final case class Image(width: Int, height: Int, rgb: Array[Byte])
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- PPM (P6): "P6\n<w> <h>\n<max>\n" + raw RGB ----

  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  def decodePpm(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 10 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipSpaceAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipSpaceAndComments()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (any) Some(v) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      if maxv == 255 && w > 0 && h > 0 && w.toLong * h <= (1L << 26)
      _ = { pos += 1 } // single whitespace after maxval
      if bytes.length.toLong - pos >= w.toLong * h * 3
    } yield Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
  }

  // ---- BMP: 24-bit uncompressed, BITMAPINFOHEADER, bottom-up rows ----

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decodeBmp24(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height <= 0 ||
      dataOffset < 54 || width.toLong * height > (1L << 26)) return None
    val rowSize = ((width * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    if (bytes.length < dataOffset + rowSize.toLong * height) return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3
        val d = (y * width + x) * 3
        rgb(d) = bytes(s + 2) // BGR → RGB
        rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Some(Image(width, height, rgb))
  }

  def encodeBmp24(img: Image): Array[Byte] = {
    val rowSize = ((img.width * 3 + 3) / 4) * 4
    val dataSize = rowSize * img.height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, img.width); putLe32(22, img.height)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowSize
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dstRow + x * 3
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- WAV: RIFF/WAVE, PCM 16-bit ----

  def decodeWavPcm16(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44 ||
      new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
      new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4)
      // long arithmetic: a hostile size near Int.MaxValue must fail the
      // guard, not wrap negative and pass it
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (le16(bytes, pos + 8) != 1) return None // PCM only
          channels = le16(bytes, pos + 10)
          sampleRate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
        case "data" =>
          if (bits != 16) return None
          val n = size / 2
          data = new Array[Short](n)
          var i = 0
          while (i < n) {
            data(i) = ((bytes(pos + 8 + 2 * i) & 0xff) |
              (bytes(pos + 9 + 2 * i) << 8)).toShort
            i += 1
          }
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks pad to even
    }
    if (sampleRate > 0 && channels > 0 && data != null)
      Some(Audio(sampleRate, channels, data))
    else None
  }

  def encodeWavPcm16(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putAscii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    out(20) = 1 // PCM
    out(22) = a.channels.toByte
    putLe32(24, a.sampleRate)
    putLe32(28, a.sampleRate * a.channels * 2)
    out(32) = (a.channels * 2).toByte
    out(34) = 16
    putAscii(36, "data"); putLe32(40, dataSize)
    var i = 0
    while (i < a.samples.length) {
      out(44 + 2 * i) = a.samples(i).toByte
      out(45 + 2 * i) = (a.samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  // ---- feature kernels ----

  /** grid x grid average-pooled luma in [0,1] — the image feature vector. */
  def grayGrid(img: Image, grid: Int = 8): Array[Float] = {
    val out = new Array[Float](grid * grid)
    val counts = new Array[Int](grid * grid)
    var y = 0
    while (y < img.height) {
      val gy = math.min(y * grid / img.height, grid - 1)
      var x = 0
      while (x < img.width) {
        val gx = math.min(x * grid / img.width, grid - 1)
        val p = (y * img.width + x) * 3
        val luma = 0.299f * (img.rgb(p) & 0xff) +
          0.587f * (img.rgb(p + 1) & 0xff) + 0.114f * (img.rgb(p + 2) & 0xff)
        out(gy * grid + gx) += luma / 255f
        counts(gy * grid + gx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < out.length) {
      if (counts(i) > 0) out(i) /= counts(i)
      i += 1
    }
    out
  }

  /** RMS energy over n equal windows in [0,1] — the audio feature vector. */
  def rmsWindows(a: Audio, n: Int = 16): Array[Float] = {
    val out = new Array[Float](n)
    if (a.samples.isEmpty) return out
    val win = math.max(1, a.samples.length / n)
    var w = 0
    while (w < n) {
      val from = w * win
      val to = math.min(a.samples.length, from + win)
      var acc = 0.0
      var i = from
      while (i < to) {
        val s = a.samples(i) / 32768.0
        acc += s * s
        i += 1
      }
      out(w) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
      w += 1
    }
    out
  }

  /** Nearest-neighbor resize — the real pixel transform behind resize(). */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = math.min(img.height - 1, y * img.height / h2)
      var x = 0
      while (x < w2) {
        val sx = math.min(img.width - 1, x * img.width / w2)
        val s = (sy * img.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  // ---- AVI (RIFF) with uncompressed bottom-up BGR24 frames ----
  // Layout (public RIFF/AVI spec): RIFF('AVI ') { LIST('hdrl'){ avih,
  // LIST('strl'){ strh('vids'/'DIB '), strf(BITMAPINFOHEADER bi=24/0) } },
  // LIST('movi'){ '00db' raw frame ... } }. Frames are BMP-style: rows
  // bottom-up, BGR, padded to 4 bytes.

  final case class VideoInfo(width: Int, height: Int, nFrames: Int)

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) "" else new String(b, off, 4, "US-ASCII")

  /** Walk the container once: header info + in-range frame-chunk offsets.
    * None when not a parseable uncompressed-RGB24 AVI (the error channel —
    * compressed codecs land here by design).
    */
  private def parseAvi(b: Array[Byte]): Option[(VideoInfo, Seq[Int])] = {
    if (b.length < 24 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    var w = 0; var h = 0
    var bitCount = -1; var compression = -1
    val frames = Seq.newBuilder[Int]
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4)
        if (size < 0 || off + 8 + size > to) return // truncated — keep what parsed
        if (id == "LIST") {
          val listType = fourcc(b, off + 8)
          walk(off + 12, off + 8 + size, inMovi || listType == "movi")
        } else if (id == "avih" && size >= 40) {
          w = le32(b, off + 8 + 32)
          h = le32(b, off + 8 + 36)
        } else if (id == "strf" && size >= 40 && bitCount < 0) {
          bitCount = le16(b, off + 8 + 14)
          compression = le32(b, off + 8 + 16)
        } else if (inMovi && id.length == 4 &&
          (id.endsWith("db") || id.endsWith("dc"))) {
          frames += off
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, math.min(b.length, 8 + le32(b, 4)), inMovi = false)
    val fs = frames.result()
    if (w <= 0 || h <= 0 || bitCount != 24 || compression != 0 || fs.isEmpty)
      None
    else Some((VideoInfo(w, h, fs.length), fs))
  }

  def decodeAviInfo(bytes: Array[Byte]): Option[VideoInfo] =
    parseAvi(bytes).map(_._1)

  /** Parse once, decode many: header info + frame offsets for use with
    * [[decodeAviFrameAt]] — a caller sampling k frames walks the container
    * once instead of k+1 times (each [[decodeAviFrame]] call re-walks it).
    */
  def openAvi(bytes: Array[Byte]): Option[(VideoInfo, Seq[Int])] =
    parseAvi(bytes)

  /** Decode the frame at container offset `off` (from [[openAvi]]'s offset
    * list) to a top-down RGB image.
    */
  def decodeAviFrameAt(bytes: Array[Byte], info: VideoInfo,
      off: Int): Option[Image] = {
    val size = le32(bytes, off + 4)
    val rowSize = ((3 * info.width + 3) / 4) * 4
    if (size < rowSize * info.height) None
    else {
      val rgb = new Array[Byte](info.width * info.height * 3)
      var y = 0
      while (y < info.height) {
        val src = off + 8 + (info.height - 1 - y) * rowSize
        var x = 0
        while (x < info.width) {
          val d = (y * info.width + x) * 3
          rgb(d) = bytes(src + x * 3 + 2)     // R
          rgb(d + 1) = bytes(src + x * 3 + 1) // G
          rgb(d + 2) = bytes(src + x * 3)     // B
          x += 1
        }
        y += 1
      }
      Some(Image(info.width, info.height, rgb))
    }
  }

  /** Decode frame `idx` to a top-down RGB image (single-frame convenience;
    * re-parses the container — use [[openAvi]] + [[decodeAviFrameAt]] when
    * decoding more than one frame of a payload).
    */
  def decodeAviFrame(bytes: Array[Byte], idx: Int): Option[Image] =
    parseAvi(bytes).flatMap { case (info, offs) =>
      if (idx < 0 || idx >= offs.length) None
      else decodeAviFrameAt(bytes, info, offs(idx))
    }

  /** Encode top-down RGB frames (each width*height*3) as an uncompressed
    * RGB24 AVI at `fps`.
    */
  def encodeAviRgb(width: Int, height: Int, frames: Seq[Array[Byte]],
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height * 3),
      "frames must be width*height*3 RGB")
    val rowSize = ((3 * width + 3) / 4) * 4
    val frameSize = rowSize * height
    val n = frames.length
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + n * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def putAscii(s: String): Unit = { var i = 0; while (i < s.length) { out(p) = s.charAt(i).toByte; p += 1; i += 1 } }
    def put32(v: Int): Unit = { out(p) = v.toByte; out(p + 1) = (v >> 8).toByte; out(p + 2) = (v >> 16).toByte; out(p + 3) = (v >> 24).toByte; p += 4 }
    def put16(v: Int): Unit = { out(p) = v.toByte; out(p + 1) = (v >> 8).toByte; p += 2 }
    putAscii("RIFF"); put32(riffSize); putAscii("AVI ")
    putAscii("LIST"); put32(hdrlSize); putAscii("hdrl")
    putAscii("avih"); put32(56)
    put32(if (fps > 0) 1000000 / fps else 0); put32(0); put32(0); put32(0)
    put32(n); put32(0); put32(1); put32(frameSize)
    put32(width); put32(height); put32(0); put32(0); put32(0); put32(0)
    putAscii("LIST"); put32(4 + (8 + 56) + (8 + 40)); putAscii("strl")
    putAscii("strh"); put32(56)
    putAscii("vids"); putAscii("DIB "); put32(0); put16(0); put16(0)
    put32(0); put32(1); put32(math.max(1, fps)); put32(0); put32(n)
    put32(frameSize); put32(0); put32(0)
    put16(0); put16(0); put16(width); put16(height) // rcFrame
    putAscii("strf"); put32(40)
    put32(40); put32(width); put32(height); put16(1); put16(24)
    put32(0); put32(frameSize); put32(0); put32(0); put32(0); put32(0)
    putAscii("LIST"); put32(moviSize); putAscii("movi")
    for (f <- frames) {
      putAscii("00db"); put32(frameSize)
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width * 3
        var x = 0
        while (x < width) {
          out(p + x * 3) = f(srcRow + x * 3 + 2)     // B
          out(p + x * 3 + 1) = f(srcRow + x * 3 + 1) // G
          out(p + x * 3 + 2) = f(srcRow + x * 3)     // R
          x += 1
        }
        var pad = 3 * width
        while (pad < rowSize) { out(p + pad) = 0; pad += 1 }
        p += rowSize
        y += 1
      }
    }
    require(p == out.length, s"AVI layout mismatch: wrote $p of ${out.length}")
    out
  }
}

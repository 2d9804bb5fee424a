package graft.ops

/** From-scratch media codecs for the multimodal pipeline — formats simple
  * enough to decode with zero external libraries, so the decode stage is
  * REAL, not stubbed: PPM (P6) and 24-bit uncompressed BMP for images,
  * RIFF/WAVE PCM-16 for audio. Video containers genuinely need a codec
  * library and stay out of scope (Multimodal documents the seam).
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
}

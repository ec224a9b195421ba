package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM media container codecs (no external libraries):
  *
  *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, BI_RGB
  *    (uncompressed), bottom-up rows with 4-byte row padding — the
  *    classic Windows DIB layout per the public format spec.
  *  - WAV: RIFF/WAVE with a 16-byte `fmt ` chunk (PCM, format tag 1)
  *    and a `data` chunk of interleaved little-endian 16-bit samples;
  *    unknown chunks are skipped (incl. the RIFF odd-size pad byte).
  *
  * These replace [[Multimodal.DecodeStub]] for the image and audio
  * paths: the xm3/xm4 queries encode real containers and recover the
  * metadata by PARSING THE BYTES, oracle-checked against the planted
  * values. Golden fixed-byte tests in MultimodalSpec anchor both
  * layouts to the published specs (so encoder and decoder cannot be
  * symmetrically wrong).
  */
object MediaCodecs {

  // ---------------------------------------------------------------- BMP

  /** Decoded BMP: pixels are top-down rows of BGR triples (w*h*3). */
  final case class BmpImage(width: Int, height: Int, bpp: Int,
      pixels: Array[Byte])

  private def rowStride(width: Int): Int = ((width * 3) + 3) & ~3

  /** Encode a 24 bpp BI_RGB BMP. `pixels` = top-down BGR, w*h*3. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dims must be positive")
    require(pixels.length == width * height * 3,
      s"pixels must be w*h*3 = ${width * height * 3}, got ${pixels.length}")
    val stride = rowStride(width)
    val imageSize = stride * height
    val fileSize = 54 + imageSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER (14 bytes)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize).putShort(0).putShort(0).putInt(54)
    // BITMAPINFOHEADER (40 bytes)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)          // planes, bpp
    buf.putInt(0).putInt(imageSize)       // BI_RGB, image size
    buf.putInt(2835).putInt(2835)         // 72 DPI in px/m
    buf.putInt(0).putInt(0)               // palette sizes
    // pixel array: rows stored bottom-up, each padded to 4 bytes
    var row = height - 1
    while (row >= 0) {
      buf.put(pixels, row * width * 3, width * 3)
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row -= 1
    }
    buf.array()
  }

  /** Parse a 24 bpp BI_RGB BMP back to top-down BGR pixels. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54, "truncated BMP header")
    require(buf.get(0) == 'B' && buf.get(1) == 'M', "not a BMP (magic)")
    val pixelOffset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported bpp $bpp (24 only)")
    require(compression == 0, s"unsupported compression $compression")
    require(width > 0, s"bad width $width")
    require(pixelOffset >= 54 && pixelOffset <= bytes.length,
      s"bad pixel-array offset $pixelOffset")
    val topDown = rawHeight < 0 // negative height = rows stored top-down
    val height = math.abs(rawHeight)
    // all size math in Long: width/height are attacker-controlled and
    // Int products wrap negative past ~715M px, defeating the checks
    val strideL = ((width.toLong * 3) + 3) & ~3L
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"unreasonable BMP dimensions ${width}x$height")
    require(bytes.length >= pixelOffset + strideL * height,
      "truncated BMP pixel array")
    val stride = strideL.toInt
    val out = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcRow = if (topDown) row else height - 1 - row
      System.arraycopy(bytes, pixelOffset + srcRow * stride,
        out, row * width * 3, width * 3)
      row += 1
    }
    BmpImage(width, height, bpp, out)
  }

  // ---------------------------------------------------------------- WAV

  /** Decoded PCM WAV: interleaved samples per the `data` chunk. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Short])

  /** Encode 16-bit PCM WAV, interleaved samples. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    require(samples.length % channels == 0,
      "sample count must be a multiple of channels")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                       // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a PCM WAV; walks the RIFF chunk list (odd sizes padded). */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated RIFF header")
    def fourcc(at: Int): String =
      new String(bytes, at, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val size = buf.getInt(pos + 4)
      // Long arithmetic: a size near Int.MaxValue wraps pos+8+size
      // negative and would pass an Int comparison
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"chunk '$id' overruns file")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val fmtTag = buf.getShort(pos + 8).toInt
          require(fmtTag == 1, s"unsupported WAV format tag $fmtTag")
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22).toInt
          require(bits == 16, s"unsupported bits/sample $bits (16 only)")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // RIFF pads odd-sized chunks
    }
    require(sampleRate > 0 && channels > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    WavAudio(sampleRate, channels, bits, samples)
  }
}

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

  // ---------------------------------------------------------------- AVI

  /** Decoded uncompressed AVI: per-frame top-down BGR pixel arrays
    * (w·h·3 each), like [[BmpImage]] but a sequence.
    */
  final case class AviVideo(width: Int, height: Int, fps: Int,
      frames: Vector[Array[Byte]])

  /** Encode a REAL RIFF/AVI container with uncompressed 24 bpp DIB
    * frames ('00db' chunks, 'DIB ' handler): RIFF('AVI ') → LIST hdrl
    * (avih + LIST strl(strh 'vids' + strf BITMAPINFOHEADER)) → LIST
    * movi → idx1. Frames are stored the DIB way — bottom-up rows,
    * 4-byte stride padding — so a decoder that forgets either yields
    * wrong pixels, which the xm9 hash gate catches. `frames`:
    * top-down BGR, w·h·3 each.
    */
  def encodeAvi(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "bad AVI params")
    require(frames.nonEmpty, "AVI needs at least one frame")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame must be w*h*3 = ${width * height * 3}, got ${f.length}"))
    val stride = rowStride(width)
    val frameBytes = stride * height // stride is 4-aligned → even
    val nf = frames.length
    // size arithmetic in Long: enough frames overflow Int into a
    // negative ByteBuffer.allocate (or corrupt RIFF sizes just under
    // the limit) — fail with the real reason instead
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSizeL = 4L + nf.toLong * (8L + frameBytes)
    val idx1SizeL = nf.toLong * 16
    val riffSizeL = 4L + (8 + hdrlSize) + (8 + moviSizeL) + (8 + idx1SizeL)
    require(8 + riffSizeL <= Int.MaxValue,
      s"AVI too large for a single RIFF buffer: ${8 + riffSizeL} bytes " +
        s"($nf frames x $frameBytes); split the frame sequence")
    val moviSize = moviSizeL.toInt
    val idx1Size = idx1SizeL.toInt
    val riffSize = riffSizeL.toInt
    val buf = ByteBuffer.allocate(8 + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = { var i = 0
      while (i < 4) { buf.put(s.charAt(i).toByte); i += 1 } }
    fcc("RIFF"); buf.putInt(riffSize); fcc("AVI ")
    fcc("LIST"); buf.putInt(hdrlSize); fcc("hdrl")
    fcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps)         // microseconds per frame
    buf.putInt(0).putInt(0)           // maxBytesPerSec, padding
    buf.putInt(0x10)                  // AVIF_HASINDEX
    buf.putInt(nf).putInt(0).putInt(1) // totalFrames, initial, streams
    buf.putInt(frameBytes)            // suggested buffer size
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fcc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fcc("strl")
    fcc("strh"); buf.putInt(56)
    fcc("vids"); fcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0) // flags, priority, language
    buf.putInt(0)                     // initial frames
    buf.putInt(1).putInt(fps)         // scale, rate → fps = rate/scale
    buf.putInt(0).putInt(nf)          // start, length
    buf.putInt(frameBytes).putInt(0).putInt(0) // bufSize, quality, sampleSize
    buf.putShort(0).putShort(0)       // rcFrame left, top
    buf.putShort(width.toShort).putShort(height.toShort)
    fcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)      // planes, bpp
    buf.putInt(0).putInt(frameBytes)  // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    fcc("LIST"); buf.putInt(moviSize); fcc("movi")
    frames.foreach { px =>
      fcc("00db"); buf.putInt(frameBytes)
      var row = height - 1
      while (row >= 0) { // bottom-up + stride padding, like BMP
        buf.put(px, row * width * 3, width * 3)
        var pad = stride - width * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        row -= 1
      }
    }
    fcc("idx1"); buf.putInt(idx1Size)
    var f = 0
    var off = 4 // idx1 offsets are relative to the 'movi' fourcc
    while (f < nf) {
      fcc("00db"); buf.putInt(0x10) // AVIIF_KEYFRAME
      buf.putInt(off).putInt(frameBytes)
      off += 8 + frameBytes
      f += 1
    }
    buf.array()
  }

  /** Parse an uncompressed 24 bpp AVI back to top-down per-frame
    * pixels by WALKING the RIFF chunk tree (no fixed offsets): header
    * geometry from strf, fps from strh scale/rate, frames from the
    * movi LIST's 00db/00dc chunks. Tolerates unknown chunks and odd
    * chunk ordering; rejects compressed streams.
    */
  def decodeAvi(bytes: Array[Byte]): AviVideo = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String =
      new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && fourcc(0) == "RIFF" &&
      fourcc(8) == "AVI ", "not an AVI (RIFF magic)")
    var width = 0; var height = 0; var fps = 0
    // multi-stream AVIs: frame chunks are tagged with their stream
    // index ("00db" = stream 0) — accept only the FIRST 'vids'
    // stream's chunks and headers, so an audio strl (whose strf is a
    // WAVEFORMATEX, not a BITMAPINFOHEADER) or a second video stream
    // can't interleave frames or overwrite geometry/fps
    var strhSeen = 0      // strh chunks walked so far (= stream index)
    var vidStream = -1    // index of the first 'vids' stream
    var curStrh = ""      // handler type of the current strl's strh
    var preVidsFrames = 0 // frame chunks seen BEFORE any vids strh
    val frames = Vector.newBuilder[Array[Byte]]

    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = fourcc(pos)
        val size = buf.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size.toLong <= until,
          s"chunk '$id' overruns its parent")
        if (id == "LIST") {
          require(size >= 4, "LIST chunk too small")
          fourcc(pos + 8) match {
            case "hdrl" | "strl" | "movi" => walk(pos + 12, pos + 8 + size)
            case _ => // skip INFO etc.
          }
        } else id match {
          case "strh" =>
            require(size >= 56, "strh too small")
            curStrh = fourcc(pos + 8)
            if (curStrh == "vids" && vidStream < 0) {
              vidStream = strhSeen
              val scale = buf.getInt(pos + 28)
              val rate = buf.getInt(pos + 32)
              require(scale > 0, "bad strh scale")
              fps = rate / scale
            }
            strhSeen += 1
          case "strf" if curStrh == "vids" && vidStream == strhSeen - 1 &&
              width == 0 =>
            require(size >= 40, "strf too small")
            width = buf.getInt(pos + 12)
            height = buf.getInt(pos + 16)
            val bpp = buf.getShort(pos + 22).toInt
            val comp = buf.getInt(pos + 24)
            require(bpp == 24, s"unsupported bpp $bpp (24 only)")
            require(comp == 0, s"unsupported compression $comp")
            require(width > 0 && height > 0 &&
              width.toLong * height * 3 <= Int.MaxValue,
              s"unreasonable AVI dimensions ${width}x$height")
          case c if (c.endsWith("db") || c.endsWith("dc")) &&
              vidStream >= 0 && c.take(2) == f"$vidStream%02d" =>
            require(width > 0, "frame chunk before strf header")
            val strideL = ((width.toLong * 3) + 3) & ~3L
            require(size >= strideL * height, "truncated frame chunk")
            val stride = strideL.toInt
            val out = new Array[Byte](width * height * 3)
            var row = 0
            while (row < height) {
              System.arraycopy(bytes, pos + 8 + (height - 1 - row) * stride,
                out, row * width * 3, width * 3)
              row += 1
            }
            frames += out
          case c if (c.endsWith("db") || c.endsWith("dc")) &&
              c.take(2).forall(_.isDigit) && vidStream < 0 =>
            // malformed ordering (movi before hdrl's vids strl):
            // record it so the file fails loudly below instead of
            // silently decoding to zero frames
            preVidsFrames += 1
          case _ => // skip avih/idx1/unknown
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, math.min(bytes.length, 8 + buf.getInt(4)))
    require(preVidsFrames == 0,
      s"$preVidsFrames frame chunk(s) before the vids stream header " +
        "(malformed RIFF ordering: movi precedes hdrl)")
    val fs = frames.result()
    require(width > 0 && fs.nonEmpty, "missing strf header or frames")
    AviVideo(width, height, fps, fs)
  }

  // ---------------------------------------------------------------- PNG

  /** Decoded PNG: pixels converted to top-down BGR triples (w*h*3),
    * the SAME layout [[decodeBmp]] yields — so one ahash64 core hashes
    * both containers identically (the xm5/xm9 cross-container
    * contract extends to xm11).
    */
  final case class PngImage(width: Int, height: Int,
      bitDepth: Int, colorType: Int, pixels: Array[Byte])

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG Paeth predictor (spec §9, Filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit RGB (color type 2) PNG from top-down BGR pixels.
    * `filterOf(row)` picks the scanline filter type (0-4) — the
    * encoder table rotates through all five so the decoder's
    * unfilters are exercised by real data, not just the trivial None
    * path. Single zlib IDAT; CRCs per the spec.
    */
  def encodePng(width: Int, height: Int, pixels: Array[Byte],
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dims must be positive")
    require(pixels.length == width * height * 3,
      s"pixels must be w*h*3 = ${width * height * 3}, got ${pixels.length}")
    val stride = width * 3
    val raw = new Array[Byte](height * (stride + 1))
    var row = 0
    while (row < height) {
      val f = filterOf(row)
      require(f >= 0 && f <= 4, s"bad filter type $f")
      val o = row * (stride + 1)
      raw(o) = f.toByte
      var x = 0
      while (x < stride) {
        // BGR -> RGB: channel 0<->2 within each triple
        val ch = x % 3
        val src = row * stride + (x - ch) + (2 - ch)
        val cur = pixels(src) & 0xFF
        val left = if (x >= 3) {
          val ls = row * stride + (x - 3) - ((x - 3) % 3) + (2 - (x - 3) % 3)
          pixels(ls) & 0xFF
        } else 0
        val up = if (row > 0) {
          val us = (row - 1) * stride + (x - ch) + (2 - ch)
          pixels(us) & 0xFF
        } else 0
        val ul = if (row > 0 && x >= 3) {
          val s2 = (row - 1) * stride + (x - 3) - ((x - 3) % 3) +
            (2 - (x - 3) % 3)
          pixels(s2) & 0xFF
        } else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(o + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      row += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = comp.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(data.length).array()
      out.write(len, 0, 4)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse an 8-bit truecolor PNG back to top-down BGR pixels by
    * WALKING the chunk stream: signature, IHDR geometry, IDAT concat
    * → zlib inflate → the five scanline unfilters. Every chunk CRC is
    * verified; unknown ancillary chunks are skipped; size math is
    * Long-safe (the AVI discipline).
    */
  def decodePng(bytes: Array[Byte]): PngImage = {
    require(bytes.length >= 8 + 25 + 12, "truncated PNG")
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), PngSig), "not a PNG (signature)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    var width = 0; var height = 0; var depth = 0; var color = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= bytes.length && !seenIend) {
      val len = buf.getInt(pos)
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"chunk at $pos overruns the file")
      val typ = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == buf.getInt(pos + 8 + len),
        s"bad CRC on chunk '$typ'")
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, "bad IHDR")
          width = buf.getInt(pos + 8)
          height = buf.getInt(pos + 12)
          depth = bytes(pos + 16) & 0xFF
          color = bytes(pos + 17) & 0xFF
          require(bytes(pos + 18) == 0 && bytes(pos + 19) == 0,
            "unsupported compression/filter method")
          require(bytes(pos + 20) == 0, "interlaced PNG unsupported")
          require(depth == 8 && color == 2,
            s"unsupported depth/color $depth/$color (8-bit RGB only)")
          require(width > 0 && height > 0 &&
            width.toLong * height * 3 <= Int.MaxValue,
            s"unreasonable PNG dimensions ${width}x$height")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => // ancillary (tEXt, pHYs, ...) — skip
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, "missing IHDR or IEND")
    val stride = width * 3
    val raw = new Array[Byte](height * (stride + 1))
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, got, raw.length - got)
      // n==0 without progress must be an ERROR, not a retry: a crafted
      // zlib header with FDICT set makes inflate() return 0 with
      // needsDictionary=true (and needsInput=false) forever — an
      // executor hang, not a decode failure, unless we bail here
      require(!infl.needsDictionary,
        "preset-dictionary zlib (FDICT) unsupported in IDAT")
      require(n > 0 || !infl.needsInput, "truncated IDAT stream")
      require(n > 0 || infl.finished(), "stalled IDAT inflate")
      got += n
    }
    infl.end()
    require(got == raw.length,
      s"IDAT inflated to $got bytes, need ${raw.length}")
    // unfilter into RGB rows, then store as BGR
    val rgb = new Array[Byte](height * stride)
    var row = 0
    while (row < height) {
      val f = raw(row * (stride + 1)) & 0xFF
      require(f <= 4, s"bad filter type $f on row $row")
      var x = 0
      while (x < stride) {
        val cur = raw(row * (stride + 1) + 1 + x) & 0xFF
        val left = if (x >= 3) rgb(row * stride + x - 3) & 0xFF else 0
        val up = if (row > 0) rgb((row - 1) * stride + x) & 0xFF else 0
        val ul = if (row > 0 && x >= 3)
          rgb((row - 1) * stride + x - 3) & 0xFF else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
        }
        rgb(row * stride + x) = (v & 0xFF).toByte
        x += 1
      }
      row += 1
    }
    val out = new Array[Byte](height * stride)
    var i = 0
    while (i < out.length) {
      val ch = i % 3
      out(i) = rgb((i - ch) + (2 - ch)) // RGB -> BGR
      i += 1
    }
    PngImage(width, height, depth, color, out)
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF89a codec (no external libraries) — the third major
  * crawl image format after BMP/PNG (xm3/xm11) and JPEG (xm12).
  *
  * Encoder: GIF89a signature, logical screen descriptor, 256-entry
  * global color table, a comment extension, one non-interlaced image
  * block compressed with real GIF-LZW (variable code width 9→12 bits
  * LSB-first, clear-code dictionary reset when the table fills),
  * trailer. Decoder: full block walk (extensions skipped except the
  * comment, local color table honored when present), LZW decompress
  * including the KwKwK `code == next` case and deferred-entry clear
  * boundaries, palette mapping to a top-down BGR pixel stream (the
  * [[MediaCodecs.BmpImage]] convention shared by every decoder that
  * feeds [[Multimodal.ahash64]]). Interlaced images are supported
  * (the spec's four-pass row schedule — the JDK's own GIF writer
  * interlaces by default, so real-world files require it).
  *
  * Unlike JPEG, GIF is LOSSLESS over its palette: any planted index
  * stream round-trips bit-exactly, so the xm14 oracle can hash-gate
  * arbitrary data-dependent content (the PNG discipline) — no
  * block-solid exactness contract needed. Long-arithmetic bounds
  * checks on every size read (the AVI discipline): a crafted header
  * cannot drive a negative or overflowing allocation.
  *
  * Format per the public GIF89a specification (CompuServe, 1990) and
  * the LZW variant it defines; see also /root/reference doc/types.md
  * (the reference has no image codecs — this is a declared engine
  * extension like xm3–xm13).
  */
object GifCodec {

  /** Decoded GIF: `pixels` = top-down BGR triples (w*h*3), palette
    * already applied; `comment` = first comment extension ("" if
    * absent).
    */
  final case class GifImage(width: Int, height: Int, comment: String,
      pixels: Array[Byte])

  private final val MaxCode = 4096 // 12-bit LZW ceiling (GIF89a spec)

  // ------------------------------------------------------------ encode

  /** Encode an indexed image: `indices` = top-down pixel indices
    * (w*h bytes, unsigned) into `palette` (256 RGB triples, 768
    * bytes). Emits a comment extension when `comment` is non-empty.
    */
  def encodeGif(width: Int, height: Int, indices: Array[Byte],
      palette: Array[Byte], comment: String = ""): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      s"GIF dims out of range: ${width}x$height")
    require(indices.length == width * height,
      s"indices must be w*h = ${width * height}, got ${indices.length}")
    require(palette.length == 768, s"palette must be 256*3 bytes")
    val out = new ByteArrayOutputStream(indices.length / 2 + 1024)
    out.write("GIF89a".getBytes("ISO-8859-1"))
    // logical screen descriptor: dims, GCT present / 8-bit color
    // resolution / 256-entry table (0xF7), background 0, aspect 0
    writeU16(out, width); writeU16(out, height)
    out.write(0xF7); out.write(0); out.write(0)
    out.write(palette, 0, 768)
    if (comment.nonEmpty) {
      out.write(0x21); out.write(0xFE)
      val cb = comment.getBytes("ISO-8859-1")
      var off = 0
      while (off < cb.length) {
        val n = math.min(255, cb.length - off)
        out.write(n); out.write(cb, off, n); off += n
      }
      out.write(0)
    }
    // image descriptor: origin 0,0, full frame, no LCT, no interlace
    out.write(0x2C)
    writeU16(out, 0); writeU16(out, 0)
    writeU16(out, width); writeU16(out, height)
    out.write(0)
    out.write(8) // LZW minimum code size for an 8-bit palette
    writeSubBlocks(out, lzwCompress(indices))
    out.write(0x3B)
    out.toByteArray
  }

  /** One decoded animation frame: `delayCs` from its graphic control
    * extension (centiseconds, 0 when absent); `pixels` the FULL
    * logical-screen top-down BGR canvas AFTER compositing this frame
    * (sub-rect frames draw over what disposal left behind — what a
    * viewer shows at this point of the animation).
    */
  final case class GifFrame(delayCs: Int, pixels: Array[Byte])

  /** Decoded animated GIF: logical screen dims, first comment, and
    * every frame composited to the full canvas.
    */
  final case class GifAnim(width: Int, height: Int, comment: String,
      frames: Vector[GifFrame])

  /** Encode a multi-frame GIF89a animation: NETSCAPE2.0 infinite
    * loop extension, optional comment, then per frame a graphic
    * control extension (delay in centiseconds, disposal
    * "do not dispose") and a full-logical-screen image block. Each
    * frame is an index stream like [[encodeGif]]'s.
    */
  def encodeAnimGif(width: Int, height: Int,
      frames: Seq[Array[Byte]], delaysCs: Seq[Int],
      palette: Array[Byte], comment: String = ""): Array[Byte] = {
    require(frames.nonEmpty, "animation needs at least one frame")
    require(frames.length == delaysCs.length,
      "one delay per frame required")
    encodeAnimFrames(width, height,
      frames.zip(delaysCs).map { case (f, d) =>
        AnimFrame(0, 0, width, height, f, d, disposal = 1,
          transparentIdx = -1)
      }, palette, comment)
  }

  /** Full-control frame for [[encodeAnimFrames]]: sub-rect placement,
    * disposal method (0..3), transparency (`transparentIdx` ≥ 0 sets
    * the GCE transparent-color flag).
    */
  private[graft] final case class AnimFrame(x: Int, y: Int,
      w: Int, h: Int, indices: Array[Byte], delayCs: Int,
      disposal: Int, transparentIdx: Int)

  private[graft] def encodeAnimFrames(width: Int, height: Int,
      frames: Seq[AnimFrame], palette: Array[Byte],
      comment: String): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      s"GIF dims out of range: ${width}x$height")
    require(palette.length == 768, "palette must be 256*3 bytes")
    val out = new ByteArrayOutputStream(1024 +
      frames.iterator.map(_.indices.length / 2).sum)
    out.write("GIF89a".getBytes("ISO-8859-1"))
    writeU16(out, width); writeU16(out, height)
    out.write(0xF7); out.write(0); out.write(0)
    out.write(palette, 0, 768)
    // NETSCAPE2.0 application extension: loop forever (the block
    // every real-world animated GIF carries)
    out.write(0x21); out.write(0xFF); out.write(11)
    out.write("NETSCAPE2.0".getBytes("ISO-8859-1"))
    out.write(3); out.write(1); writeU16(out, 0); out.write(0)
    if (comment.nonEmpty) {
      out.write(0x21); out.write(0xFE)
      val cb = comment.getBytes("ISO-8859-1")
      var off = 0
      while (off < cb.length) {
        val n = math.min(255, cb.length - off)
        out.write(n); out.write(cb, off, n); off += n
      }
      out.write(0)
    }
    frames.foreach { f =>
      require(f.x >= 0 && f.y >= 0 && f.w > 0 && f.h > 0 &&
        f.x + f.w <= width && f.y + f.h <= height,
        s"frame rect ${f.w}x${f.h}@${f.x},${f.y} outside " +
          s"${width}x$height")
      require(f.indices.length == f.w * f.h,
        s"frame indices must be w*h = ${f.w * f.h}")
      require(f.disposal >= 0 && f.disposal <= 3, "bad disposal")
      // graphic control extension
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write((f.disposal << 2) |
        (if (f.transparentIdx >= 0) 1 else 0))
      writeU16(out, f.delayCs)
      out.write(math.max(0, f.transparentIdx)); out.write(0)
      // image descriptor + LZW data
      out.write(0x2C)
      writeU16(out, f.x); writeU16(out, f.y)
      writeU16(out, f.w); writeU16(out, f.h)
      out.write(0)
      out.write(8)
      writeSubBlocks(out, lzwCompress(f.indices))
    }
    out.write(0x3B)
    out.toByteArray
  }

  private def writeU16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }

  private def writeSubBlocks(out: ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0)
  }

  /** GIF-LZW compress an 8-bit index stream. Dictionary keyed
    * (prefixCode << 8 | byte); codes written LSB-first at the current
    * width; width grows when the next code the DECODER will allocate
    * reaches the width's ceiling (the one-step-deferred sync of the
    * spec), and a clear code resets the table when it fills at 4096.
    */
  private[multimodal] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val clear = 256
    val eoi = 257
    val bits = new BitWriter
    var codeSize = 9
    var nextCode = 258
    var dict = new scala.collection.mutable.LongMap[Int](1 << 12)
    bits.write(clear, codeSize)
    if (data.isEmpty) { bits.write(eoi, codeSize); return bits.result() }
    var current = data(0) & 0xFF
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xFF
      val key = (current.toLong << 8) | b
      dict.get(key) match {
        case Some(code) => current = code
        case None =>
          bits.write(current, codeSize)
          dict(key) = nextCode
          nextCode += 1
          // the decoder allocates this entry one code later, so its
          // read width for our NEXT code trails by exactly one slot
          if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (nextCode == MaxCode) {
            bits.write(clear, codeSize)
            codeSize = 9; nextCode = 258
            dict = new scala.collection.mutable.LongMap[Int](1 << 12)
          }
          current = b
      }
      i += 1
    }
    bits.write(current, codeSize)
    // mirror the decoder's add-after-final-code: it allocates one more
    // entry while processing `current`, which can bump the width it
    // reads EOI at (readers like ImageIO's consume the EOI; ours stops
    // at the expected pixel count, but the stream must serve both)
    nextCode += 1
    if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
    bits.write(eoi, codeSize)
    bits.result()
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream(4096)
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nBits > 0) { out.write((acc & 0xFF).toInt); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------ decode

  /** Parse a GIF to top-down BGR pixels (first image block; palette
    * applied, interlace unwoven). Rejects bad signatures, truncated
    * streams, and LZW code-stream corruption.
    */
  def decodeGif(bytes: Array[Byte]): GifImage = {
    val in = new Cursor(bytes)
    val sig = new String(in.take(6), "ISO-8859-1")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF: '$sig'")
    in.u16(); in.u16() // logical screen dims (image descriptor rules)
    val packed = in.u8()
    in.u8(); in.u8() // background index, aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = in.take(3 * n)
    }
    var comment = ""
    while (true) {
      in.u8() match {
        case 0x21 => // extension
          val label = in.u8()
          if (label == 0xFE && comment.isEmpty) {
            val sb = new StringBuilder
            var n = in.u8()
            while (n != 0) {
              sb.append(new String(in.take(n), "ISO-8859-1")); n = in.u8()
            }
            comment = sb.toString
          } else {
            var n = in.u8()
            while (n != 0) { in.skip(n); n = in.u8() }
          }
        case 0x2C => // image descriptor
          in.u16(); in.u16() // left, top
          val w = in.u16(); val h = in.u16()
          require(w > 0 && h > 0, s"GIF image dims out of range: ${w}x$h")
          require(w.toLong * h * 3 <= Int.MaxValue, "GIF pixel volume overflow")
          val ipacked = in.u8()
          val interlaced = (ipacked & 0x40) != 0
          val lct =
            if ((ipacked & 0x80) != 0) in.take(3 * (2 << (ipacked & 7)))
            else gct
          require(lct != null, "GIF image has no color table")
          val minCode = in.u8()
          require(minCode >= 2 && minCode <= 8,
            s"bad LZW minimum code size $minCode")
          val comp = new ByteArrayOutputStream(w * h / 2 + 64)
          var n = in.u8()
          while (n != 0) { comp.write(in.take(n), 0, n); n = in.u8() }
          val raw = lzwDecompress(comp.toByteArray, minCode, w * h)
          val indices = if (interlaced) deinterlace(raw, w, h) else raw
          val px = new Array[Byte](w * h * 3)
          val nColors = lct.length / 3
          var p = 0
          while (p < w * h) {
            val idx = indices(p) & 0xFF
            require(idx < nColors, s"palette index $idx >= $nColors")
            px(3 * p) = lct(3 * idx + 2)     // B
            px(3 * p + 1) = lct(3 * idx + 1) // G
            px(3 * p + 2) = lct(3 * idx)     // R
            p += 1
          }
          return GifImage(w, h, comment, px)
        case 0x3B =>
          throw new IllegalArgumentException("GIF has no image block")
        case b =>
          throw new IllegalArgumentException(
            f"unexpected GIF block 0x$b%02X at ${in.pos - 1}")
      }
    }
    sys.error("unreachable")
  }

  /** Decode EVERY frame of a (possibly animated) GIF, compositing
    * each image block onto the logical-screen canvas the way a
    * viewer renders it: sub-rect placement, GCE transparency (the
    * transparent index leaves the underlying canvas visible),
    * disposal 2 (restore rect to background = zeros) and 3 (restore
    * the pre-frame canvas) applied between frames. Unknown
    * extensions (NETSCAPE loop, plain text, application) are
    * block-walked and skipped; the first comment is recovered.
    */
  def decodeAnimGif(bytes: Array[Byte]): GifAnim = {
    val in = new Cursor(bytes)
    val sig = new String(in.take(6), "ISO-8859-1")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF: '$sig'")
    val sw = in.u16(); val sh = in.u16()
    require(sw > 0 && sh > 0, s"GIF screen dims out of range: ${sw}x$sh")
    require(sw.toLong * sh * 3 <= Int.MaxValue, "GIF canvas overflow")
    val packed = in.u8()
    in.u8(); in.u8()
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) gct = in.take(3 * (2 << (packed & 7)))
    val canvas = new Array[Byte](sw * sh * 3)
    var comment = ""
    var delayCs = 0
    var disposal = 0
    var transIdx = -1
    val frames = Vector.newBuilder[GifFrame]
    var done = false
    while (!done) {
      in.u8() match {
        case 0x21 =>
          val label = in.u8()
          if (label == 0xF9) { // graphic control: applies to NEXT image
            val sz = in.u8()
            require(sz == 4, s"bad GCE size $sz")
            val gp = in.u8()
            delayCs = in.u16()
            val t = in.u8()
            require(in.u8() == 0, "GCE missing terminator")
            disposal = (gp >> 2) & 7
            transIdx = if ((gp & 1) != 0) t else -1
          } else if (label == 0xFE && comment.isEmpty) {
            val sb = new StringBuilder
            var n = in.u8()
            while (n != 0) {
              sb.append(new String(in.take(n), "ISO-8859-1")); n = in.u8()
            }
            comment = sb.toString
          } else {
            var n = in.u8()
            while (n != 0) { in.skip(n); n = in.u8() }
          }
        case 0x2C =>
          val fx = in.u16(); val fy = in.u16()
          val fw = in.u16(); val fh = in.u16()
          require(fw > 0 && fh > 0 && fx + fw <= sw && fy + fh <= sh,
            s"GIF frame rect ${fw}x$fh@$fx,$fy outside ${sw}x$sh")
          val ipacked = in.u8()
          val interlaced = (ipacked & 0x40) != 0
          val lct =
            if ((ipacked & 0x80) != 0) in.take(3 * (2 << (ipacked & 7)))
            else gct
          require(lct != null, "GIF image has no color table")
          val minCode = in.u8()
          require(minCode >= 2 && minCode <= 8,
            s"bad LZW minimum code size $minCode")
          val comp = new ByteArrayOutputStream(fw * fh / 2 + 64)
          var n = in.u8()
          while (n != 0) { comp.write(in.take(n), 0, n); n = in.u8() }
          val raw = lzwDecompress(comp.toByteArray, minCode, fw * fh)
          val indices = if (interlaced) deinterlace(raw, fw, fh) else raw
          val saved =
            if (disposal == 3) canvas.clone() else null
          val nColors = lct.length / 3
          var yy = 0
          while (yy < fh) {
            var xx = 0
            while (xx < fw) {
              val idx = indices(yy * fw + xx) & 0xFF
              if (idx != transIdx) {
                require(idx < nColors, s"palette index $idx >= $nColors")
                val o = ((fy + yy) * sw + (fx + xx)) * 3
                canvas(o) = lct(3 * idx + 2)
                canvas(o + 1) = lct(3 * idx + 1)
                canvas(o + 2) = lct(3 * idx)
              }
              xx += 1
            }
            yy += 1
          }
          frames += GifFrame(delayCs, canvas.clone())
          // disposal for the NEXT frame's backdrop
          if (disposal == 2) {
            var y2 = 0
            while (y2 < fh) {
              java.util.Arrays.fill(canvas,
                ((fy + y2) * sw + fx) * 3,
                ((fy + y2) * sw + fx + fw) * 3, 0.toByte)
              y2 += 1
            }
          } else if (disposal == 3) {
            System.arraycopy(saved, 0, canvas, 0, canvas.length)
          }
          delayCs = 0; disposal = 0; transIdx = -1
        case 0x3B => done = true
        case b =>
          throw new IllegalArgumentException(
            f"unexpected GIF block 0x$b%02X at ${in.pos - 1}")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF has no image block")
    GifAnim(sw, sh, comment, fs)
  }

  /** Reorder interlaced row data (spec Appendix E): the stream holds
    * rows in four passes — every 8th from 0, every 8th from 4, every
    * 4th from 2, every 2nd from 1 — back into top-down order.
    */
  private[graft] def deinterlace(raw: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var row = start
      while (row < h) {
        System.arraycopy(raw, src * w, out, row * w, w)
        src += 1; row += step
      }
    }
    out
  }

  /** GIF-LZW decompress to exactly `expected` bytes. Handles the
    * KwKwK case (`code == next`), clear-code resets, and the 12-bit
    * table ceiling (entries stop growing at 4096 until a clear).
    */
  private[multimodal] def lzwDecompress(data: Array[Byte], minCode: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Byte](MaxCode)
    val stack = new Array[Byte](MaxCode)
    val out = new Array[Byte](expected)
    var outPos = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var acc = 0L
    var nBits = 0
    var inPos = 0
    while (outPos < expected) {
      while (nBits < codeSize) {
        require(inPos < data.length, "truncated LZW stream")
        acc |= (data(inPos) & 0xFFL) << nBits
        nBits += 8; inPos += 1
      }
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize; nBits -= codeSize
      if (code == clear) {
        codeSize = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        throw new IllegalArgumentException(
          s"LZW end-of-information before $expected pixels ($outPos)")
      } else {
        require(code < next || (code == next && prev >= 0),
          s"LZW code $code out of range (next=$next)")
        // expand `code` (or KwKwK: prev + first(prev)) onto the stack
        var sp = 0
        var c = if (code == next) prev else code
        if (code == next) { stack(sp) = 0; sp = 1 } // placeholder for first
        while (c >= clear + 2) {
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        val first = c.toByte
        stack(sp) = first; sp += 1
        if (code == next) stack(0) = first
        // emit reversed
        require(outPos + sp <= expected,
          s"LZW output overruns $expected pixels")
        var i = sp - 1
        while (i >= 0) { out(outPos) = stack(i); outPos += 1; i -= 1 }
        if (prev >= 0 && next < MaxCode) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  private final class Cursor(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, s"truncated GIF at $pos")
      val v = bytes(pos) & 0xFF; pos += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && pos.toLong + n <= bytes.length,
        s"truncated GIF: need $n bytes at $pos of ${bytes.length}")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; a
    }
    def skip(n: Int): Unit = {
      require(n >= 0 && pos.toLong + n <= bytes.length,
        s"truncated GIF: skip $n at $pos of ${bytes.length}")
      pos += n
    }
  }
}

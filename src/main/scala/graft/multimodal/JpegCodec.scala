package graft.multimodal

/** Pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT, SOF0) —
  * the xm12 image path (VERDICT r9 #3 / r10 #1 / r11 #1: JPEG is the
  * dominant crawl image format and the one container the multimodal
  * family could not read).
  *
  * Encoder: 8-bit 3-component YCbCr, 4:4:4 (no subsampling), Annex K
  * quantization and Huffman tables, JFIF APP0, optional COM segment,
  * byte-stuffed entropy stream. Decoder: full baseline parse — segment
  * walk, DQT/DHT/SOF0/SOS/DRI, canonical Huffman decode, restart
  * markers, DC prediction, dequant + zigzag, separable IDCT,
  * replicated chroma upsampling for 4:2:0/4:2:2/4:1:1 (factors ≤ 2),
  * YCbCr→RGB. Grayscale (1-component) scans decode too. Rejected
  * loudly: progressive (SOF2), arithmetic coding, 12-bit precision,
  * sampling factors > 2.
  *
  * Exactness contract (the xs7-style stated contract): JPEG is lossy,
  * so decoded pixels of ARBITRARY content are codec-specific (IDCT
  * and upsampling rounding differ across implementations — libjpeg
  * uses AAN + fancy upsampling; this codec uses exact separable
  * double-precision DCT + replication). Two disciplines pin it down:
  *
  *  1. BLOCK-SOLID images with even gray levels round-trip
  *     BIT-EXACTLY through the entire pipeline: a solid 8×8 block at
  *     gray g has F(0,0) = 8·(g−128) and all AC ≈ 0, quantized DC =
  *     (g−128)/2 exactly (q₀₀ = 16, g even ⇒ no rounding tie), and
  *     the DC-only IDCT reconstructs g exactly. The xm12 oracle
  *     plants such images and hash-gates the decoded pixel stream.
  *  2. Cross-implementation checks against the JDK's independent
  *     ImageIO codec (MultimodalSpec): this encoder's output decoded
  *     by ImageIO, and ImageIO's encoder output decoded here, agree
  *     within a stated tolerance on smooth content and exactly on
  *     solid content.
  */
object JpegCodec {

  /** Decoded JPEG: top-down BGR triples (w·h·3), like [[MediaCodecs.BmpImage]],
    * so the shared ahash64 core applies unchanged; `comment` = the
    * first COM segment's bytes as ISO-8859-1 (empty if none).
    */
  final case class JpegImage(width: Int, height: Int, nComp: Int,
      comment: String, pixels: Array[Byte])

  // ------------------------------------------------------- Annex K tables

  /** Zigzag order: zig(i) = raster index of the i-th zigzag position. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance quantization table (raster order). */
  private[multimodal] val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K chrominance quantization table (raster order). */
  private[multimodal] val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K Huffman specs: (bits[1..16] code counts, symbol values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  /** Canonical Huffman code assignment: (codes, lengths) per symbol
    * index, per T.81 Annex C (codes ascend within a length, lengths
    * ascend).
    */
  private def canonicalCodes(bits: Array[Int]): (Array[Int], Array[Int]) = {
    val n = (1 to 16).map(bits(_)).sum
    val lens = new Array[Int](n)
    val codes = new Array[Int](n)
    var k = 0
    var code = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { lens(k) = l; codes(k) = code; code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    (codes, lens)
  }

  /** Encoder-side Huffman table: symbol → (code, length). */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    locally {
      val (cs, ls) = canonicalCodes(bits)
      var i = 0
      while (i < vals.length) { code(vals(i)) = cs(i); len(vals(i)) = ls(i); i += 1 }
    }
  }

  /** Decoder-side canonical Huffman table (T.81 F.2.2.3 decode):
    * minCode/maxCode/valPtr per length.
    */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private lazy val EncDcLum = new HuffEnc(DcLumBits, DcLumVals)
  private lazy val EncDcChrom = new HuffEnc(DcChromBits, DcChromVals)
  private lazy val EncAcLum = new HuffEnc(AcLumBits, AcLumVals)
  private lazy val EncAcChrom = new HuffEnc(AcChromBits, AcChromVals)

  // --------------------------------------------------------------- DCT

  /** cosTab(u)(x) = C(u)·cos((2x+1)uπ/16) / 2 — the separable 1-D
    * basis; a full 2-D pass is two 1-D passes (rows then columns).
    */
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Forward 2-D DCT of one level-shifted 8×8 block (in raster order). */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows: tmp(y,u) = Σx in(y,x)·cos(u,x)
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * cosTab(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) { // columns
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * cosTab(v)(y); y += 1 }
        out(v * 8 + u2) = s
        u2 += 1
      }
      v += 1
    }
  }

  /** Inverse 2-D DCT (separable), raster in/out. */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // rows: tmp(v,x) = Σu in(v,u)·cos(u,x)
      var v = 0
      while (v < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += in(v * 8 + u) * cosTab(u)(x); u += 1 }
        tmp(v * 8 + x) = s
        v += 1
      }
      x += 1
    }
    var y = 0
    while (y < 8) { // columns
      var x2 = 0
      while (x2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x2) * cosTab(v)(y); v += 1 }
        out(y * 8 + x2) = s
        x2 += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------ encoder

  /** Entropy-coded bit writer with 0xFF byte stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = {
      if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(acc & 0xFF)
        if ((acc & 0xFF) == 0xFF) out.write(0x00)
        acc = 0; nbits = 0
      }
    }
  }

  /** Magnitude category (SSSS) of a coefficient value. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Integer YCbCr forward transform — deterministic fixed-point
    * (8-bit fraction), EXACT on gray input: r=g=b=v gives Y=v,
    * Cb=Cr=128 bit-for-bit (77+150+29 = 256 and the chroma rows sum
    * to 0), which the xm12 block-solid oracle contract relies on.
    */
  private def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = (77 * r + 150 * g + 29 * b + 128) >> 8
    val cb = ((128 * b - 43 * r - 85 * g + 128) >> 8) + 128
    val cr = ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128
    (clamp255(y), clamp255(cb), clamp255(cr))
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Encode top-down BGR pixels as a baseline JFIF JPEG (4:4:4, Annex
    * K tables, optional COM segment).
    */
  def encodeJpeg(width: Int, height: Int, pixels: Array[Byte],
      comment: String = ""): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 65500 && height <= 65500,
      s"bad JPEG dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixels must be w*h*3 = ${width * height * 3}, got ${pixels.length}")

    // plane extraction with edge replication to full 8-multiple grid
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val planes = Array.ofDim[Int](3, bw * 8 * bh * 8)
    var y = 0
    while (y < bh * 8) {
      val sy = math.min(y, height - 1)
      var x = 0
      while (x < bw * 8) {
        val sx = math.min(x, width - 1)
        val base = (sy * width + sx) * 3
        val (yy, cb, cr) = rgbToYcc(pixels(base + 2) & 0xFF,
          pixels(base + 1) & 0xFF, pixels(base) & 0xFF)
        val o = y * bw * 8 + x
        planes(0)(o) = yy; planes(1)(o) = cb; planes(2)(o) = cr
        x += 1
      }
      y += 1
    }

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    def segment(m: Int, body: Array[Int]): Unit = {
      marker(m); u16(body.length + 2); body.foreach(u8)
    }

    marker(0xD8) // SOI
    segment(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      .map(_.toInt)) // APP0 JFIF 1.1, no density, no thumbnail
    if (comment.nonEmpty) {
      val cb = comment.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      segment(0xFE, cb.map(_ & 0xFF))
    }
    // DQT: two tables in one segment, zigzag order
    segment(0xDB,
      ((0 +: Zigzag.toSeq.map(QLum(_))) ++
        (1 +: Zigzag.toSeq.map(QChrom(_)))).toArray)
    // SOF0: 8-bit, 3 components, all 1x1 sampling (4:4:4)
    segment(0xC0, Array(8, height >> 8, height & 0xFF, width >> 8,
      width & 0xFF, 3,
      1, 0x11, 0, // Y: id 1, h=v=1, qtable 0
      2, 0x11, 1, // Cb
      3, 0x11, 1)) // Cr
    // DHT: all four Annex K tables in one segment
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Seq[Int] =
      ((cls << 4) | id) +: ((1 to 16).map(bits(_)) ++ vals.toSeq)
    segment(0xC4, (dht(0, 0, DcLumBits, DcLumVals) ++
      dht(1, 0, AcLumBits, AcLumVals) ++
      dht(0, 1, DcChromBits, DcChromVals) ++
      dht(1, 1, AcChromBits, AcChromVals)).toArray)
    // SOS
    segment(0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw8 = bw * 8
    val bits = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val blk = new Array[Double](64)
    val coef = new Array[Double](64)
    val quant = new Array[Int](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var c = 0
        while (c < 3) { // MCU = one block per component at 4:4:4
          val q = if (c == 0) QLum else QChrom
          val dcT = if (c == 0) EncDcLum else EncDcChrom
          val acT = if (c == 0) EncAcLum else EncAcChrom
          var i = 0
          while (i < 64) {
            blk(i) = planes(c)((by * 8 + i / 8) * bw8 + bx * 8 + i % 8) - 128.0
            i += 1
          }
          fdct(blk, coef)
          i = 0
          while (i < 64) {
            quant(i) = Math.round(coef(Zigzag(i)) / q(Zigzag(i))).toInt
            i += 1
          }
          // DC: category + diff bits
          val diff = quant(0) - dcPred(c)
          dcPred(c) = quant(0)
          val s = category(diff)
          bits.put(dcT.code(s), dcT.len(s))
          if (s > 0) {
            val dv = if (diff < 0) diff + (1 << s) - 1 else diff
            bits.put(dv, s)
          }
          // AC: run-length RRRRSSSS with ZRL and EOB
          var run = 0
          var k = 1
          while (k < 64) {
            val v = quant(k)
            if (v == 0) run += 1
            else {
              while (run >= 16) { bits.put(acT.code(0xF0), acT.len(0xF0)); run -= 16 }
              val ss = category(v)
              val sym = (run << 4) | ss
              bits.put(acT.code(sym), acT.len(sym))
              val av = if (v < 0) v + (1 << ss) - 1 else v
              bits.put(av, ss)
              run = 0
            }
            k += 1
          }
          if (run > 0) bits.put(acT.code(0x00), acT.len(0x00)) // EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bits.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------ decoder

  /** Entropy-coded bit reader: un-stuffs FF00, stops at markers. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false

    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "entropy stream ran past EOF")
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < bytes.length, "dangling 0xFF at EOF")
          val nxt = bytes(pos) & 0xFF
          if (nxt == 0x00) pos += 1 // stuffed byte
          else {
            // a real marker terminates the entropy segment; per T.81
            // the decoder must not consume past it — keep returning
            // the pad bits (1s) and flag it
            hitMarker = true
            pos -= 1
            b = 0xFF
            acc = (acc << 8) | b
            nbits += 8
            nbits -= 1
            return (acc >>> nbits) & 1
          }
        }
        acc = (acc << 8) | b
        nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      hitMarker = false
      require(pos + 1 < bytes.length, "truncated at restart marker")
      require((bytes(pos) & 0xFF) == 0xFF &&
        (bytes(pos + 1) & 0xFF) == (0xD0 + expected),
        f"expected RST$expected%d marker at $pos")
      pos += 2
    }
  }

  private def huffDecode(br: BitReader, t: HuffDec): Int = {
    var code = br.bit()
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
        return t.values(t.valPtr(l) + code - t.minCode(l))
      code = (code << 1) | br.bit()
      l += 1
    }
    throw new IllegalArgumentException("invalid Huffman code in scan")
  }

  /** EXTEND (T.81 F.2.2.1): map SSSS raw bits to a signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Parse a baseline JPEG to top-down BGR pixels. See the object doc
    * for supported shapes and the exactness contract. Fails with
    * IllegalArgumentException on any malformed/truncated input: the
    * hot paths carry explicit requires, and residual out-of-bounds
    * reads from truncated segment bodies are converted at this
    * boundary (allocation is bounded by the dimension requires first,
    * so a crafted header cannot OOM past them).
    */
  def decodeJpeg(bytes: Array[Byte]): JpegImage =
    try decodeJpegImpl(bytes)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"truncated or corrupt JPEG: ${e.getMessage}", e)
    }

  private def decodeJpegImpl(bytes: Array[Byte]): JpegImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "not a JPEG (SOI)")
    var pos = 2
    def u16(at: Int): Int =
      ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)

    val qtab = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var width = 0; var height = 0
    var nComp = 0
    var comment = ""
    var restartInterval = 0
    // per component: id, h, v, qsel
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var pixels: Array[Byte] = null

    var seenSof = false
    var done = false
    while (!done) {
      require(pos + 2 <= bytes.length, "truncated JPEG (no EOI)")
      require((bytes(pos) & 0xFF) == 0xFF, f"expected marker at $pos")
      var m = bytes(pos + 1) & 0xFF
      // fill bytes: consecutive FFs before a marker are legal padding
      while (m == 0xFF) { pos += 1; m = bytes(pos + 1) & 0xFF }
      pos += 2
      m match {
        case 0xD9 => done = true // EOI
        case 0xC0 | 0xC1 => // SOF0/1 (baseline / extended sequential)
          val len = u16(pos)
          require(bytes(pos + 2) == 8, "only 8-bit precision supported")
          height = u16(pos + 3); width = u16(pos + 5)
          nComp = bytes(pos + 7) & 0xFF
          require(nComp == 1 || nComp == 3,
            s"unsupported component count $nComp")
          require(width > 0 && height > 0 &&
            width.toLong * height * 3 <= Int.MaxValue,
            s"unreasonable JPEG dimensions ${width}x$height")
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(pos + 8 + c * 3) & 0xFF
            val hv = bytes(pos + 9 + c * 3) & 0xFF
            compH(c) = hv >> 4; compV(c) = hv & 0xF
            require(compH(c) >= 1 && compH(c) <= 2 &&
              compV(c) >= 1 && compV(c) <= 2,
              s"unsupported sampling ${compH(c)}x${compV(c)} (factors <= 2)")
            compQ(c) = bytes(pos + 10 + c * 3) & 0xFF
            c += 1
          }
          seenSof = true
          pos += len
        case 0xC2 =>
          throw new IllegalArgumentException(
            "progressive JPEG (SOF2) unsupported — baseline only")
        case x if x >= 0xC3 && x <= 0xCF && x != 0xC4 && x != 0xC8 && x != 0xCC =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker 0xFF$x%02X (baseline only)")
        case 0xCC =>
          throw new IllegalArgumentException(
            "arithmetic coding (DAC) unsupported")
        case 0xDB => // DQT, possibly several tables per segment
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) & 0xFF) >> 4
            val tq = bytes(p) & 0x0F
            require(pq == 0, "16-bit quant tables unsupported")
            require(tq < 4, s"bad quant table id $tq")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = bytes(p + 1 + i) & 0xFF; i += 1 }
            qtab(tq) = t
            p += 65
          }
          pos += len
        case 0xC4 => // DHT, possibly several tables per segment
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tc = (bytes(p) & 0xFF) >> 4
            val th = bytes(p) & 0x0F
            require(tc <= 1 && th < 4, s"bad Huffman table spec $tc/$th")
            val bits = new Array[Int](17)
            var n = 0
            var i = 1
            while (i <= 16) { bits(i) = bytes(p + i) & 0xFF; n += bits(i); i += 1 }
            val vals = new Array[Int](n)
            i = 0
            while (i < n) { vals(i) = bytes(p + 17 + i) & 0xFF; i += 1 }
            val t = new HuffDec(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
          pos += len
        case 0xDD => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xFE => // COM — keep the first
          val len = u16(pos)
          if (comment.isEmpty && len > 2)
            comment = new String(bytes, pos + 2, len - 2,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          pos += len
        case 0xDA => // SOS — decode the scan, then expect EOI
          require(seenSof, "SOS before SOF")
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xFF
          require(ns == nComp,
            s"non-interleaved/multi-scan JPEG unsupported ($ns of $nComp)")
          val scanDc = new Array[Int](nComp)
          val scanAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cs = bytes(pos + 3 + c * 2) & 0xFF
            val idx = compId.indexOf(cs)
            require(idx >= 0, s"scan references unknown component $cs")
            scanDc(idx) = (bytes(pos + 4 + c * 2) & 0xFF) >> 4
            scanAc(idx) = bytes(pos + 4 + c * 2) & 0x0F
            c += 1
          }
          pos += len
          pixels = decodeScan(bytes, pos, width, height, nComp,
            compH, compV, compQ, scanDc, scanAc, qtab, dcTabs, acTabs,
            restartInterval) match {
            case (px, newPos) => pos = newPos; px
          }
        case x if x >= 0xE0 && x <= 0xEF => pos += u16(pos) // APPn
        case 0xDC => pos += u16(pos) // DNL — ignore
        case x =>
          // unknown segment with a length field — skip conservatively
          require(pos + 2 <= bytes.length, f"truncated segment 0xFF$x%02X")
          pos += u16(pos)
      }
    }
    require(pixels != null, "no scan decoded (missing SOS)")
    JpegImage(width, height, nComp, comment, pixels)
  }

  /** Decode one interleaved baseline scan; returns (BGR pixels, pos
    * after the entropy segment).
    */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
      height: Int, nComp: Int, compH: Array[Int], compV: Array[Int],
      compQ: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      qtab: Array[Array[Int]], dcTabs: Array[HuffDec],
      acTabs: Array[HuffDec],
      restartInterval: Int): (Array[Byte], Int) = {
    val hMax = compH.max
    val vMax = compV.max
    val mcuW = hMax * 8
    val mcuH = vMax * 8
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component plane at its own resolution
    val planeW = new Array[Int](nComp)
    val planeH = new Array[Int](nComp)
    val planes = new Array[Array[Int]](nComp)
    var c = 0
    while (c < nComp) {
      planeW(c) = mcusX * compH(c) * 8
      planeH(c) = mcusY * compV(c) * 8
      planes(c) = new Array[Int](planeW(c) * planeH(c))
      require(qtab(compQ(c)) != null, s"missing quant table ${compQ(c)}")
      require(dcTabs(scanDc(c)) != null && acTabs(scanAc(c)) != null,
        "missing Huffman table referenced by scan")
      c += 1
    }
    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Double](64)
    val px = new Array[Double](64)
    var mcu = 0
    var rstCount = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstCount % 8)
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      c = 0
      while (c < nComp) {
        val q = qtab(compQ(c))
        var v = 0
        while (v < compV(c)) {
          var h = 0
          while (h < compH(c)) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val s = huffDecode(br, dcTabs(scanDc(c)))
            require(s <= 11, s"bad DC category $s")
            val diff = extend(br.receive(s), s)
            dcPred(c) += diff
            coef(0) = dcPred(c).toDouble * q(0)
            // AC
            var k = 1
            while (k < 64) {
              val rs = huffDecode(br, acTabs(scanAc(c)))
              val r = rs >> 4
              val ss = rs & 0xF
              if (ss == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                require(k < 64, "AC run past block end")
                coef(Zigzag(k)) = extend(br.receive(ss), ss).toDouble * q(Zigzag(k))
                k += 1
              }
            }
            idct(coef, px)
            val bx = (mx * compH(c) + h) * 8
            val by = (my * compV(c) + v) * 8
            var i = 0
            while (i < 64) {
              planes(c)((by + i / 8) * planeW(c) + bx + i % 8) =
                clamp255(Math.round(px(i) + 128.0).toInt)
              i += 1
            }
            h += 1
          }
          v += 1
        }
        c += 1
      }
      mcu += 1
    }
    // skip to the next marker after the entropy segment
    var pos = br.pos
    while (pos + 1 < bytes.length &&
      !((bytes(pos) & 0xFF) == 0xFF && (bytes(pos + 1) & 0xFF) != 0x00))
      pos += 1

    // color reconstruction with replicated (nearest) chroma upsampling
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (nComp == 1) {
          val g = planes(0)(y * planeW(0) + x)
          out(o) = g.toByte; out(o + 1) = g.toByte; out(o + 2) = g.toByte
        } else {
          val yy = planes(0)(
            (y * compV(0) / vMax) * planeW(0) + x * compH(0) / hMax)
          val cb = planes(1)(
            (y * compV(1) / vMax) * planeW(1) + x * compH(1) / hMax)
          val cr = planes(2)(
            (y * compV(2) / vMax) * planeW(2) + x * compH(2) / hMax)
          val r = clamp255(Math.round(yy + 1.402 * (cr - 128)).toInt)
          val g = clamp255(Math.round(
            yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)).toInt)
          val b = clamp255(Math.round(yy + 1.772 * (cb - 128)).toInt)
          out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        }
        x += 1
      }
      y += 1
    }
    (out, pos)
  }
}

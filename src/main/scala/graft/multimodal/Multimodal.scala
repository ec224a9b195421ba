package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2.11): media as opaque `binary`
  * payloads plus a typed metadata struct, processed with batch-shaped
  * `mapPartitions` over typed Datasets — the Scala analog of PySpark's
  * `mapInPandas` (iterator-of-batches in, iterator-of-batches out, no
  * per-row UDF dispatch, constant memory per partition).
  *
  * Image (BMP) and audio (WAV PCM) containers are REAL pure-JVM codecs
  * ([[MediaCodecs]], golden-byte tested): xm3/xm4 encode genuine
  * containers and recover metadata by parsing the bytes. Formats that
  * need native codec libraries (JPEG/MP3/video — not in this
  * environment) stay behind [[DecodeStub]], a deterministic fake that
  * keeps the Spark-side plumbing — schema, encoders, partitioning,
  * batch iteration, feature shape — real and tested (MultimodalSpec).
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_bytes: Long)

  /** Output of the (stubbed) decode + feature-extraction stage. */
  case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      histogram: Array[Double])

  /** STUB decode: a real implementation would parse the image/audio
    * container here (payload → pixel/sample buffer). The deterministic
    * fake derives "dimensions" from the byte length and "pixels" from
    * the bytes themselves, keeping every downstream shape honest.
    */
  object DecodeStub {
    def dims(nBytes: Long): (Int, Int) =
      (64 + (nBytes % 576).toInt, 64 + ((nBytes * 7) % 416).toInt)

    /** 16-bin byte histogram, L1-normalized — stands in for an image
      * feature vector.
      */
    def features(payload: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      var i = 0
      while (i < payload.length) {
        h((payload(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < 16) { h(j) /= payload.length; j += 1 }
      }
      h
    }
  }

  /** Wrap a text table as a media table: payload = utf-8 bytes (the
    * honest parts — BinaryType column, metadata struct — are exactly
    * what a real image table would carry).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast(LongType))
      .withColumn("width", (lit(64) + col("n_bytes") % 576).cast(IntegerType))
      .withColumn("height",
        (lit(64) + (col("n_bytes") * 7) % 416).cast(IntegerType))

  /** Batch decode + feature extraction via typed mapPartitions: one
    * decode context per partition (the expensive part for real codecs),
    * streaming over rows.
    */
  def decodeAndFeaturize(media: Dataset[MediaRecord])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stub) decoder goes here
      it.map { r =>
        val feats = DecodeStub.features(r.payload)
        MediaFeatures(r.media_id, r.kind, r.width, r.height, feats)
      }
    }
  }

  /** Resize stage (stub): a real implementation re-encodes the pixel
    * buffer at (targetW, targetH); the stub rewrites the metadata and
    * keeps the payload opaque. The Spark shape is the honest part —
    * a narrow per-partition map, no shuffle, metadata struct updated
    * in-plan.
    */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => r.copy(width = targetW, height = targetH))
    }
  }

  // ------------------------------------------------------- real decoders

  /** An encoded media container (BMP or WAV bytes). */
  case class MediaBlob(media_id: Long, payload: Array[Byte])

  /** Metadata recovered by PARSING a BMP payload (not from a side
    * channel) — oracle-checked against the planted formulas in xm3.
    */
  case class BmpMeta(media_id: Long, width: Int, height: Int, bpp: Int,
      npx: Int)

  /** Metadata recovered by parsing a WAV payload (xm4). */
  case class WavMeta(media_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Int, dur_ms: Int)

  /** Metadata + positional pixel checksum recovered by FULLY decoding
    * a PNG payload (xm11): inflate + unfilter, so `pxsum` (a
    * position-weighted sum over every decoded byte) proves the
    * scanline filters reconstructed bit-exactly — an aggregate alone
    * could mask compensating errors; position weights cannot.
    */
  case class PngMeta(media_id: Long, width: Int, height: Int,
      bit_depth: Int, color_type: Int, npx: Int, pxsum: Long,
      ahash_hi: Long, ahash_lo: Long)

  /** Deterministic fill bytes: cycle the source text bytes (or a fixed
    * ramp when the text is empty) — content for the encoded payloads.
    */
  case class AudioHash(media_id: Long, afp: Long, n_frames: Int)

  /** 32-bit energy-delta audio fingerprint over REAL WAV parsing,
    * integer-exact end to end (the xm7 contract — the audio face of
    * xm5's integer aHash): mono-mix each frame by SUMMING its channel
    * samples (no division), pool frames into 33 sequential bins
    * (bin = f·33/frames — surjective for every planted length since
    * frames ≥ 50 > 33), per-bin energy = Σ|mono|, and set bit b iff
    * E[b+1] > E[b] — the classic energy-contour fingerprint bit.
    * Division-free and float-free, so the DuckDB oracle (which
    * replays the PLANTED sample formulas, never touching container
    * bytes) must match bit for bit — a decoder bug (header offset,
    * channel interleave, 16-bit sign handling) breaks the hash gate.
    */
  def audioFingerprintTable(media: Dataset[MediaBlob])
      : Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { blob =>
        val wav = MediaCodecs.decodeWav(blob.payload)
        val ch = wav.channels
        val frames = wav.samples.length / ch
        val e = new Array[Long](33)
        var f = 0
        while (f < frames) {
          var m = 0L
          var c = 0
          while (c < ch) { m += wav.samples(f * ch + c); c += 1 }
          e((f.toLong * 33 / frames).toInt) += math.abs(m)
          f += 1
        }
        var afp = 0L
        var b = 0
        while (b < 32) {
          if (e(b + 1) > e(b)) afp |= 1L << b
          b += 1
        }
        AudioHash(blob.media_id, afp, frames)
      }
    }
  }

  /** Perceptual near-dup audio pairs (xm8): band the 32-bit
    * fingerprint into 4 bytes — pigeonhole guarantees every pair with
    * Hamming ≤ 3 shares at least one identical band — equi-join on
    * (band, value), then verify exact Hamming with bit_count(xor).
    * xm6's banding machinery at fingerprint width: candidate volume
    * is Σ bucket², never clip², and payloads never join — only the
    * 8-byte fingerprints move.
    */
  def audioNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"audioNearDups: 4-byte banding guarantees recall only to " +
        s"Hamming 3, got $maxHamming")
    val banded = hashes.select(col("media_id"), col("afp"),
        explode(expr("""transform(sequence(0, 3), b ->
          named_struct('band', b, 'v',
            shiftright(afp, b * 8) % 256))""")).as("bd"))
      .select(col("media_id"), col("afp"),
        col("bd.band").as("band"), col("bd.v").as("v"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("ida"), col("b.media_id").as("idb"),
        expr("bit_count(a.afp ^ b.afp)").as("hd"))
      .where(col("hd") <= maxHamming)
      .distinct()
  }

  case class AudioQuality(media_id: Long, n_frames: Int, n_win: Int,
      zc: Long, flat_win: Int, e_max: Long)

  /** Per-clip audio quality signals over REAL WAV parsing (xm16) —
    * the audio face of the text quality filters: training-data
    * curation drops silent/flat/degenerate clips before transcription
    * or contrastive pairing (the energy tier of a WebRTC-VAD-style
    * gate). All signals run on the FIRST-DIFFERENCE of the mono mix —
    * the 1-sample high-pass every real VAD applies first: it kills DC
    * offset (a clip stuck at a constant non-zero level IS silence),
    * and on this corpus's planted samples the raw mono never changes
    * sign, so raw-signal ZCR would be vacuously zero (the xt15
    * vacuous-rule trap, avoided by construction).
    *
    * Integer-exact end to end (the xm7 contract): mono-mix by channel
    * SUM (no division), delta d_f = m_f − m_{f−1}, fixed 25-delta
    * windows with energy Σd² (≤ 25·130560² ≪ 2^63 — exact Long), a
    * window is FLAT iff Σd² < floor²·count (delta-RMS < `rmsFloor`
    * by integer cross-multiplication, the xm5 trick — no sqrt, no
    * division), zero crossings counted where consecutive delta
    * products go negative. Float-free, so the oracle's
    * planted-formula replay must match bit for bit; any decode bug
    * (interleave, sign, header offset) breaks the gate.
    *
    * Output: (media_id, n_frames, n_win, zc, flat_win, e_max).
    */
  def audioQualityTable(media: Dataset[MediaBlob], winFrames: Int = 25,
      rmsFloor: Long = 1000): Dataset[AudioQuality] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { blob =>
        val wav = MediaCodecs.decodeWav(blob.payload)
        val ch = wav.channels
        val frames = wav.samples.length / ch
        val nd = math.max(frames - 1, 0)
        val nwin = (nd + winFrames - 1) / winFrames
        val ss = new Array[Long](math.max(nwin, 1))
        val cnt = new Array[Int](math.max(nwin, 1))
        var zc = 0L
        var prevM = 0L
        var prevD = 0L
        var f = 0
        while (f < frames) {
          var m = 0L
          var c = 0
          while (c < ch) { m += wav.samples(f * ch + c); c += 1 }
          if (f > 0) {
            val d = m - prevM
            val w = (f - 1) / winFrames
            ss(w) += d * d
            cnt(w) += 1
            if (f > 1 && prevD * d < 0) zc += 1
            prevD = d
          }
          prevM = m
          f += 1
        }
        var flat = 0
        var emax = 0L
        var w = 0
        while (w < nwin) {
          if (ss(w) < rmsFloor * rmsFloor * cnt(w)) flat += 1
          if (ss(w) > emax) emax = ss(w)
          w += 1
        }
        AudioQuality(blob.media_id, frames, nwin, zc, flat, emax)
      }
    }
  }

  def cyclicBytes(src: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    if (src.isEmpty)
      while (i < n) { out(i) = ((i % 251) - 125).toByte; i += 1 }
    else
      while (i < n) { out(i) = src(i % src.length); i += 1 }
    out
  }

  /** Encode each document as a REAL 24bpp BMP: dims planted from the
    * id (SQL-expressible for the oracle), pixels from the text bytes.
    * Narrow per-partition map, payload built once per row.
    */
  def encodeBmpTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = (8 + id % 24).toInt
          val h = (8 + (id * 3) % 16).toInt
          val px = cyclicBytes(
            Option(text).getOrElse("").getBytes("UTF-8"), w * h * 3)
          MediaBlob(id, MediaCodecs.encodeBmp(w, h, px))
        }
      }
  }

  /** Parse the BMP container back to metadata (real decode path). */
  def decodeBmpMeta(media: Dataset[MediaBlob]): Dataset[BmpMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = MediaCodecs.decodeBmp(b.payload)
        BmpMeta(b.media_id, img.width, img.height, img.bpp,
          img.pixels.length)
      }
    }
  }

  /** Encode each document as a REAL PNG (8-bit RGB, zlib IDAT): the
    * same planted dims/pixels as [[encodeBmpTable]], with the
    * scanline filter type rotating (doc_id + row) % 5 — every decode
    * exercises all five PNG unfilters on real data.
    */
  def encodePngTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = (8 + id % 24).toInt
          val h = (8 + (id * 3) % 16).toInt
          val px = cyclicBytes(
            Option(text).getOrElse("").getBytes("UTF-8"), w * h * 3)
          MediaBlob(id,
            MediaCodecs.encodePng(w, h, px, r => ((id + r) % 5).toInt))
        }
      }
  }

  /** Full PNG decode (xm11): geometry + position-weighted pixel
    * checksum + the SAME [[ahash64]] the BMP/AVI paths use — the
    * cross-container hash-equality contract. `pxsum` weights byte p
    * (of the top-down BGR stream, the planted order) by (p % 97 + 1).
    */
  def decodePngFull(media: Dataset[MediaBlob]): Dataset[PngMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = MediaCodecs.decodePng(b.payload)
        var sum = 0L
        var p = 0
        while (p < img.pixels.length) {
          sum += (img.pixels(p) & 0xFF).toLong * (p % 97 + 1)
          p += 1
        }
        val (hi, lo) = ahash64(img.pixels, img.width, img.height)
        PngMeta(b.media_id, img.width, img.height, img.bitDepth,
          img.colorType, img.pixels.length, sum, hi, lo)
      }
    }
  }

  /** Metadata + positional pixel checksum recovered by FULLY decoding
    * a baseline JPEG payload (xm12): segment walk, Huffman decode,
    * dequant, IDCT, YCbCr→RGB. `comment` comes from the COM segment
    * (planted, SQL-expressible); `pxsum` position-weights every
    * decoded BGR byte like xm11's PNG checksum. The planted images
    * are BLOCK-SOLID at even gray levels, for which the lossy
    * pipeline is integer-exact end to end (see [[JpegCodec]]'s
    * stated contract) — so the DuckDB oracle replays the planted
    * levels and the hash gate catches any Huffman/DC-prediction/
    * dequant/IDCT/color-transform bug. AC-coefficient content is
    * cross-validated against the JDK's independent ImageIO codec in
    * MultimodalSpec.
    */
  case class JpegMeta(media_id: Long, width: Int, height: Int,
      ncomp: Int, comment: String, npx: Int, pxsum: Long)

  /** Encode each document as a REAL baseline JPEG: dims planted from
    * the id as 8-multiples (8/16/24 × 8/16 — whole MCUs at 4:4:4),
    * each 8×8 block solid at even gray level 2·((id·7 + bi·13) % 128)
    * where bi = (y/8)·(w/8) + (x/8) — the block-solid lattice whose
    * decode is bit-exact (DC-only blocks; DC diffs across blocks
    * exercise the Huffman category coder and the DC prediction
    * chain). COM segment carries 'graft:<id>'.
    */
  def encodeJpegTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 * (1 + id % 3)).toInt
          val h = (8 * (1 + id % 2)).toInt
          val px = new Array[Byte](w * h * 3)
          var p = 0
          while (p < px.length) {
            val pi = p / 3
            val bi = (pi / w / 8) * (w / 8) + (pi % w) / 8
            px(p) = (2 * ((id * 7 + bi * 13) % 128)).toByte
            p += 1
          }
          MediaBlob(id, JpegCodec.encodeJpeg(w, h, px, s"graft:$id"))
        }
      }
  }

  /** Full JPEG decode (xm12): geometry + COM recovery + position-
    * weighted checksum over the decoded top-down BGR stream (byte p
    * weighted by p % 97 + 1, the xm11 weighting).
    */
  def decodeJpegMeta(media: Dataset[MediaBlob]): Dataset[JpegMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = JpegCodec.decodeJpeg(b.payload)
        var sum = 0L
        var p = 0
        while (p < img.pixels.length) {
          sum += (img.pixels(p) & 0xFF).toLong * (p % 97 + 1)
          p += 1
        }
        JpegMeta(b.media_id, img.width, img.height, img.nComp,
          img.comment, img.pixels.length, sum)
      }
    }
  }

  /** aHash over the REAL JPEG decode path (xm13): the cross-container
    * integer-hash contract ([[ahash64]] shared by BMP/PNG/AVI)
    * extended to the LOSSY codec — possible only because the planted
    * block-solid lattices decode bit-exactly ([[JpegCodec]]'s stated
    * contract), so the DuckDB oracle replays the planted levels
    * through the same integer aHash arithmetic and must match bit
    * for bit; any Huffman/DC-chain/IDCT/color slip flips hash bits.
    */
  def jpegAHashTable(media: Dataset[MediaBlob]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = JpegCodec.decodeJpeg(b.payload)
        val (hi, lo) = ahash64(img.pixels, img.width, img.height)
        ImageHash(b.media_id, hi, lo)
      }
    }
  }

  /** Full GIF decode result (xm14): geometry + recovered comment +
    * position-weighted pixel checksum + the shared [[ahash64]]. GIF
    * is LOSSLESS over its palette, so — unlike JPEG's block-solid
    * contract — arbitrary planted index streams round-trip bit-exactly
    * and the oracle hash-gates data-dependent content directly.
    */
  case class GifMeta(media_id: Long, width: Int, height: Int,
      comment: String, npx: Int, pxsum: Long, ahash_hi: Long,
      ahash_lo: Long)

  /** Encode each document as a REAL GIF89a: the xm5/xm11 planted dims
    * (w = 8 + id%24, h = 8 + 3·id%16), a 256-entry grayscale palette
    * (entry i = (i,i,i)), per-PIXEL indices cycling the text bytes
    * (ramp fallback for empty text — [[cyclicBytes]] per pixel, not
    * per channel: GIF is indexed), comment extension 'graft:<id>'.
    * Text-dependent index streams give LZW real data: repeated
    * substrings in the document become real dictionary hits, and the
    * ramp exercises the literal path.
    */
  def encodeGifTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    val palette = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      palette(3 * i) = i.toByte; palette(3 * i + 1) = i.toByte
      palette(3 * i + 2) = i.toByte; i += 1
    }
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = (8 + id % 24).toInt
          val h = (8 + (id * 3) % 16).toInt
          val idx = cyclicBytes(
            Option(text).getOrElse("").getBytes("UTF-8"), w * h)
          MediaBlob(id, GifCodec.encodeGif(w, h, idx, palette, s"graft:$id"))
        }
      }
  }

  /** Full GIF decode (xm14): LZW decompress + palette mapping back to
    * the top-down BGR stream, then the xm11 position-weighted
    * checksum and the shared integer [[ahash64]]. With the grayscale
    * palette, decoded byte p equals the planted per-pixel index at
    * p/3 — SQL-replayable, so any LZW/palette/block-walk bug breaks
    * the hash gate.
    */
  def decodeGifFull(media: Dataset[MediaBlob]): Dataset[GifMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = GifCodec.decodeGif(b.payload)
        var sum = 0L
        var p = 0
        while (p < img.pixels.length) {
          sum += (img.pixels(p) & 0xFF).toLong * (p % 97 + 1)
          p += 1
        }
        val (hi, lo) = ahash64(img.pixels, img.width, img.height)
        GifMeta(b.media_id, img.width, img.height, img.comment,
          img.pixels.length, sum, hi, lo)
      }
    }
  }

  /** One decoded + sampled animation frame (xm15): per-frame GCE
    * delay, whole-animation duration, and the shared [[ahash64]] of
    * the composited canvas.
    */
  case class GifAnimFrameMeta(media_id: Long, frame_no: Int,
      delay_cs: Int, duration_cs: Int, ahash_hi: Long, ahash_lo: Long)

  /** Encode each document as a REAL animated GIF89a: the xm9 planted
    * geometry (w = 8 + id%24, h = 8 + 3·id%16, nf = 2 + id%4 frames),
    * one planted per-pixel index stream sliced across the frames
    * (frame f gets pixels [f·w·h, (f+1)·w·h)), per-frame GCE delay
    * 4 + (id+f)%6 centiseconds, NETSCAPE loop block, comment
    * 'graft:<id>'.
    */
  def encodeAnimGifTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    val palette = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      palette(3 * i) = i.toByte; palette(3 * i + 1) = i.toByte
      palette(3 * i + 2) = i.toByte; i += 1
    }
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = (8 + id % 24).toInt
          val h = (8 + (id * 3) % 16).toInt
          val nf = (2 + id % 4).toInt
          val all = cyclicBytes(
            Option(text).getOrElse("").getBytes("UTF-8"), w * h * nf)
          val frames = (0 until nf).map(f =>
            java.util.Arrays.copyOfRange(all, f * w * h, (f + 1) * w * h))
          val delays = (0 until nf).map(f => (4 + (id + f) % 6).toInt)
          MediaBlob(id, GifCodec.encodeAnimGif(w, h, frames, delays,
            palette, s"graft:$id"))
        }
      }
  }

  /** Decode every frame of each animated GIF and SAMPLE the even
    * frames (the video-pipeline frame-sample shape, as xm9 hashes
    * all AVI frames): per sampled frame the GCE delay, the full
    * animation duration (Σ ALL frames' delays — gating the decode of
    * the frames the sample drops), and the composited canvas's
    * [[ahash64]].
    */
  def sampleAnimGifFrames(media: Dataset[MediaBlob],
      every: Int): Dataset[GifAnimFrameMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { b =>
        val anim = GifCodec.decodeAnimGif(b.payload)
        val duration = anim.frames.iterator.map(_.delayCs).sum
        anim.frames.iterator.zipWithIndex.collect {
          case (f, fi) if fi % every == 0 =>
            val (hi, lo) = ahash64(f.pixels, anim.width, anim.height)
            GifAnimFrameMeta(b.media_id, fi, f.delayCs, duration, hi, lo)
        }
      }
    }
  }

  /** Encode each document as a real 16-bit PCM WAV: rate/channels
    * planted from the id, frame count from the text byte length,
    * samples from the text bytes.
    */
  def encodeWavTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val rate = (8000 + (id % 4) * 4000).toInt
          val channels = (1 + id % 2).toInt
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          val frames = 50 + bytes.length % 200
          val raw = cyclicBytes(bytes, frames * channels)
          val samples = new Array[Short](frames * channels)
          var i = 0
          while (i < samples.length) {
            samples(i) = (((raw(i) & 0xff) - 128) << 8).toShort
            i += 1
          }
          MediaBlob(id, MediaCodecs.encodeWav(rate, channels, samples))
        }
      }
  }

  /** Scene-cut detection (xm19) — the shot-segmentation pass a video
    * curation pipeline runs before per-scene sampling/dedup: a cut
    * between consecutive sampled frames iff their aHash Hamming
    * distance exceeds `minHd` (perceptual hashes are stable within a
    * shot and jump across one — the standard hash-difference
    * detector). Composes [[frameHashTable]]'s integer hashes, so the
    * whole chain stays hash-gated; the lag window is PARTITIONED BY
    * media (frames per video are bounded — never a corpus-wide
    * window).
    *
    * Output: one row per transition — (media_id, frame_no, hd, cut)
    * with frame_no the LATER frame.
    */
  def sceneCuts(frameHashes: DataFrame, minHd: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    frameHashes
      .withColumn("__ph", lag(col("ahash_hi"), 1).over(w))
      .withColumn("__pl", lag(col("ahash_lo"), 1).over(w))
      .where(col("__ph").isNotNull)
      .select(col("media_id"), col("frame_no"),
        (expr("bit_count(ahash_hi ^ __ph)") +
          expr("bit_count(ahash_lo ^ __pl)")).cast(LongType).as("hd"))
      .withColumn("cut", (col("hd") > minHd).cast(IntegerType))
  }

  /** Fixed-point period-16 DFT basis for [[toneProbeTable]]:
    * floor(cos/sin(2π·k·n/16)·1e3 + 0.5) — StrictMath, shipped to the
    * oracle as generated literals (the xm17 discipline).
    */
  def toneCosE3(k: Int, n: Int): Long =
    math.floor(StrictMath.cos(
      2.0 * math.Pi * k * n / 16.0) * 1e3 + 0.5).toLong
  def toneSinE3(k: Int, n: Int): Long =
    math.floor(StrictMath.sin(
      2.0 * math.Pi * k * n / 16.0) * 1e3 + 0.5).toLong

  case class ToneProbe(media_id: Long, dom_bin: Int, mag_dom: Long,
      mag_sum: Long)

  /** Dominant-tone probe over REAL WAV parsing (xm18) — the spectral
    * screen audio curation runs before transcription (pure tones /
    * mains hum / test signals are non-speech and get dropped; the
    * Goertzel-bank shape, batch-expressed): project the first
    * channel onto a PERIOD-16 DFT basis (bins k = 1..7, i.e.
    * frequencies k·rate/16 — a periodic basis so the cos/sin tables
    * are 16 entries per bin, not samples-sized), magnitude per bin as
    * the INTEGER L1 proxy |Re| + |Im| (squaring would overflow
    * 64-bit at these scales; argmax under L1 is the same screening
    * decision, stated honestly), dominant bin = argmax with ties to
    * the smaller k.
    *
    * Integer-exact end to end: samples are the decoder's shorts, the
    * basis is a fixed-point literal, |Re|+|Im| ≤ 1.7e13 — so the
    * operator hash-gates against the planted-formula replay (a WAV
    * header/stride/channel-interleave bug breaks the match).
    */
  def toneProbeTable(media: Dataset[MediaBlob]): Dataset[ToneProbe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val wav = MediaCodecs.decodeWav(b.payload)
        val ch = wav.channels
        val frames = wav.samples.length / ch
        val re = new Array[Long](8)
        val im = new Array[Long](8)
        var n = 0
        while (n < frames) {
          val m = wav.samples(n * ch).toLong
          var k = 1
          while (k < 8) {
            re(k) += m * toneCosE3(k, n % 16)
            im(k) += m * toneSinE3(k, n % 16)
            k += 1
          }
          n += 1
        }
        var dom = 1; var best = -1L; var sum = 0L
        var k = 1
        while (k < 8) {
          val mag = math.abs(re(k)) + math.abs(im(k))
          sum += mag
          if (mag > best) { best = mag; dom = k }
          k += 1
        }
        ToneProbe(b.media_id, dom, best, sum)
      }
    }
  }

  /** Parse the WAV container back to metadata (real decode path). */
  def decodeWavMeta(media: Dataset[MediaBlob]): Dataset[WavMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val wav = MediaCodecs.decodeWav(b.payload)
        val frames = wav.samples.length / wav.channels
        WavMeta(b.media_id, wav.sampleRate, wav.channels,
          wav.bitsPerSample, frames,
          (frames.toLong * 1000 / wav.sampleRate).toInt)
      }
    }
  }

  /** One sampled frame of a (stub-)video payload. */
  case class MediaFrame(
      media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame sampling (stub decode): treat the payload as `frameCount`
    * fixed-size frames and emit every `stride`-th one — the row-
    * expanding iterator-to-iterator shape of real video sampling
    * (one decoder per partition, frames streamed out, never the whole
    * video's frames in memory at once).
    */
  /** 64-bit perceptual hash (average-hash) of a decoded BMP, as two
    * unsigned 32-bit halves in signed longs (bit 63 of a single long
    * would flip its sign — hi/lo keeps every value positive and the
    * cross-engine arithmetic trivial).
    */
  case class ImageHash(media_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** aHash over REAL BMP parsing, integer-exact end to end (the xm5
    * contract): average-pool the top-down pixel stream into an 8×8
    * grid of (graysum, bytecount) cells — gray = the plain sum of the
    * three unsigned channel bytes, no division anywhere — and set
    * bit i·8+j iff the cell's average exceeds the GLOBAL byte average
    * by exact cross-multiplication `S_cell·B_total > S_total·b_cell`.
    * The usual aHash divides and compares doubles; this variant is
    * pure integer arithmetic, so the DuckDB oracle (which replays the
    * PLANTED pixel formulas, never touching container bytes) must
    * match bit for bit — a decoder bug (stride, bottom-up rows,
    * signed-byte handling) breaks the hash gate.
    */
  def aHashTable(media: Dataset[MediaBlob]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = MediaCodecs.decodeBmp(b.payload)
        val (hi, lo) = ahash64(img.pixels, img.width, img.height)
        ImageHash(b.media_id, hi, lo)
      }
    }
  }

  /** The integer-exact 8×8 average-hash core (shared by the BMP xm5
    * path and the per-AVI-frame xm9 path): top-down BGR pixels →
    * (hi, lo) 32-bit halves. Pure integer arithmetic (cell-vs-global
    * comparison by cross-multiplication), so the DuckDB planted-pixel
    * replay must match bit for bit.
    */
  private[multimodal] def ahash64(pixels: Array[Byte], w: Int,
      h: Int): (Long, Long) = {
    val s = Array.ofDim[Long](8, 8)
    val c = Array.ofDim[Long](8, 8)
    var r = 0
    while (r < h) {
      val i = r * 8 / h
      var cc = 0
      while (cc < w) {
        val j = cc * 8 / w
        val base = (r * w + cc) * 3
        s(i)(j) += (pixels(base) & 0xFF) +
          (pixels(base + 1) & 0xFF) + (pixels(base + 2) & 0xFF)
        c(i)(j) += 3
        cc += 1
      }
      r += 1
    }
    var sTot = 0L
    var i = 0
    while (i < 8) { var j = 0; while (j < 8) { sTot += s(i)(j); j += 1 }; i += 1 }
    val bTot = w.toLong * h * 3
    var hi = 0L; var lo = 0L
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (s(i)(j) * bTot > sTot * c(i)(j)) {
          val idx = i * 8 + j
          if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
        }
        j += 1
      }
      i += 1
    }
    (hi, lo)
  }

  /** Fixed-point DCT-II cosine constant: floor(cos(π(2x+1)u/(2N))·1e6
    * + 0.5). Computed with StrictMath (fdlibm — bit-reproducible on
    * every JVM) and shipped into the ORACLE as a literal VALUES table
    * generated from this same function, so no engine ever evaluates a
    * transcendental at query time (the xs6 codebook-as-plan-literal
    * discipline applied to DCT bases).
    */
  def dctCosE6(n: Int, u: Int, x: Int): Long =
    math.floor(StrictMath.cos(
      math.Pi * (2 * x + 1) * u / (2.0 * n)) * 1e6 + 0.5).toLong

  /** 64-bit DCT perceptual hash, hi/lo halves (the xm5 packing). */
  case class PHashRow(media_id: Long, phash_hi: Long, phash_lo: Long)

  /** pHash over REAL BMP parsing (xm17) — the DCT perceptual hash
    * every image-dedup stack ships beside aHash (more robust: bits
    * encode LOW-FREQUENCY structure, not per-cell brightness): 2-D
    * DCT-II of the channel-sum grayscale image via the fixed-point
    * cosine table, keep the 8×8 low-frequency block, drop DC, bit =
    * coefficient > lower-median of the 63 ACs.
    *
    * Integer-exact end to end: grayscale is the plain 3-byte sum (a
    * constant scale — DCT is linear, and order statistics commute
    * with positive scaling, so the bits are invariant), the separable
    * DCT accumulates Long products (|F| ≤ 765·1e6·31·1e6·23·… <
    * 5.6e17, no overflow; the oracle's SUM promotes to HUGEINT), and
    * the median is QUANTILE_DISC semantics — the 32nd-smallest
    * ELEMENT of the 63 ACs (never an interpolated average, which
    * DuckDB would compute in lossy DOUBLE past 2^53). Strict `>`
    * sends ties to 0 in both engines. Contrast scaling is exactly
    * hash-invariant (spec-gated); brightness shifts are only
    * approximately so (the quantized AC basis rows don't sum to
    * exactly zero — documented, not papered over).
    */
  def pHashTable(media: Dataset[MediaBlob]): Dataset[PHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val img = MediaCodecs.decodeBmp(b.payload)
        val (hi, lo) = phash64(img.pixels, img.width, img.height)
        PHashRow(b.media_id, hi, lo)
      }
    }
  }

  private[multimodal] def phash64(pixels: Array[Byte], w: Int,
      h: Int): (Long, Long) = {
    require(w >= 8 && h >= 8, s"phash64 needs >= 8x8 dims, got ${w}x$h")
    val g = new Array[Long](w * h)
    var q = 0
    while (q < w * h) {
      val b = q * 3
      g(q) = (pixels(b) & 0xFF) + (pixels(b + 1) & 0xFF) +
        (pixels(b + 2) & 0xFF)
      q += 1
    }
    val cw = Array.tabulate(8, w)((u, x) => dctCosE6(w, u, x))
    val ch = Array.tabulate(8, h)((v, y) => dctCosE6(h, v, y))
    // separable DCT: t(u)(y) = Σ_x g(y·w+x)·cw(u)(x)
    val t = Array.ofDim[Long](8, h)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < h) {
        var s = 0L
        var x = 0
        while (x < w) { s += g(y * w + x) * cw(u)(x); x += 1 }
        t(u)(y) = s
        y += 1
      }
      u += 1
    }
    val f = Array.ofDim[Long](8, 8)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < h) { s += t(u)(y) * ch(v)(y); y += 1 }
        f(u)(v) = s
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    var k = 0
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) { ac(k) = f(u)(v); k += 1 }
        v += 1
      }
      u += 1
    }
    val med = ac.sorted.apply(31) // lower median element (63 values)
    var hi = 0L; var lo = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if ((u != 0 || v != 0) && f(u)(v) > med) {
          val idx = u * 8 + v
          if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
        }
        v += 1
      }
      u += 1
    }
    (hi, lo)
  }

  /** Perceptual near-dup image pairs (xm6): band the 64-bit aHash
    * into 8 bytes — pigeonhole guarantees every pair with Hamming ≤ 7
    * shares at least one identical band — equi-join on (band, value),
    * then verify exact Hamming ≤ `maxHamming` with bit_count(xor).
    * The multimodal face of the SimHash-band dedup: candidate volume
    * is Σ bucket², never image², and payloads never join — only the
    * 16-byte hashes move.
    */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"imageNearDups: 8-byte banding guarantees recall only to " +
        s"Hamming 7, got $maxHamming")
    val banded = hashes.select(col("media_id"), col("ahash_hi"),
        col("ahash_lo"),
        explode(expr("""transform(sequence(0, 7), b ->
          named_struct('band', b, 'v',
            CASE WHEN b < 4 THEN shiftright(ahash_lo, b * 8) % 256
                 ELSE shiftright(ahash_hi, (b - 4) * 8) % 256 END))"""))
          .as("bd"))
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
        col("bd.band").as("band"), col("bd.v").as("v"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("ida"), col("b.media_id").as("idb"),
        (expr("bit_count(a.ahash_hi ^ b.ahash_hi)") +
          expr("bit_count(a.ahash_lo ^ b.ahash_lo)")).as("hd"))
      .where(col("hd") <= maxHamming)
      .distinct()
  }

  // ---------------------------------------------------------------- video

  case class AviMeta(media_id: Long, width: Int, height: Int, fps: Int,
      n_frames: Int, n_bytes: Long)

  /** One decoded-and-hashed video frame: the 64-bit integer aHash of
    * frame `frame_no`, same (hi, lo) split as [[ImageHash]].
    */
  case class FrameHash(media_id: Long, frame_no: Int,
      ahash_hi: Long, ahash_lo: Long)

  /** Encode each document as a REAL uncompressed AVI (RIFF container,
    * 24 bpp DIB '00db' frames): dims planted like the BMP table,
    * 2–5 frames planted from the id, pixels = ONE cyclic byte stream
    * over the text sliced into consecutive frames (so frame f starts
    * at stream position f·w·h·3 — SQL-expressible for the oracle).
    */
  def encodeAviTable(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = (8 + id % 24).toInt
          val h = (8 + (id * 3) % 16).toInt
          val nf = (2 + id % 4).toInt
          val fps = (4 + id % 6).toInt
          val frameBytes = w * h * 3
          val stream = cyclicBytes(
            Option(text).getOrElse("").getBytes("UTF-8"), frameBytes * nf)
          val frames = (0 until nf).map(f => java.util.Arrays
            .copyOfRange(stream, f * frameBytes, (f + 1) * frameBytes))
          MediaBlob(id, MediaCodecs.encodeAvi(w, h, fps, frames))
        }
      }
  }

  /** Parse the AVI container back to metadata (real decode path). */
  def decodeAviMeta(media: Dataset[MediaBlob]): Dataset[AviMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { b =>
        val v = MediaCodecs.decodeAvi(b.payload)
        AviMeta(b.media_id, v.width, v.height, v.fps, v.frames.length,
          b.payload.length.toLong)
      }
    }
  }

  /** Per-frame integer aHash over the REAL AVI decode (the xm9
    * contract): one decoder per partition, frames streamed out — the
    * row-expanding shape of real video feature extraction. A stride /
    * bottom-up / chunk-walk bug in the container code breaks the
    * planted-pixel hash gate.
    */
  def frameHashTable(media: Dataset[MediaBlob]): Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { b =>
        val v = MediaCodecs.decodeAvi(b.payload)
        v.frames.iterator.zipWithIndex.map { case (px, f) =>
          val (hi, lo) = ahash64(px, v.width, v.height)
          FrameHash(b.media_id, f, hi, lo)
        }
      }
    }
  }

  /** Perceptual near-dup VIDEO pairs (xm10): two videos match if any
    * frame of one is within Hamming `maxHamming` of any frame of the
    * other; output one row per video pair with the matched-frame-pair
    * count. Same scale skeleton as [[imageNearDups]] lifted to
    * frames: band each frame hash into 8 bytes (pigeonhole ⇒ every
    * frame pair with Hamming ≤ 7 shares a band), equi-join on
    * (band, value), verify exact Hamming, dedup multi-band hits, then
    * roll frame pairs up to video pairs. Candidate volume is
    * Σ bucket² over FRAME hashes — never frames², never videos² —
    * and payloads never join.
    */
  def videoNearDups(frameHashes: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"videoNearDups: 8-byte banding guarantees recall only to " +
        s"Hamming 7, got $maxHamming")
    val banded = frameHashes.select(col("media_id"), col("frame_no"),
        col("ahash_hi"), col("ahash_lo"),
        explode(expr("""transform(sequence(0, 7), b ->
          named_struct('band', b, 'v',
            CASE WHEN b < 4 THEN shiftright(ahash_lo, b * 8) % 256
                 ELSE shiftright(ahash_hi, (b - 4) * 8) % 256 END))"""))
          .as("bd"))
      .select(col("media_id"), col("frame_no"), col("ahash_hi"),
        col("ahash_lo"), col("bd.band").as("band"), col("bd.v").as("v"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .where(expr("bit_count(a.ahash_hi ^ b.ahash_hi)") +
        expr("bit_count(a.ahash_lo ^ b.ahash_lo)") <= maxHamming)
      .select(col("a.media_id").as("ida"), col("b.media_id").as("idb"),
        col("a.frame_no").as("fa"), col("b.frame_no").as("fb"))
      .distinct() // a frame pair can share several bands
      .groupBy("ida", "idb")
      .agg(count(lit(1)).as("n_frame_pairs"))
  }

  def sampleFrames(media: Dataset[MediaRecord], frameCount: Int,
      stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(frameCount > 0 && stride > 0)
    media.mapPartitions { it =>
      it.flatMap { r =>
        // ceil framing: frames tile the WHOLE payload (no unreachable
        // tail bytes); frames past the end are skipped, not emitted
        // empty (short payloads yield fewer frames)
        val frameSize =
          math.max(1, (r.payload.length + frameCount - 1) / frameCount)
        (0 until frameCount by stride).iterator
          .map(f => (f, f * frameSize,
            math.min(f * frameSize + frameSize, r.payload.length)))
          .takeWhile { case (_, from, _) => from < r.payload.length }
          .map { case (f, from, until) =>
            MediaFrame(r.media_id, f,
              java.util.Arrays.copyOfRange(r.payload, from, until))
          }
      }
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaCodecs, Multimodal}
import graft.queries.T

class MultimodalSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("BMP encode matches the public DIB layout byte-for-byte; " +
      "decode roundtrips pixels incl. row padding") {
    // 2x1, 24bpp: stride pads 6 pixel bytes to 8; file = 54 + 8 = 62
    val px = bytes(1, 2, 3, 4, 5, 6)
    val enc = MediaCodecs.encodeBmp(2, 1, px)
    val expected = bytes(
      0x42, 0x4d, 62, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // BM, size, off
      40, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0,              // hdr, w, h
      1, 0, 24, 0, 0, 0, 0, 0, 8, 0, 0, 0,              // planes,bpp,BI_RGB,img
      0x13, 0x0b, 0, 0, 0x13, 0x0b, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      1, 2, 3, 4, 5, 6, 0, 0)                           // row + 2 pad
    assert(java.util.Arrays.equals(enc, expected),
      enc.map(b => b & 0xff).mkString(","))
    val dec = MediaCodecs.decodeBmp(enc)
    assert(dec.width == 2 && dec.height == 1 && dec.bpp == 24)
    assert(java.util.Arrays.equals(dec.pixels, px))
  }

  test("BMP bottom-up storage and top-down (negative height) decode " +
      "agree on pixel order") {
    // 1x2 top-down pixels: row0 = (1,2,3), row1 = (4,5,6); stride 4
    val px = bytes(1, 2, 3, 4, 5, 6)
    val enc = MediaCodecs.encodeBmp(1, 2, px)
    // stored bottom-up: row1 first
    assert(enc.slice(54, 57).toSeq == Seq[Byte](4, 5, 6))
    assert(java.util.Arrays.equals(MediaCodecs.decodeBmp(enc).pixels, px))
    // craft the equivalent top-down file: height = -2, rows top-down
    val td = enc.clone()
    val bb = java.nio.ByteBuffer.wrap(td)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    System.arraycopy(bytes(1, 2, 3, 0), 0, td, 54, 4)
    System.arraycopy(bytes(4, 5, 6, 0), 0, td, 58, 4)
    assert(java.util.Arrays.equals(MediaCodecs.decodeBmp(td).pixels, px))
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(bytes(0x42, 0x41) ++ enc.drop(2)) // bad magic
    }
  }

  test("WAV encode matches the RIFF/PCM layout byte-for-byte; decoder " +
      "skips unknown chunks and honors the odd-size pad") {
    val enc = MediaCodecs.encodeWav(8000, 1, Array[Short](1, -2))
    val expected = bytes(
      0x52, 0x49, 0x46, 0x46, 40, 0, 0, 0, 0x57, 0x41, 0x56, 0x45,
      0x66, 0x6d, 0x74, 0x20, 16, 0, 0, 0, 1, 0, 1, 0,
      0x40, 0x1f, 0, 0, 0x80, 0x3e, 0, 0, 2, 0, 16, 0,
      0x64, 0x61, 0x74, 0x61, 4, 0, 0, 0, 1, 0, 0xfe, 0xff)
    assert(java.util.Arrays.equals(enc, expected),
      enc.map(b => b & 0xff).mkString(","))
    val dec = MediaCodecs.decodeWav(enc)
    assert(dec.sampleRate == 8000 && dec.channels == 1 &&
      dec.bitsPerSample == 16)
    assert(dec.samples.toSeq == Seq[Short](1, -2))
    // splice an odd-sized LIST chunk (3 bytes + 1 RIFF pad) before data
    val list = bytes(0x4c, 0x49, 0x53, 0x54, 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = enc.take(36) ++ list ++ enc.drop(36)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(MediaCodecs.decodeWav(spliced).samples.toSeq ==
      Seq[Short](1, -2))
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(enc.take(36)) // no data chunk
    }
  }

  test("xm3/xm4 pipelines: decoded metadata equals planted formulas " +
      "and BMP pixels roundtrip the text bytes") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(20)
    val metas = Multimodal.decodeBmpMeta(Multimodal.encodeBmpTable(docs))
      .collect()
    metas.foreach { m =>
      assert(m.width == 8 + (m.media_id % 24).toInt)
      assert(m.height == 8 + (m.media_id * 3 % 16).toInt)
      assert(m.npx == m.width * m.height * 3)
    }
    val one = docs.orderBy("doc_id").limit(1)
      .select("doc_id", "text").as[(Long, String)].collect()(0)
    val blob = Multimodal.encodeBmpTable(docs.where(col("doc_id") === one._1))
      .collect()(0)
    val img = MediaCodecs.decodeBmp(blob.payload)
    assert(java.util.Arrays.equals(img.pixels,
      Multimodal.cyclicBytes(one._2.getBytes("UTF-8"),
        img.width * img.height * 3)))
    val wavs = Multimodal.decodeWavMeta(Multimodal.encodeWavTable(docs))
      .collect()
    wavs.foreach { w =>
      assert(w.sample_rate == 8000 + (w.media_id % 4).toInt * 4000)
      assert(w.channels == 1 + (w.media_id % 2).toInt)
      assert(w.bits == 16)
      assert(w.dur_ms == (w.n_frames.toLong * 1000 / w.sample_rate).toInt)
    }
  }

  test("media table carries binary payload + typed metadata") {
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(schema("width") == "integer" && schema("height") == "integer")
    val r = media.orderBy("media_id").limit(1).collect()(0)
    val nb = r.getAs[Long]("n_bytes")
    assert(r.getAs[Array[Byte]]("payload").length.toLong == nb)
    assert(r.getAs[Int]("width") == 64 + (nb % 576).toInt)
  }

  test("decode+featurize via mapPartitions: normalized histograms, " +
      "deterministic") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.decodeAndFeaturize(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.histogram.length == 16)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    }
    // repartitioning must not change per-row results
    val feats2 = Multimodal.decodeAndFeaturize(media.repartition(7))
      .collect().map(f => f.media_id -> f.histogram.toSeq).toMap
    assert(feats.map(f => f.media_id -> f.histogram.toSeq).toMap == feats2)
  }

  test("resize rewrites metadata, keeps payload; no shuffle in plan") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
      .as[Multimodal.MediaRecord]
    val resized = Multimodal.resize(media, 224, 224)
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize must be a narrow map:\n$plan")
    val r = resized.orderBy("media_id").limit(1).collect()(0)
    assert(r.width == 224 && r.height == 224)
    assert(r.payload.nonEmpty)
  }

  test("frame sampling emits every stride-th frame, payload partitioned") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
      .as[Multimodal.MediaRecord].limit(5)
    val frames = Multimodal.sampleFrames(media, frameCount = 8, stride = 3)
      .collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.size == 5)
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_no).sorted.toSeq == Seq(0, 3, 6))
    }
    // sampled frames are disjoint slices of the payload
    val one = media.orderBy("media_id").limit(1)
      .collect()(0)
    val sampled = frames.filter(_.media_id == one.media_id)
      .sortBy(_.frame_no)
    // ceil framing tiles the whole payload; no frame starts past the end
    val frameSize = math.max(1, (one.payload.length + 7) / 8)
    sampled.foreach { f =>
      assert(f.frame_no * frameSize < one.payload.length)
      val expect = java.util.Arrays.copyOfRange(one.payload,
        f.frame_no * frameSize,
        math.min(f.frame_no * frameSize + frameSize, one.payload.length))
      assert(java.util.Arrays.equals(f.frame, expect))
      assert(f.frame.nonEmpty)
    }
    // stride=1 over a tiny payload: frames concatenate to the payload,
    // no empty frames for payload shorter than frameCount
    import spark.implicits._
    val tiny = Seq(Multimodal.MediaRecord(99L, "video",
      Array[Byte](1, 2, 3, 4, 5), 0, 0, 5L)).toDS()
    val tf = Multimodal.sampleFrames(tiny, frameCount = 8, stride = 1)
      .collect().sortBy(_.frame_no)
    assert(tf.forall(_.frame.nonEmpty))
    assert(tf.flatMap(_.frame).toSeq == Seq[Byte](1, 2, 3, 4, 5))
  }

  test("malformed containers fail the bounds checks cleanly — no " +
      "Int-overflow bypass, no raw OOM/IndexOutOfBounds") {
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV: data-chunk size near Int.MaxValue on a tiny file must hit
    // the 'overruns file' require, not wrap negative and allocate
    val wavEvil = {
      val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(1).putInt(8000).putInt(16000)
      b.putShort(2).putShort(16)
      b.put("data".getBytes("US-ASCII")).putInt(0x7ffffff0)
      b.array()
    }
    val e1 = intercept[IllegalArgumentException](
      MediaCodecs.decodeWav(wavEvil))
    assert(e1.getMessage.contains("overruns file"))
    // BMP: negative pixel offset and huge width must fail validation,
    // not crash in arraycopy / wrap the stride product
    val good = MediaCodecs.encodeBmp(2, 2, new Array[Byte](12))
    def patched(at: Int, v: Int): Array[Byte] = {
      val c = good.clone()
      ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN).putInt(at, v)
      c
    }
    val e2 = intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(patched(10, -100))) // pixelOffset < 54
    assert(e2.getMessage.contains("pixel-array offset"))
    val e3 = intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(patched(18, 0x7ffffff0))) // width overflow
    assert(e3.getMessage.contains("truncated BMP pixel array") ||
      e3.getMessage.contains("unreasonable BMP dimensions"))
    // round-trip still intact after the hardening
    val img = MediaCodecs.decodeBmp(good)
    assert(img.width == 2 && img.height == 2)
  }

  test("aHash: hand-computable half-bright image, exact bit pattern") {
    import spark.implicits._
    // 8x8, left half black, right half white: every cell is one
    // pixel, global mean sits at half, so exactly the right-half
    // bits set → lo == hi == 0xF0F0F0F0 (unsigned)
    val px = new Array[Byte](8 * 8 * 3)
    for (r <- 0 until 8; c <- 4 until 8; ch <- 0 until 3)
      px((r * 8 + c) * 3 + ch) = 0xFF.toByte
    val blob = Multimodal.MediaBlob(1L, MediaCodecs.encodeBmp(8, 8, px))
    val h = Multimodal.aHashTable(Seq(blob).toDS()).collect().head
    assert(h.ahash_lo == 0xF0F0F0F0L && h.ahash_hi == 0xF0F0F0F0L,
      s"got lo=${h.ahash_lo.toHexString} hi=${h.ahash_hi.toHexString}")
  }

  test("pHash: contrast scaling is exactly hash-invariant, edge " +
      "orientation lands in the expected DCT bit") {
    import spark.implicits._
    def hash(px: Array[Byte], w: Int, h: Int) = {
      val b = Multimodal.MediaBlob(1L, MediaCodecs.encodeBmp(w, h, px))
      val r = Multimodal.pHashTable(Seq(b).toDS()).collect().head
      (r.phash_hi, r.phash_lo)
    }
    val (w, h) = (16, 16)
    def fill(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px((y * w + x) * 3 + c) = f(x, y).toByte
      px
    }
    // vertical structure (bright top): strongest AC is (u=0, v=1)
    val vert = fill((_, y) => if (y < h / 2) 100 else 30)
    val (vh, vl) = hash(vert, w, h)
    assert((vl & (1L << 1)) != 0L, f"bit idx=1 unset: lo=$vl%x")
    // horizontal structure: strongest AC is (u=1, v=0) = idx 8
    val horiz = fill((x, _) => if (x < w / 2) 100 else 30)
    val (hh, hl) = hash(horiz, w, h)
    assert((hl & (1L << 8)) != 0L, f"bit idx=8 unset: lo=$hl%x")
    assert((vh, vl) != (hh, hl),
      "orthogonal edges should hash differently")
    // exact contrast invariance: double every pixel — DCT is linear
    // and order statistics commute with positive scaling
    val vert2 = fill((_, y) => if (y < h / 2) 200 else 60)
    assert(hash(vert2, w, h) == ((vh, vl)),
      "contrast doubling changed the pHash")
    // aHash and pHash disagree on SOME image (they measure different
    // things); sanity that this isn't aHash re-derived
    val ah = Multimodal.aHashTable(Seq(Multimodal.MediaBlob(1L,
      MediaCodecs.encodeBmp(w, h, vert))).toDS()).collect().head
    assert((ah.ahash_hi, ah.ahash_lo) != ((vh, vl)))
  }

  test("tone probe: square waves land in their DFT bin, constant " +
      "signal is silent, stereo reads the first channel") {
    import spark.implicits._
    def probe(samples: Array[Short], ch: Int) = {
      val b = Multimodal.MediaBlob(1L,
        MediaCodecs.encodeWav(8000, ch, samples))
      Multimodal.toneProbeTable(Seq(b).toDS()).collect().head
    }
    // period-8 square = 2 cycles per 16 samples -> bin 2
    val sq8 = Array.tabulate(160)(n =>
      (if (n % 8 < 4) 8000 else -8000).toShort)
    assert(probe(sq8, 1).dom_bin == 2)
    // period-4 square -> bin 4
    val sq4 = Array.tabulate(160)(n =>
      (if (n % 4 < 2) 8000 else -8000).toShort)
    assert(probe(sq4, 1).dom_bin == 4)
    // constant over whole periods: rounded basis rows cancel exactly
    val const = Array.fill(160)(1000.toShort)
    val c = probe(const, 1)
    assert(c.mag_sum == 0L && c.dom_bin == 1, s"$c")
    // stereo: first channel carries the period-8 square, second is
    // junk — interleave extraction must still find bin 2
    val rnd = new scala.util.Random(5)
    val stereo = new Array[Short](320)
    for (n <- 0 until 160) {
      stereo(2 * n) = sq8(n)
      stereo(2 * n + 1) = (rnd.nextInt(16000) - 8000).toShort
    }
    assert(probe(stereo, 2).dom_bin == 2)
  }

  test("imageNearDups: perturbed copies found, random pairs rejected") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val blobs = (0 until 20).flatMap { k =>
      val w = 16 + (k % 5); val h = 16 + (k % 3)
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val near = px.clone()
      // nudge a handful of bytes by 1 — cell sums move marginally,
      // flipping only boundary-straddling bits
      for (i <- 0 until 5) near(i * 7 % near.length) =
        (((near(i * 7 % near.length) & 0xFF) ^ 1)).toByte
      Seq(Multimodal.MediaBlob(k.toLong,
          MediaCodecs.encodeBmp(w, h, px)),
        Multimodal.MediaBlob(1000L + k,
          MediaCodecs.encodeBmp(w, h, near)))
    }
    val hashes = Multimodal.aHashTable(blobs.toDS()).toDF()
      .localCheckpoint(true)
    val pairs = Multimodal.imageNearDups(hashes, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (base, base+1000) pair must surface...
    for (k <- 0 until 20)
      assert(pairs.contains((k.toLong, 1000L + k)),
        s"planted near-dup pair $k missing: $pairs")
    // ...and unrelated random images (expected Hamming ≈ 32) must not
    assert(pairs.size == 20, s"false positives: ${pairs.size - 20}")
    // banding == brute force at Hamming ≤ 7 (the pigeonhole guarantee)
    val brute = hashes.as("a").crossJoin(hashes.as("b"))
      .where(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        (expr("bit_count(a.ahash_hi ^ b.ahash_hi)") +
          expr("bit_count(a.ahash_lo ^ b.ahash_lo)")).as("hd"))
      .where(col("hd") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == brute)
  }

  test("audio fingerprint: hand-computable rising-energy clip sets " +
      "all 32 delta bits through the real decode path") {
    import spark.implicits._
    // 66 mono frames, sample f = f·100: each of the 33 bins holds two
    // frames with energy 400b+100, strictly increasing → every
    // E[b+1] > E[b] bit set
    val samples = Array.tabulate[Short](66)(f => (f * 100).toShort)
    val blob = Multimodal.MediaBlob(1L,
      MediaCodecs.encodeWav(8000, 1, samples))
    val h = Multimodal.audioFingerprintTable(Seq(blob).toDS())
      .collect().head
    assert(h.afp == 0xFFFFFFFFL, s"got ${h.afp.toHexString}")
    assert(h.n_frames == 66)
  }

  test("audioNearDups: banding equals brute force, perturbed clips " +
      "stay within the Hamming budget") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val blobs = (0 until 25).flatMap { k =>
      val n = 80 + k
      val s = Array.fill[Short](n)((rnd.nextInt(40000) - 20000).toShort)
      val near = s.clone()
      // nudge three samples by +50: bin energies move marginally,
      // flipping only delta bits whose neighbors were near-equal
      for (i <- 0 until 3) {
        val p = i * 11 % n
        near(p) = (near(p) + 50).toShort
      }
      Seq(Multimodal.MediaBlob(k.toLong,
          MediaCodecs.encodeWav(8000, 1, s)),
        Multimodal.MediaBlob(1000L + k,
          MediaCodecs.encodeWav(8000, 1, near)))
    }
    val hashes = Multimodal.audioFingerprintTable(blobs.toDS()).toDF()
      .localCheckpoint(true)
    val blocked = Multimodal.audioNearDups(hashes, maxHamming = 3)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashes.select("media_id", "afp").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      a <- hs; b <- hs
      if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= 3
    } yield (a._1, b._1)).toSet
    assert(blocked == brute)
    val found = blocked.count { case (a, b) => b == a + 1000 }
    assert(found >= 15, s"only $found/25 perturbed clips within Hamming 3")
  }

  test("AVI container round-trips frames, dims and fps through a real " +
      "RIFF chunk walk") {
    val w = 5; val h = 3 // stride 16 pads 15 pixel bytes -> padding real
    val frames = (0 until 4).map(f =>
      Array.tabulate(w * h * 3)(i => ((i * 7 + f * 31) % 256).toByte))
    val enc = MediaCodecs.encodeAvi(w, h, 6, frames)
    assert(new String(enc, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(enc, 8, 4, "US-ASCII") == "AVI ")
    val dec = MediaCodecs.decodeAvi(enc)
    assert(dec.width == w && dec.height == h && dec.fps == 6)
    assert(dec.frames.length == 4)
    frames.zip(dec.frames).foreach { case (in, out) =>
      assert(java.util.Arrays.equals(in, out),
        "frame pixels must round-trip through bottom-up + stride")
    }
  }

  test("AVI decode binds to the first vids stream only: an audio strl " +
      "neither supplies geometry nor interleaves frames") {
    // hand-build a 2-stream AVI: stream 0 = auds (strf is a
    // WAVEFORMATEX, not a BITMAPINFOHEADER), stream 1 = vids; movi
    // holds an '00wb' audio chunk between two '01db' frames plus a
    // decoy '00db' chunk that only stream-index filtering rejects
    val w = 2; val h = 2
    val px = Array.tabulate(w * h * 3)(i => (i * 11 % 256).toByte)
    val single = MediaCodecs.encodeAvi(w, h, 7, Seq(px))
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h
    // pull the encoded DIB frame payload out of the single-stream file
    val moviAt = {
      var i = 12
      while (!(new String(single, i, 4, "US-ASCII") == "LIST" &&
        new String(single, i + 8, 4, "US-ASCII") == "movi")) i += 1
      i
    }
    val dib = java.util.Arrays.copyOfRange(single,
      moviAt + 12 + 8, moviAt + 12 + 8 + frameBytes)
    val bb = java.nio.ByteBuffer.allocate(4096)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = s.foreach(c => bb.put(c.toByte))
    def chunk(id: String, body: Array[Byte]): Unit = {
      fcc(id); bb.putInt(body.length); bb.put(body)
      if ((body.length & 1) == 1) bb.put(0.toByte)
    }
    val strhVids = java.util.Arrays.copyOfRange(single, {
      var i = 12
      while (new String(single, i, 4, "US-ASCII") != "strh") i += 1
      i + 8
    }, {
      var i = 12
      while (new String(single, i, 4, "US-ASCII") != "strh") i += 1
      i + 8 + 56
    })
    val strfVids = java.util.Arrays.copyOfRange(single, {
      var i = 12
      while (new String(single, i, 4, "US-ASCII") != "strf") i += 1
      i + 8
    }, {
      var i = 12
      while (new String(single, i, 4, "US-ASCII") != "strf") i += 1
      i + 8 + 40
    })
    val strhAuds = new Array[Byte](56)
    System.arraycopy("auds".getBytes("US-ASCII"), 0, strhAuds, 0, 4)
    val strfAuds = Array.tabulate[Byte](40)(i => (0xA0 + i).toByte)
    bb.position(12) // leave room for RIFF header, fill after
    fcc("LIST")
    val hdrlSizeAt = bb.position(); bb.putInt(0); fcc("hdrl")
    chunk("avih", new Array[Byte](56))
    fcc("LIST"); bb.putInt(4 + 8 + 56 + 8 + 40); fcc("strl")
    chunk("strh", strhAuds); chunk("strf", strfAuds)
    fcc("LIST"); bb.putInt(4 + 8 + 56 + 8 + 40); fcc("strl")
    chunk("strh", strhVids); chunk("strf", strfVids)
    bb.putInt(hdrlSizeAt, bb.position() - hdrlSizeAt - 4)
    fcc("LIST")
    val moviSizeAt = bb.position(); bb.putInt(0); fcc("movi")
    chunk("01db", dib)
    chunk("00wb", Array.tabulate[Byte](32)(_.toByte))
    chunk("00db", Array.fill[Byte](frameBytes)(0x55)) // decoy
    chunk("01db", dib)
    bb.putInt(moviSizeAt, bb.position() - moviSizeAt - 4)
    val total = bb.position()
    bb.position(0); fcc("RIFF"); bb.putInt(total - 8); fcc("AVI ")
    val multi = java.util.Arrays.copyOf(bb.array(), total)
    val dec = MediaCodecs.decodeAvi(multi)
    assert(dec.width == w && dec.height == h && dec.fps == 7)
    assert(dec.frames.length == 2,
      s"must keep only the 2 vids frames, got ${dec.frames.length}")
    dec.frames.foreach(f => assert(java.util.Arrays.equals(f, px),
      "decoy stream-0 frame leaked into the vids stream"))
  }

  test("AVI decode fails loudly on malformed ordering (movi before " +
      "hdrl) instead of decoding to zero frames") {
    // movi LIST with a '00db' frame chunk FIRST, then the hdrl with
    // the vids strl — frame chunks arrive while no vids stream is
    // known. Pre-fix this silently skipped them (ADVICE r8).
    val w = 2; val h = 2
    val px = Array.tabulate(w * h * 3)(i => (i * 7 % 256).toByte)
    val good = MediaCodecs.encodeAvi(w, h, 5, Seq(px))
    def findList(kind: String): Int = {
      var i = 12
      while (!(new String(good, i, 4, "US-ASCII") == "LIST" &&
        new String(good, i + 8, 4, "US-ASCII") == kind)) i += 1
      i
    }
    def listEnd(at: Int): Int = {
      val sz = java.nio.ByteBuffer.wrap(good, at + 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      at + 8 + sz + (sz & 1)
    }
    val hdrlAt = findList("hdrl"); val hdrlEnd = listEnd(hdrlAt)
    val moviAt = findList("movi"); val moviEnd = listEnd(moviAt)
    val bb = java.nio.ByteBuffer.allocate(good.length + 64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(good, 0, 12)                      // RIFF header
    bb.put(good, moviAt, moviEnd - moviAt)   // movi FIRST
    bb.put(good, hdrlAt, hdrlEnd - hdrlAt)   // hdrl after
    val total = bb.position()
    bb.putInt(4, total - 8)
    val bad = java.util.Arrays.copyOf(bb.array(), total)
    val err = intercept[IllegalArgumentException] {
      MediaCodecs.decodeAvi(bad)
    }
    assert(err.getMessage.contains("before the vids stream header"),
      err.getMessage)
  }

  test("PNG round-trip reconstructs pixels exactly under every filter " +
      "type, including 1-px-wide and 1-px-tall edges") {
    val rnd = new scala.util.Random(7)
    for (f <- 0 to 4; (w, h) <- Seq((5, 4), (1, 6), (7, 1), (16, 16))) {
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val enc = MediaCodecs.encodePng(w, h, px, _ => f)
      val dec = MediaCodecs.decodePng(enc)
      assert(dec.width == w && dec.height == h && dec.bitDepth == 8 &&
        dec.colorType == 2)
      assert(java.util.Arrays.equals(dec.pixels, px),
        s"filter $f ${w}x$h pixel mismatch")
    }
    // rotating filters (the xm11 shape)
    val px = Array.tabulate[Byte](24 * 13 * 3)(i => (i * 31 % 256).toByte)
    val enc = MediaCodecs.encodePng(24, 13, px, r => r % 5)
    assert(java.util.Arrays.equals(MediaCodecs.decodePng(enc).pixels, px))
  }

  test("PNG decode handles an INDEPENDENT encoder's output (JDK " +
      "ImageIO), not just our own writer") {
    val w = 19; val h = 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(11)
    val bgr = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      val base = (y * w + x) * 3
      bgr(base) = b.toByte; bgr(base + 1) = g.toByte; bgr(base + 2) = r.toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val dec = MediaCodecs.decodePng(bos.toByteArray)
    assert(dec.width == w && dec.height == h)
    assert(java.util.Arrays.equals(dec.pixels, bgr),
      "ImageIO-encoded PNG decoded to different pixels")
  }

  test("PNG aHash == BMP aHash of the same pixels (cross-container " +
      "equality through the shared integer core)") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(60)
    val png = Multimodal.decodePngFull(Multimodal.encodePngTable(docs))
      .toDF().select($"media_id", $"ahash_hi", $"ahash_lo")
    val bmp = Multimodal.aHashTable(Multimodal.encodeBmpTable(docs))
      .toDF().select($"media_id", $"ahash_hi".as("bhi"), $"ahash_lo".as("blo"))
    val joined = png.join(bmp, "media_id").collect()
    assert(joined.length == 60)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4),
        s"hash mismatch for media ${r.getLong(0)}")
    }
  }

  test("PNG decode rejects corrupted CRC, truncation, and interlace") {
    val px = Array.tabulate[Byte](6 * 4 * 3)(_.toByte)
    val good = MediaCodecs.encodePng(6, 4, px)
    val badCrc = good.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(badCrc)
    }.getMessage.contains("CRC"))
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(java.util.Arrays.copyOf(good, good.length - 12))
    }.getMessage.contains("IEND"))
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1.toByte // IHDR interlace flag
    // CRC now mismatches; fix it so the interlace guard itself fires
    val crc = new java.util.zip.CRC32()
    crc.update(interlaced, 12, 4 + 13)
    val cb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).putInt(crc.getValue.toInt).array()
    System.arraycopy(cb, 0, interlaced, 8 + 8 + 13, 4)
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(interlaced)
    }.getMessage.contains("interlaced"))
  }

  test("PNG decode rejects FDICT zlib instead of spinning forever") {
    // a crafted IDAT whose zlib header sets FDICT: Inflater.inflate()
    // then returns 0 with needsDictionary=true indefinitely — the
    // decoder must error out, not hang the executor
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(body.length).put(typ.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + body.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(2).putInt(2).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    // zlib: CMF=0x78, FLG=0x20 (FDICT set; 0x7820 % 31 == 0) + DICTID
    val fdictIdat = Array[Byte](0x78, 0x20, 0, 0, 0, 1)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdictIdat) ++
      chunk("IEND", Array.empty[Byte])
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(png)
    }.getMessage.contains("FDICT"))
  }

  test("AVI encode rejects >2 GB totals instead of overflowing Int") {
    // 1000x1000 frames are ~3 MB each; 800 of them pass the per-frame
    // checks but total ~2.4 GB — must fail with the named guard, not a
    // negative-size ByteBuffer.allocate
    val w = 1000; val h = 1000
    val one = new Array[Byte](w * h * 3)
    val err = intercept[IllegalArgumentException] {
      MediaCodecs.encodeAvi(w, h, 1, Seq.fill(800)(one))
    }
    assert(err.getMessage.contains("too large"), err.getMessage)
  }

  test("AVI frame hashes == BMP aHash of the same pixels (shared " +
      "integer core through two different real containers)") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(50)
    val fh = Multimodal.frameHashTable(Multimodal.encodeAviTable(docs))
      .toDF().collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // frame 0 of each video slices the SAME cyclic stream prefix the
    // BMP table plants, so its hash must equal the xm5 image hash
    val bmp = Multimodal.aHashTable(Multimodal.encodeBmpTable(docs))
      .toDF().collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(bmp.nonEmpty && fh.nonEmpty)
    bmp.foreach { case (id, hash) =>
      assert(fh((id, 0)) == hash,
        s"video $id frame 0 hash != BMP hash of the same planted pixels")
    }
  }

  test("video near-dup banding == brute force over all frame pairs") {
    import spark.implicits._
    val fh = Multimodal.frameHashTable(Multimodal.encodeAviTable(
      T.t(spark, sf0001, "documents"))).toDF().localCheckpoint(true)
    val blocked = Multimodal.videoNearDups(fh, maxHamming = 3)
      .select("ida", "idb", "n_frame_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = fh.collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(3)))
    val brute = (for {
      a <- hs; b <- hs
      if a._1 < b._1 &&
        java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) <= 3
    } yield (a._1, b._1)).groupBy(identity).view
      .mapValues(_.length.toLong)
      .map { case ((a, b), n) => (a, b, n) }.toSet
    assert(blocked == brute)
  }

  // ------------------------------------------------------------- JPEG

  import graft.multimodal.JpegCodec

  test("JPEG block-solid round-trip is BIT-EXACT for every even gray " +
      "level (the xm12 oracle contract)") {
    // solid 8x8 at even g: F(0,0) = 8(g-128), quantized DC = (g-128)/2
    // exactly (q00 = 16, no rounding tie at even g), AC = 0; DC-only
    // IDCT reconstructs g bit-for-bit
    for (g <- 0 until 256 by 2) {
      val px = Array.fill[Byte](8 * 8 * 3)(g.toByte)
      val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(8, 8, px))
      assert(dec.width == 8 && dec.height == 8 && dec.nComp == 3)
      assert(java.util.Arrays.equals(dec.pixels, px),
        s"level $g not exact: got ${dec.pixels(0) & 0xFF}")
    }
  }

  test("JPEG block-solid lattice round-trip exercises the DC " +
      "prediction chain across blocks, bit-exact") {
    // 24x16 = 3x2 blocks with distinct even levels — DC diffs of both
    // signs and several Huffman magnitude categories
    val w = 24; val h = 16
    val px = new Array[Byte](w * h * 3)
    for (p <- 0 until px.length) {
      val pi = p / 3
      val bi = (pi / w / 8) * (w / 8) + (pi % w) / 8
      px(p) = (2 * ((bi * 89 + 7) % 128)).toByte
    }
    val enc = JpegCodec.encodeJpeg(w, h, px, "lattice")
    val dec = JpegCodec.decodeJpeg(enc)
    assert(dec.width == w && dec.height == h && dec.comment == "lattice")
    assert(java.util.Arrays.equals(dec.pixels, px))
  }

  test("JDK ImageIO decodes our encoder's output (independent decoder " +
      "agrees within the stated lossy tolerance)") {
    // smooth gradient (lossy-friendly content): our 4:4:4 Annex-K-q50
    // encode decoded by the JDK must land near the source — IDCT /
    // rounding differences are per-pixel small on smooth content
    val w = 37; val h = 21 // non-multiples of 8: edge-replicated blocks
    val bgr = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      bgr(base) = (40 + 4 * x).toByte            // B
      bgr(base + 1) = (200 - 3 * y).toByte       // G
      bgr(base + 2) = (30 + 2 * x + 3 * y).toByte // R
    }
    val enc = JpegCodec.encodeJpeg(w, h, bgr, "interop")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(enc))
    assert(img != null, "ImageIO could not parse our JPEG")
    assert(img.getWidth == w && img.getHeight == h)
    var maxErr = 0
    var sumErr = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      val eb = math.abs((rgb & 0xFF) - (bgr(base) & 0xFF))
      val eg = math.abs(((rgb >> 8) & 0xFF) - (bgr(base + 1) & 0xFF))
      val er = math.abs(((rgb >> 16) & 0xFF) - (bgr(base + 2) & 0xFF))
      maxErr = math.max(maxErr, math.max(eb, math.max(eg, er)))
      sumErr += eb + eg + er
    }
    val meanErr = sumErr.toDouble / (w * h * 3)
    assert(maxErr <= 16, s"max per-channel error $maxErr > 16")
    assert(meanErr <= 3.0, s"mean error $meanErr > 3.0")
  }

  test("our decoder handles JDK ImageIO's encoder output (independent " +
      "encoder, incl. its default chroma subsampling)") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 30 + 2 * x + 3 * y
      val g = 200 - 3 * y
      val b = 40 + 4 * x
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val dec = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(dec.width == w && dec.height == h && dec.nComp == 3)
    var maxErr = 0
    var sumErr = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      val eb = math.abs((rgb & 0xFF) - (dec.pixels(base) & 0xFF))
      val eg = math.abs(((rgb >> 8) & 0xFF) - (dec.pixels(base + 1) & 0xFF))
      val er = math.abs(((rgb >> 16) & 0xFF) - (dec.pixels(base + 2) & 0xFF))
      maxErr = math.max(maxErr, math.max(eb, math.max(eg, er)))
      sumErr += eb + eg + er
    }
    val meanErr = sumErr.toDouble / (w * h * 3)
    // JDK default quality 0.75 with (typically) 4:2:0 subsampling and
    // its own IDCT — replication upsampling vs its encoder still lands
    // close on smooth content; chroma edges bound the max
    assert(maxErr <= 24, s"max per-channel error $maxErr > 24")
    assert(meanErr <= 4.0, s"mean error $meanErr > 4.0")
  }

  test("our decoder decodes a JDK-encoded SOLID image near-exactly " +
      "(subsampling harmless on constant chroma)") {
    val w = 16; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (120 << 16) | (120 << 8) | 120)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val dec = JpegCodec.decodeJpeg(bos.toByteArray)
    for (p <- 0 until dec.pixels.length)
      assert(math.abs((dec.pixels(p) & 0xFF) - 120) <= 2,
        s"solid decode off by >2 at $p: ${dec.pixels(p) & 0xFF}")
  }

  test("JPEG xm12 pipeline: decoded metadata equals planted formulas") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(50)
    val rows = Multimodal.decodeJpegMeta(
      Multimodal.encodeJpegTable(docs)).collect()
    assert(rows.length == 50)
    rows.foreach { m =>
      val id = m.media_id
      assert(m.width == 8 * (1 + id % 3) && m.height == 8 * (1 + id % 2))
      assert(m.ncomp == 3 && m.comment == s"graft:$id")
      assert(m.npx == m.width * m.height * 3)
      // replay the planted block lattice
      var expected = 0L
      var p = 0
      while (p < m.npx) {
        val pi = p / 3
        val bi = (pi / m.width / 8) * (m.width / 8) + (pi % m.width) / 8
        expected += (2 * ((id * 7 + bi * 13) % 128)) * (p % 97 + 1)
        p += 1
      }
      assert(m.pxsum == expected, s"pxsum mismatch for media $id")
    }
  }

  test("JPEG aHash == BMP aHash of the same planted pixels (the " +
      "cross-container contract extends to the lossy codec)") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(60)
    // the BMP side must carry the SAME pixels the JPEG table plants
    // (block-solid lattice), not the generic cyclic-text fill
    val bmp = docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 * (1 + id % 3)).toInt
          val h = (8 * (1 + id % 2)).toInt
          val px = new Array[Byte](w * h * 3)
          for (p <- 0 until px.length) {
            val pi = p / 3
            val bi = (pi / w / 8) * (w / 8) + (pi % w) / 8
            px(p) = (2 * ((id * 7 + bi * 13) % 128)).toByte
          }
          Multimodal.MediaBlob(id, MediaCodecs.encodeBmp(w, h, px))
        }
      }
    val jh = Multimodal.jpegAHashTable(Multimodal.encodeJpegTable(docs))
      .toDF().select($"media_id", $"ahash_hi", $"ahash_lo")
    val bh = Multimodal.aHashTable(bmp)
      .toDF().select($"media_id", $"ahash_hi".as("bhi"),
        $"ahash_lo".as("blo"))
    val joined = jh.join(bh, "media_id").collect()
    assert(joined.length == 60)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4),
        s"hash mismatch for media ${r.getLong(0)}")
    }
  }

  test("JPEG decode fails loudly on progressive, truncation, and " +
      "non-JPEG bytes") {
    val px = Array.fill[Byte](8 * 8 * 3)(100.toByte)
    val enc = JpegCodec.encodeJpeg(8, 8, px)
    // progressive: flip SOF0 (FFC0) to SOF2 (FFC2)
    val prog = enc.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException](JpegCodec.decodeJpeg(prog))
    assert(e1.getMessage.contains("progressive"))
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(enc, enc.length / 3)))
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg("definitely not a jpeg".getBytes))
  }

  // ------------------------------------------------------------- GIF

  import graft.multimodal.GifCodec

  private val grayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte
      i += 1
    }
    p
  }

  test("GIF LZW round-trip is bit-exact: random, repetitive (KwKwK), " +
      "edge-shaped, and dictionary-overflowing streams") {
    val rnd = new scala.util.Random(13)
    for ((w, h) <- Seq((5, 4), (1, 9), (9, 1), (24, 16))) {
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      val dec = GifCodec.decodeGif(
        GifCodec.encodeGif(w, h, idx, grayPalette, "c"))
      assert(dec.width == w && dec.height == h && dec.comment == "c")
      val expected = idx.flatMap(b => Array(b, b, b))
      assert(java.util.Arrays.equals(dec.pixels, expected),
        s"${w}x$h random mismatch")
    }
    // all-same-value stream: the encoder emits code == next-to-define
    // immediately — the decoder's KwKwK branch must reconstruct it
    val flat = Array.fill[Byte](10 * 10)(42.toByte)
    val decFlat = GifCodec.decodeGif(
      GifCodec.encodeGif(10, 10, flat, grayPalette))
    assert(decFlat.pixels.forall(_ == 42.toByte) &&
      decFlat.pixels.length == 300)
    // 128x128 random fills the 12-bit dictionary past 4096 entries →
    // mid-stream clear-code reset on the encoder side, matching reset
    // on the decoder side
    val big = Array.fill[Byte](128 * 128)(rnd.nextInt(256).toByte)
    val decBig = GifCodec.decodeGif(
      GifCodec.encodeGif(128, 128, big, grayPalette))
    assert(java.util.Arrays.equals(decBig.pixels,
      big.flatMap(b => Array(b, b, b))), "dictionary-reset mismatch")
    // single pixel: clear, one literal, EOI
    val one = GifCodec.decodeGif(
      GifCodec.encodeGif(1, 1, Array(7.toByte), grayPalette))
    assert(one.pixels.toSeq == Seq[Byte](7, 7, 7))
  }

  test("JDK ImageIO decodes our GIF encoder's output (independent " +
      "decoder agrees, lossless)") {
    val rnd = new scala.util.Random(17)
    val w = 21; val h = 9
    val idx = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val enc = GifCodec.encodeGif(w, h, idx, grayPalette, "graft:io")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(enc))
    assert(img != null, "ImageIO could not parse our GIF")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val g = idx(y * w + x) & 0xFF
      val expect = 0xFF000000 | (g << 16) | (g << 8) | g
      assert(img.getRGB(x, y) == expect,
        f"ImageIO pixel ($x,$y): got 0x${img.getRGB(x, y)}%08X " +
          f"want 0x$expect%08X")
    }
  }

  test("our GIF decoder handles JDK ImageIO's encoder output " +
      "(independent encoder, incl. its own LZW and palette layout)") {
    val w = 18; val h = 13
    val rnd = new scala.util.Random(19)
    // indexed image over an explicit 256-gray palette → the JDK GIF
    // writer emits it losslessly
    val grays = Array.tabulate[Byte](256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val idx = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val g = rnd.nextInt(256)
      idx(y * w + x) = g.toByte
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val dec = GifCodec.decodeGif(bos.toByteArray)
    assert(dec.width == w && dec.height == h)
    assert(java.util.Arrays.equals(dec.pixels,
      idx.flatMap(b => Array(b, b, b))),
      "ImageIO-encoded GIF decoded to different pixels")
  }

  test("GIF aHash == BMP aHash of the same pixels (cross-container " +
      "equality through the shared integer core)") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(60)
    val gif = Multimodal.decodeGifFull(Multimodal.encodeGifTable(docs))
      .toDF().select($"media_id", $"ahash_hi", $"ahash_lo")
    // same planted per-pixel grays expanded to 3 channel bytes,
    // packaged as a BMP instead
    val bmp = {
      val blobs = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val w = (8 + id % 24).toInt
            val h = (8 + (id * 3) % 16).toInt
            val idx = Multimodal.cyclicBytes(
              Option(text).getOrElse("").getBytes("UTF-8"), w * h)
            Multimodal.MediaBlob(id,
              MediaCodecs.encodeBmp(w, h, idx.flatMap(b => Array(b, b, b))))
          }
        }
      Multimodal.aHashTable(blobs).toDF()
        .select($"media_id", $"ahash_hi".as("bhi"), $"ahash_lo".as("blo"))
    }
    val joined = gif.join(bmp, "media_id").collect()
    assert(joined.length == 60)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4),
        s"hash mismatch for media ${r.getLong(0)}")
    }
  }

  test("animated GIF round-trip: frame count, GCE delays, comment, " +
      "per-frame composited pixels all recovered; single-frame " +
      "decodeGif still reads the first frame through the anim blocks") {
    val rnd = new scala.util.Random(23)
    val w = 11; val h = 7
    val frames = (0 until 4).map(_ =>
      Array.fill[Byte](w * h)(rnd.nextInt(256).toByte))
    val delays = Seq(4, 9, 2, 7)
    val enc = GifCodec.encodeAnimGif(w, h, frames, delays, grayPalette,
      "graft:anim")
    val anim = GifCodec.decodeAnimGif(enc)
    assert(anim.width == w && anim.height == h)
    assert(anim.comment == "graft:anim")
    assert(anim.frames.length == 4)
    assert(anim.frames.map(_.delayCs) == delays.toVector)
    for ((f, i) <- anim.frames.zipWithIndex) {
      val expected = frames(i).flatMap(b => Array(b, b, b))
      assert(java.util.Arrays.equals(f.pixels, expected),
        s"frame $i composited pixels mismatch")
    }
    // the single-frame decoder must walk past NETSCAPE + GCE blocks
    val first = GifCodec.decodeGif(enc)
    assert(java.util.Arrays.equals(first.pixels,
      frames(0).flatMap(b => Array(b, b, b))))
  }

  test("animated GIF compositing: sub-rect frames, transparency, " +
      "disposal restore-to-background and restore-previous") {
    import graft.multimodal.GifCodec.AnimFrame
    val w = 6; val h = 4
    val base = Array.fill[Byte](w * h)(10.toByte)
    // frame 2: 2x2 patch at (1,1), value 200, one transparent texel
    // (index 10 declared transparent so base shows through at (2,2)),
    // disposal 3 = restore the pre-frame canvas for frame 3's backdrop
    val patch = Array[Byte](200.toByte, 200.toByte, 200.toByte, 10.toByte)
    // frame 3: 1x1 patch at (0,0) value 99, disposal 2 over base
    val dot = Array[Byte](99.toByte)
    val enc = GifCodec.encodeAnimFrames(w, h, Seq(
      AnimFrame(0, 0, w, h, base, 5, disposal = 1, transparentIdx = -1),
      AnimFrame(1, 1, 2, 2, patch, 6, disposal = 3, transparentIdx = 10),
      AnimFrame(0, 0, 1, 1, dot, 7, disposal = 2, transparentIdx = -1)
    ), grayPalette, "")
    val anim = GifCodec.decodeAnimGif(enc)
    assert(anim.frames.length == 3)
    def px(canvas: Array[Byte], x: Int, y: Int): Int =
      canvas((y * w + x) * 3) & 0xFF
    val f1 = anim.frames(1).pixels
    assert(px(f1, 1, 1) == 200 && px(f1, 2, 1) == 200 &&
      px(f1, 1, 2) == 200, "opaque patch texels must draw")
    assert(px(f1, 2, 2) == 10,
      "transparent texel must leave the base canvas visible")
    assert(px(f1, 0, 0) == 10 && px(f1, 5, 3) == 10,
      "outside the rect the base canvas persists")
    // frame 2 drew over the RESTORED base (disposal 3 undid frame 1's
    // patch), so everything except (0,0) is base again
    val f2 = anim.frames(2).pixels
    assert(px(f2, 0, 0) == 99)
    assert(px(f2, 1, 1) == 10 && px(f2, 2, 2) == 10,
      "disposal 3 must restore the pre-frame canvas")
    assert(anim.frames.map(_.delayCs) == Vector(5, 6, 7))
  }

  test("JDK ImageIO agrees on our animated GIF: frame count, " +
      "per-frame pixels, and GCE delay metadata") {
    val rnd = new scala.util.Random(29)
    val w = 9; val h = 6
    val frames = (0 until 3).map(_ =>
      Array.fill[Byte](w * h)(rnd.nextInt(256).toByte))
    val delays = Seq(4, 8, 5)
    val enc = GifCodec.encodeAnimGif(w, h, frames, delays, grayPalette)
    val rit = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    assert(rit.hasNext, "JDK GIF reader missing")
    val reader = rit.next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(enc)))
    assert(reader.getNumImages(true) == 3)
    for (i <- 0 until 3) {
      val img = reader.read(i)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val g = frames(i)(y * w + x) & 0xFF
        val expect = 0xFF000000 | (g << 16) | (g << 8) | g
        assert(img.getRGB(x, y) == expect,
          f"ImageIO frame $i pixel ($x,$y)")
      }
      // GCE delay through the JDK's native metadata tree
      val md = reader.getImageMetadata(i)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val gces = tree.getElementsByTagName("GraphicControlExtension")
      assert(gces.getLength == 1, s"frame $i lacks a GCE")
      val dt = gces.item(0).asInstanceOf[org.w3c.dom.Element]
        .getAttribute("delayTime").toInt
      assert(dt == delays(i), s"frame $i delay: got $dt")
    }
    reader.dispose()
  }

  test("GIF xm14 pipeline: decoded metadata equals planted formulas") {
    import spark.implicits._
    val docs = T.t(spark, sf0001, "documents").limit(40)
    val rows = Multimodal.decodeGifFull(Multimodal.encodeGifTable(docs))
      .collect().map(m => m.media_id -> m).toMap
    val planted = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    assert(rows.size == planted.length)
    planted.foreach { case (id, text) =>
      val m = rows(id)
      val w = (8 + id % 24).toInt
      val h = (8 + (id * 3) % 16).toInt
      val idx = Multimodal.cyclicBytes(
        Option(text).getOrElse("").getBytes("UTF-8"), w * h)
      var pxsum = 0L
      var p = 0
      while (p < w * h * 3) {
        pxsum += (idx(p / 3) & 0xFF).toLong * (p % 97 + 1)
        p += 1
      }
      assert(m.width == w && m.height == h && m.comment == s"graft:$id" &&
        m.npx == w * h * 3 && m.pxsum == pxsum,
        s"planted mismatch for media $id")
    }
  }

  test("GIF deinterlace follows the spec's four-pass row schedule") {
    // 1-px-wide, 10 rows: interlaced stream order is rows
    // 0,8 | 4 | 2,6 | 1,3,5,7,9 — deinterlace must invert it
    val w = 1; val h = 10
    val passOrder = Array(0, 8, 4, 2, 6, 1, 3, 5, 7, 9)
    val raw = passOrder.map(_.toByte)
    val out = GifCodec.deinterlace(raw, w, h)
    assert(out.toSeq == (0 until 10).map(_.toByte),
      out.toSeq.toString)
  }

  test("GIF decode fails loudly on bad signature and truncation") {
    val idx = Array.tabulate[Byte](6 * 4)(_.toByte)
    val good = GifCodec.encodeGif(6, 4, idx, grayPalette)
    intercept[IllegalArgumentException](
      GifCodec.decodeGif("definitely not a gif".getBytes))
    intercept[IllegalArgumentException](
      GifCodec.decodeGif(java.util.Arrays.copyOf(good, good.length / 2)))
  }

  test("audio quality: DC-stuck clip is all-flat with zero crossings; " +
      "oscillating clip is loud with max crossings (xm16)") {
    import spark.implicits._
    // clip 1: constant non-zero level — a raw-energy gate would call
    // it loud, the delta gate calls every window flat, zc = 0
    val stuck = Array.fill[Short](100)(5000)
    // clip 2: ±8000 alternation — deltas alternate ±16000, so every
    // consecutive delta pair crosses zero and no window is flat
    val osc = Array.tabulate[Short](100)(i =>
      if (i % 2 == 0) 8000 else -8000)
    val media = Seq(
      Multimodal.MediaBlob(1L, MediaCodecs.encodeWav(8000, 1, stuck)),
      Multimodal.MediaBlob(2L, MediaCodecs.encodeWav(8000, 1, osc)))
      .toDS()
    val got = Multimodal.audioQualityTable(media)
      .collect().map(q => q.media_id -> q).toMap
    val s = got(1L)
    // 99 deltas → 4 windows (25+25+25+24), all flat, zc 0, e_max 0
    assert((s.n_frames, s.n_win, s.zc, s.flat_win, s.e_max) ==
      ((100, 4, 0L, 4, 0L)), s"stuck: $s")
    val o = got(2L)
    // 99 deltas of ±16000: zc = 98 consecutive sign flips, no window
    // flat, every window energy = 16000² · count
    assert((o.n_frames, o.n_win, o.zc, o.flat_win) ==
      ((100, 4, 98L, 0)), s"osc: $o")
    assert(o.e_max == 16000L * 16000L * 25, s"osc energy: ${o.e_max}")
  }
}

package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable summary sketches (SURVEY §2.11 scale layer): a Bloom
  * filter built BY AGGREGATION (each map partition fills a local
  * bitset, partials OR together — the set being summarized never
  * shuffles raw), and a Misra-Gries frequent-items summary (the
  * mergeable-summaries construction of Agarwal et al., PODS'12).
  *
  * Both exist for the same 100 TB reason: they turn an
  * un-broadcastable SET into a broadcastable SUMMARY, so the corpus
  * side of a membership/frequency question stays a narrow map. Both
  * are used as PREFILTERS ONLY — every declared query that rides them
  * re-verifies survivors exactly, so sketch error can add work but
  * never change an answer (same contract as the LSH band families in
  * [[Dedup]]).
  */
object BloomHash {
  /** FNV-1a 64 over UTF-8 bytes + the murmur3 finalizer — seeded,
    * deterministic, dependency-free. Two seeds drive the standard
    * double-hashing scheme h1 + i·h2 (Kirsch–Mitzenmacher), so k
    * probe positions cost two hashes, not k.
    */
  def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
    h
  }

  val Seed1 = 0x9e3779b97f4a7c15L
  val Seed2 = 0xc2b2ae3d27d4eb4fL

  /** Probe positions for one item: i-th bit index in [0, numBits). */
  def bit(h1: Long, h2: Long, i: Int, numBits: Int): Int =
    java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
}

/** Bloom-filter build as a TypedImperativeAggregate over a string
  * column. Buffer = Array[Long] bitset; update sets k bits per item,
  * merge is bitwise OR (insertion is idempotent and commutative, so
  * the result is partitioning-invariant BIT FOR BIT — asserted in
  * OperatorsSpec). Emits the bitset little-endian as BinaryType, so
  * bit b of the filter is bit (b & 7) of byte (b >>> 3) — the layout
  * [[BloomMightContain]] reads without knowing numBits (inferred from
  * the byte length; hence the %64 requirement).
  */
case class BloomBuildAgg(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    "bloom_build: numBits must be a positive multiple of 64")
  require(numHashes > 0, "bloom_build: numHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[UTF8String].getBytes
      val h1 = BloomHash.hash64(b, BloomHash.Seed1)
      val h2 = BloomHash.hash64(b, BloomHash.Seed2) | 1L
      var i = 0
      while (i < numHashes) {
        val bit = BloomHash.bit(h1, h2, i, numBits)
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length >>> 3)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomBuildAgg = copy(child = c(0))
}

/** Membership probe against a [[BloomBuildAgg]] bitset. numBits is
  * inferred from the binary length (the builder pins %64 == 0), so a
  * build/probe size mismatch is impossible by construction. No false
  * negatives ever; false positives at the standard (1-e^{-kn/m})^k
  * rate — callers must re-verify positives exactly.
  */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int)
  extends BinaryExpression with graft.functions.FusedBinary {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckSuccess
    else TypeCheckFailure(s"bloom_might_contain expects (binary, " +
      s"string), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bloom: Any, item: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    val numBits = bytes.length << 3
    val b = item.asInstanceOf[UTF8String].getBytes
    val h1 = BloomHash.hash64(b, BloomHash.Seed1)
    val h2 = BloomHash.hash64(b, BloomHash.Seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = BloomHash.bit(h1, h2, i, numBits)
      if ((bytes(bit >>> 3) >>> (bit & 7) & 1) == 0) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}

/** Misra-Gries frequent-items summary as a TypedImperativeAggregate.
  *
  * Per-partition update is classic MG(capacity): increment a tracked
  * key, insert while there's room, otherwise decrement every counter
  * (dropping zeros) — amortized O(1) per item, ≤ capacity tracked
  * keys. Merge is the MERGEABLE construction (Agarwal et al. 2012,
  * thm 1): sum counters pointwise, then subtract the (capacity+1)-th
  * largest counter from all and drop non-positives. The combined
  * summary undercounts any item by at most N/(capacity+1) TOTAL —
  * independent of partitioning or merge tree shape — so every item
  * with true count > N/(capacity+1) still has a positive counter and
  * appears in the output. That superset guarantee (proven across
  * partitionings in OperatorsSpec on a Zipf stream whose vocabulary
  * dwarfs the capacity) is what [[Sketches.heavyHitters]]' exact
  * second pass relies on.
  *
  * Output: the candidate keys only, sorted (counters are
  * lower-bound approximations — deliberately not exposed, the exact
  * pass recounts).
  */
object MisraGries {
  /** The mergeable-summaries combine (Agarwal et al. 2012): pointwise
    * sum into `a`, then subtract the (capacity+1)-th largest counter
    * and drop non-positives — ≤ capacity keys survive, combined
    * undercount ≤ N/(capacity+1) on ANY merge tree. Exposed so a
    * STREAM can fold per-batch summaries on the driver (each summary
    * is ≤ capacity entries — bounded state) with the identical
    * guarantee the in-plan merge has.
    */
  def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long],
      capacity: Int): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      val vals = new Array[Long](a.size)
      val vi = a.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val pivot = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val ai = a.entrySet().iterator()
      while (ai.hasNext) {
        val e = ai.next()
        if (e.getValue <= pivot) ai.remove()
        else e.setValue(e.getValue - pivot)
      }
    }
    a
  }

  /** Shared (de)serialization for the MG aggregate buffers. */
  def toBytes(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }
}

case class MisraGriesAgg(
    child: Expression, capacity: Int, withCounters: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, "misra_gries: capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def dataType: DataType =
    if (withCounters)
      ArrayType(new StructType().add("g", StringType)
        .add("c", LongType), containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < capacity) buf.put(s, 1L)
      else { // decrement-all round: pays for itself over capacity inserts
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] =
    MisraGries.merge(a, b, capacity)

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    if (withCounters)
      new GenericArrayData(keys.map { k =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(k), buf.get(k): Long))
          .asInstanceOf[AnyRef]
      })
    else
      new GenericArrayData(
        keys.map(UTF8String.fromString(_).asInstanceOf[AnyRef]))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] =
    MisraGries.toBytes(buf)
  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Long] = MisraGries.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c(0))
}

/** Second-level Misra-Gries fold: merges PRE-BUILT summaries (the
  * array<struct<g,c>> output of [[MisraGriesAgg]] withCounters) into
  * one combined summary via the identical mergeable construction —
  * the same math the in-plan partial/final merge and the (former)
  * QS14 driver fold apply, but expressed as an aggregate so a
  * chunk-grouped plan can fold its per-chunk summaries WITHOUT
  * leaving the engine: per-chunk MG aggregation and the cross-chunk
  * fold become one job instead of one job per chunk plus driver
  * state. The combined undercount bound (≤ N/(capacity+1) on any
  * merge tree) is Agarwal et al. 2012 thm 1 — summary-of-summaries
  * is exactly the construction the theorem covers.
  *
  * Output: the sorted candidate keys ([[MisraGriesAgg]]'s
  * counter-less shape — consumers recount exactly).
  */
case class MisraGriesMergeAgg(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, "misra_gries_merge: capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_merge"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == StringType && s(1).dataType == LongType =>
        TypeCheckSuccess
      case other => TypeCheckFailure(
        s"misra_gries_merge expects array<struct<g string, c bigint>> " +
          s"(the misra_gries withCounters output), got $other")
    }
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val incoming = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        incoming.put(row.getUTF8String(0).toString, row.getLong(1))
        i += 1
      }
      MisraGries.merge(buf, incoming, capacity)
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] =
    MisraGries.merge(a, b, capacity)

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(
      keys.map(UTF8String.fromString(_).asInstanceOf[AnyRef]))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] =
    MisraGries.toBytes(buf)
  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Long] = MisraGries.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesMergeAgg = copy(child = c(0))
}

object Sketches {
  private def e(c: Column): Expression = Bridge.expression(c)

  /** Aggregate column: Bloom bitset (BinaryType) over a string column. */
  def bloomAgg(c: Column, numBits: Int = 1 << 23,
      numHashes: Int = 5): Column =
    Bridge.column(BloomBuildAgg(e(c), numBits, numHashes)
      .toAggregateExpression())

  /** Scalar probe against a [[bloomAgg]] bitset column. */
  def bloomMightContain(bloom: Column, item: Column,
      numHashes: Int = 5): Column =
    Bridge.column(BloomMightContain(e(bloom), e(item), numHashes))

  /** Aggregate column: sorted array of ≤ capacity candidate keys
    * containing every key with count > N/(capacity+1).
    */
  def misraGries(c: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(e(c), capacity).toAggregateExpression())

  /** [[misraGries]] with the (lower-bound) counters attached —
    * array<struct<g,c>> — for consumers that keep folding summaries
    * OUTSIDE the plan (the QS14 stream). The counters undercount by
    * design; never threshold on them directly.
    */
  def misraGriesCounters(c: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(e(c), capacity, withCounters = true)
      .toAggregateExpression())

  /** Aggregate column folding [[misraGriesCounters]] SUMMARIES into
    * one combined candidate list (sorted keys) — the in-engine
    * summary-of-summaries fold ([[MisraGriesMergeAgg]]).
    */
  def misraGriesMerge(c: Column, capacity: Int): Column =
    Bridge.column(MisraGriesMergeAgg(e(c), capacity)
      .toAggregateExpression())

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Exact heavy hitters over an exploded string domain (tokens,
    * n-grams, domains, …): every item whose count × `denom` ≥ N,
    * with its EXACT count — φ = 1/denom of the stream.
    *
    * Two passes, both scan+narrow over the corpus: pass 1 aggregates
    * one MG summary (plus N) — the only thing shuffled is ≤ capacity
    * counters per partition, never the item domain (a naive
    * groupBy-count shuffles the full vocabulary, which for n-grams
    * at 100 TB is the corpus again). Pass 2 broadcast-semi-joins the
    * ≤ capacity candidates and recounts ONLY them exactly. The MG
    * superset guarantee (count > N/(capacity+1) ⇒ candidate) plus
    * `capacity + 1 > denom` makes the thresholded result EXACT and
    * partitioning-invariant: extra candidates fail the exact
    * threshold; heavy items can't be missed.
    */
  def heavyHitters(items: DataFrame, itemCol: String, denom: Long,
      capacity: Int): DataFrame = {
    require(capacity + 1 > denom,
      s"heavyHitters: capacity $capacity too small for phi=1/$denom " +
        "(need capacity+1 > denom for the MG no-miss guarantee)")
    val pass1 = items.agg(
      misraGries(col(itemCol), capacity).as("cands"),
      count(lit(1)).as("total"))
    val cand = pass1.select(explode(col("cands")).as(itemCol),
      col("total"))
    items.join(broadcast(cand), itemCol)
      .groupBy(itemCol)
      .agg(count(lit(1)).as("n"), min(col("total")).as("total"))
      .where(col("n") * denom >= col("total"))
      .select(col(itemCol), col("n"))
      .orderBy(desc("n"), col(itemCol))
  }

  /** The exact pass of [[heavyHitters]] against an EXTERNALLY
    * accumulated candidate set + stream total (the QS14 stream folds
    * per-batch MG summaries outside the plan): recount candidates
    * exactly, threshold on the exact counts. Identical output to
    * [[heavyHitters]] whenever `candidates` honors the no-miss
    * guarantee for φ = 1/denom — extras die at the exact threshold,
    * heavy items can't be absent.
    */
  def heavyHittersFromCandidates(items: DataFrame, itemCol: String,
      denom: Long, candidates: Seq[String], total: Long): DataFrame = {
    import items.sparkSession.implicits._
    val cand = candidates.toDF(itemCol)
    items.join(broadcast(cand), itemCol)
      .groupBy(itemCol)
      .agg(count(lit(1)).as("n"))
      .where(col("n") * denom >= lit(total))
      .select(col(itemCol), col("n"))
      .orderBy(desc("n"), col(itemCol))
  }

  /** Deterministic HyperLogLog per-group distinct estimate (Flajolet
    * et al. 2007; the +Bias-free classic estimator with the standard
    * linear-counting small-range branch) — the 100 TB approximate
    * COUNT(DISTINCT) whose whole register arithmetic is
    * SQL-replayable, unlike `approx_count_distinct`'s opaque binary
    * sketch (q10b, rows-only gated). This is the Sketches-family
    * pattern again (MG heavy hitters, GK quantiles): a mergeable
    * bounded summary — m registers per group, max-merged, so the
    * shuffle carries ≤ m rows per (group, partition) however large
    * the group — but here the ESTIMATE itself is the product, so the
    * gate pins the estimator arithmetic instead of an exact recount.
    *
    * Determinism/exactness contract: the "random" hash is the 48-bit
    * md5 prefix (12 hex nibbles, the gear44 idiom) — register index
    * j = top p bits, rho = leading-zero count of the remaining 40
    * bits + 1 derived from LENGTH(BIN(rem)) (exact integer string
    * length, no FP log); registers fold by MAX (associative, any
    * merge tree); the harmonic denominator Σ 2^−M_j scales by 2^41
    * into an EXACT integer sum of powers of two (a raw double sum of
    * 2^−M_j terms spanning 41 binary orders is add-order-dependent —
    * the scaled-integer trick removes it); the estimator is then ONE
    * pinned IEEE sequence (α_m·m²·2^41/S, the LC branch m·ln(m/V)
    * when E ≤ 2.5m ∧ V>0) rounded FLOOR(x+0.5) — both engines
    * replay it bit for bit. 48-bit hashing bounds the no-collision
    * regime to n ≪ 2^24 per register-stream; the standard 2^32-range
    * correction is deliberately out of scope (documented, not
    * silently wrong — at larger n widen the hash).
    *
    * Output: (group, v_zero, s_sum, est) — v_zero/s_sum are the exact
    * register integers (they gate the whole register pipeline), est
    * the rounded estimate.
    */
  def hllDistinct(df: DataFrame, groupCol: String, value: Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"hllDistinct: p=$p out of range")
    hllEstimate(hllRegs(df, groupCol, value, p), p)
  }

  /** The pinned estimator over a MAX-folded register table (g, j, mj):
    * exact-integer v_zero/s_sum, one IEEE sequence with the LC branch,
    * FLOOR(x+0.5). Shared by [[hllDistinct]] and the qs21 stream face.
    *
    * Residual LC hazard (r14 advice, accepted): the linear-counting
    * branch `m·ln(m/V)` uses natural log, which the house exactness
    * discipline documents as NOT correctly rounded cross-engine
    * (unlike SQRT — see the exactness notes on the quantize-once
    * idiom). A 1-ulp LN divergence landing exactly on a floor(x+0.5)
    * tie could flip `est` by 1 between engines on adversarial
    * (g, V) inputs even though every gated fixture is tie-free. The
    * exact-integer columns v_zero/s_sum are the primary gate — they
    * pin the entire register pipeline independent of the float tail —
    * and LC inputs are the coarse small-cardinality regime where ±1
    * is far inside the estimator's own error; routing LN through a
    * pre-rounding quantizer would change the published estimator, so
    * the hazard is documented rather than re-shaped.
    */
  private[operators] def hllEstimate(regs: DataFrame, p: Int)
      : DataFrame = {
    val m = 1L << p
    val rhoMax = 48 - p + 1
    // α_m for m ≥ 128 (the published constant); pinned literal order
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val stats = regs.groupBy("g").agg(
      count(lit(1)).as("np"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
        s"CAST($rhoMax - mj AS INT))")).as("sp"))
      .select(col("g"), (lit(m) - col("np")).as("v_zero"),
        (col("sp") + (lit(m) - col("np")) * lit(1L << rhoMax))
          .as("s_sum"))
    val eRaw = (alpha * lit((m * m).toDouble)
      * lit(math.pow(2.0, rhoMax))) / col("s_sum").cast(DoubleType)
    stats.select(col("g"), col("v_zero"), col("s_sum"),
      floor(when(eRaw <= lit(2.5 * m) && col("v_zero") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble)
            / col("v_zero").cast(DoubleType)))
        .otherwise(eRaw) + lit(0.5)).cast(LongType).as("est"))
  }

  /** MAX-folded register table (g, j, mj) of one input slice — the
    * mergeable-summary state behind [[hllDistinct]] (associative AND
    * commutative, any merge tree in any order).
    */
  private[operators] def hllRegs(df: DataFrame, groupCol: String,
      value: Column, p: Int): DataFrame = {
    val valueBits = 48 - p
    val rhoMax = valueBits + 1
    val pow2 = 1L << valueBits
    df.select(col(groupCol).as("g"),
        conv(substring(md5(value), 1, 12), 16, 10).cast(LongType)
          .as("h"))
      .select(col("g"),
        expr(s"h DIV $pow2").as("j"),
        (col("h") % lit(pow2)).as("rem"))
      .select(col("g"), col("j"),
        when(col("rem") === 0L, lit(rhoMax))
          .otherwise(lit(rhoMax) - length(bin(col("rem")))).as("rho"))
      .groupBy("g", "j").agg(max(col("rho")).as("mj"))
  }

  /** Evolving HLL register store for STREAMING distinct estimation
    * (qs21): the xk16 registers as the entire state — ≤ groups·m rows
    * forever, however long the stream runs (exact streaming distinct
    * carries the whole value set; the sketch is why this op exists).
    * Register MAX-merge is associative AND commutative, so — stronger
    * than the qs19/qs20 monotone-arrival contracts — ANY chunking in
    * ANY ORDER folds to the one-shot sketch, spec-gated including a
    * reversed-order replay.
    */
  final case class RegStore private[operators] (regs: DataFrame)

  def prepareRegStore(corpus: DataFrame, groupCol: String,
      value: Column, p: Int = 8): RegStore =
    RegStore(hllRegs(corpus, groupCol, value, p).localCheckpoint(true))

  /** Fold one batch into the store; the current per-group estimates
    * at any point are [[hllEstimates]] of the advanced store.
    */
  def hllIngest(batch: DataFrame, store: RegStore, groupCol: String,
      value: Column, p: Int = 8): RegStore =
    RegStore(store.regs
      .unionByName(hllRegs(batch, groupCol, value, p))
      .groupBy("g", "j").agg(max(col("mj")).as("mj"))
      .localCheckpoint(true))

  def hllEstimates(store: RegStore, p: Int = 8): DataFrame =
    hllEstimate(store.regs, p)
}

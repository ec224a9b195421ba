package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile summary with EXPLICIT rank bounds — the xk12
  * (Misra-Gries + exact recount) pattern applied to quantiles, giving
  * grouped percentiles (q32/q40) a 100 TB path that never full-sorts
  * the corpus.
  *
  * Construction (GK-style bound bookkeeping; cf. Greenwald & Khanna
  * SIGMOD'01 and the mergeable-summaries treatment of Agarwal et al.
  * PODS'12): a summary is a value-sorted list of marks `(v, rmin,
  * rmax)` plus the exact element count `n`, maintaining two
  * invariants against the summarized multiset
  *
  *   I1:  count(<= v) >= rmin        (some occurrence of v has rank
  *   I2:  count(<  v) +  1 <= rmax    in [count(<v)+1, count(<=v)],
  *                                    and [rmin, rmax] intersects it)
  *
  * Batches enter exact (sorted batch, k-th element gets rmin = rmax =
  * k); MERGE combines two summaries by interval arithmetic — for a
  * mark x from A, `rmin' = rminA(x) + rminB(pred)` and `rmax' =
  * rmaxA(x) + rmaxB(succ) - 1` (nB when no successor) — which
  * preserves I1/I2 on ANY merge tree (the three-line proofs are in
  * `mergeMarks`); PRUNE only drops marks, which trivially preserves
  * them. Both are deterministic; no sampling.
  *
  * The point of the invariants: exactness never rests on an ε
  * analysis. For a target order statistic r, `bracket` returns
  * `a` = the largest mark with rmax <= r (by I2 the r-th smallest is
  * >= a) and `b` = the smallest mark with rmin >= r (by I1 the r-th
  * smallest is <= b) — a GUARANTEED enclosure. The exact pass then
  * recounts below `a` and rank-orders only the in-bracket candidates,
  * so the output is the exact quantile — bit-equal to a full
  * shuffle-sort and to DuckDB's QUANTILE_CONT — while the only sorted
  * volume is the candidate slice (~4n/s per bracket at summary size
  * s, measured in the spec). Sketch degradation can widen brackets
  * (more candidates, more work) but can never change an answer — the
  * same contract as the LSH band families and the Bloom prefilter.
  */
object QuantileSketch {

  final case class Mark(v: Double, rmin: Long, rmax: Long)

  /** Immutable driver-side summary (the eval output / stream state). */
  final case class Summary(n: Long, marks: Array[Mark]) {
    def merge(other: Summary, s: Int): Summary =
      Summary(n + other.n,
        prune(mergeMarks(marks, n, other.marks, other.n), n + other.n, s))

    /** Guaranteed enclosure of the r-th order statistic (1-based):
      * (None = unbounded side — only possible when pruning dropped
      * every qualifying mark, which keeping the endpoints prevents
      * for interior ranks).
      */
    def bracket(r: Long): (Option[Double], Option[Double]) = {
      var a: Option[Double] = None
      var b: Option[Double] = None
      var i = 0
      while (i < marks.length && marks(i).rmax <= r) {
        a = Some(marks(i).v); i += 1
      }
      i = marks.length - 1
      while (i >= 0 && marks(i).rmin >= r) {
        b = Some(marks(i).v); i -= 1
      }
      (a, b)
    }
  }

  /** Merge two mark lists with conservative interval arithmetic.
    *
    * For x from A (symmetrically for B):
    *  - rmin' = rminA(x) + rminB(pred), pred = largest B-mark <= x.v.
    *    Valid for I1: countB(<=x.v) >= countB(<=pred.v) >= rminB(pred)
    *    and countA(<=x.v) >= rminA(x), so the merged count(<=x.v)
    *    covers the sum.
    *  - rmax' = rmaxA(x) + rmaxB(succ) - 1, succ = smallest B-mark
    *    >= x.v (or + nB when none). Valid for I2: countB(<x.v) <=
    *    countB(<succ.v) <= rmaxB(succ) - 1 by I2 on succ, and
    *    countA(<x.v) + 1 <= rmaxA(x), so merged count(<x.v) + 1 <=
    *    rmaxA(x) + rmaxB(succ) - 1.
    */
  private[operators] def mergeMarks(a: Array[Mark], nA: Long,
      b: Array[Mark], nB: Long): Array[Mark] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new ArrayBuffer[Mark](a.length + b.length)
    def emit(x: Mark, other: Array[Mark], nOther: Long): Unit = {
      // pred: largest other-mark with v <= x.v; succ: smallest >= x.v
      var lo = 0; var hi = other.length
      while (lo < hi) { // lower_bound of x.v
        val mid = (lo + hi) >>> 1
        if (other(mid).v < x.v) lo = mid + 1 else hi = mid
      }
      // other(lo) is the first mark >= x.v (if any)
      val predRmin =
        if (lo < other.length && other(lo).v == x.v) other(lo).rmin
        else if (lo > 0) other(lo - 1).rmin
        else 0L
      val succTerm =
        if (lo < other.length) other(lo).rmax - 1
        else nOther
      out += Mark(x.v, x.rmin + predRmin, x.rmax + succTerm)
    }
    var i = 0; var j = 0
    while (i < a.length || j < b.length) {
      if (j >= b.length || (i < a.length && a(i).v <= b(j).v)) {
        emit(a(i), b, nB); i += 1
      } else {
        emit(b(j), a, nA); j += 1
      }
    }
    dedupeSameValue(out)
  }

  /** Equal-valued adjacent marks carry bounds on the SAME position
    * set — keep the tightest (max rmin, min rmax stay valid by I1/I2).
    */
  private def dedupeSameValue(ms: ArrayBuffer[Mark]): Array[Mark] = {
    if (ms.isEmpty) return Array.empty
    val out = new ArrayBuffer[Mark](ms.length)
    out += ms(0)
    var k = 1
    while (k < ms.length) {
      val m = ms(k); val last = out(out.length - 1)
      if (m.v == last.v)
        out(out.length - 1) = Mark(m.v,
          math.max(last.rmin, m.rmin), math.min(last.rmax, m.rmax))
      else out += m
      k += 1
    }
    out.toArray
  }

  /** Drop marks down to <= s, keeping both endpoints and a mark
    * whenever its rmax has moved > gap past the last kept rmin —
    * adjacent kept marks then enclose <= ~gap ranks of uncertainty.
    * gap doubles until the size bound holds (degenerate wide-mark
    * summaries would otherwise evade the greedy bound).
    */
  private[operators] def prune(marks: Array[Mark], n: Long,
      s: Int): Array[Mark] = {
    require(s >= 4, s"quantile sketch size $s too small")
    if (marks.length <= s) return marks
    var gap = math.max(1L, 2L * n / s)
    var out: Array[Mark] = marks
    while (out.length > s) {
      val kept = new ArrayBuffer[Mark](s)
      kept += out(0)
      var lastRmin = out(0).rmin
      var k = 1
      while (k < out.length - 1) {
        val m = out(k)
        if (m.rmax - lastRmin > gap) { kept += m; lastRmin = m.rmin }
        k += 1
      }
      if (out.length > 1) kept += out(out.length - 1)
      out = kept.toArray
      gap *= 2
    }
    out
  }

  /** Exact summary of a sorted batch (k-th element: rmin = rmax = k). */
  private[operators] def exactBatch(sorted: Array[Double]): Array[Mark] = {
    val ms = new ArrayBuffer[Mark](sorted.length)
    var k = 0
    while (k < sorted.length) {
      ms += Mark(sorted(k), k + 1L, k + 1L)
      k += 1
    }
    dedupeSameValue(ms)
  }

  // ------------------------------------------------------- buffers

  /** Mutable aggregation buffer: raw values batch until `flush`. */
  final class Buf(val s: Int) {
    var n: Long = 0L
    var marks: Array[Mark] = Array.empty
    val raw = new ArrayBuffer[Double]()

    def add(v: Double): Unit = {
      raw += v
      if (raw.length >= 4 * s) flush()
    }

    def flush(): Unit = if (raw.nonEmpty) {
      val sorted = raw.toArray
      java.util.Arrays.sort(sorted)
      val batch = exactBatch(sorted)
      marks = prune(
        mergeMarks(marks, n, batch, sorted.length), n + sorted.length, s)
      n += sorted.length
      raw.clear()
    }

    def absorb(other: Buf): Unit = {
      flush(); other.flush()
      marks = prune(mergeMarks(marks, n, other.marks, other.n),
        n + other.n, s)
      n += other.n
    }

    def absorb(sum: Summary): Unit = {
      flush()
      marks = prune(mergeMarks(marks, n, sum.marks, sum.n), n + sum.n, s)
      n += sum.n
    }

    def summary: Summary = { flush(); Summary(n, marks) }
  }

  /** Structural type equality ignoring nullability (parquet state
    * files read back nullable).
    */
  private[operators] def sameShape(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall {
          case (f, g) => f.name == g.name && sameShape(f.dataType,
            g.dataType)
        }
      case (x: ArrayType, y: ArrayType) =>
        sameShape(x.elementType, y.elementType)
      case _ => a == b
    }

  val outputType: StructType = new StructType()
    .add("n", LongType, nullable = false)
    .add("marks", ArrayType(new StructType()
      .add("v", DoubleType, nullable = false)
      .add("rmin", LongType, nullable = false)
      .add("rmax", LongType, nullable = false), containsNull = false),
      nullable = false)

  private[operators] def toInternal(sum: Summary): InternalRow =
    new GenericInternalRow(Array[Any](sum.n,
      new GenericArrayData(sum.marks.map(m =>
        new GenericInternalRow(Array[Any](m.v, m.rmin, m.rmax))
          .asInstanceOf[AnyRef]))))

  private[operators] def fromInternal(row: InternalRow): Summary = {
    val n = row.getLong(0)
    val arr = row.getArray(1)
    val ms = new Array[Mark](arr.numElements())
    var i = 0
    while (i < ms.length) {
      val m = arr.getStruct(i, 3)
      ms(i) = Mark(m.getDouble(0), m.getLong(1), m.getLong(2))
      i += 1
    }
    Summary(n, ms)
  }

  /** Row-API decode (driver-side collect of the agg output). */
  def fromRow(row: Row): Summary =
    Summary(row.getLong(0),
      row.getSeq[Row](1).map(m =>
        Mark(m.getDouble(0), m.getLong(1), m.getLong(2))).toArray)

  private[operators] def serialize(buf: Buf): Array[Byte] = {
    buf.flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.s); out.writeLong(buf.n); out.writeInt(buf.marks.length)
    buf.marks.foreach { m =>
      out.writeDouble(m.v); out.writeLong(m.rmin); out.writeLong(m.rmax)
    }
    out.flush(); bos.toByteArray
  }

  private[operators] def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buf(in.readInt())
    buf.n = in.readLong()
    buf.marks = Array.fill(in.readInt()) {
      Mark(in.readDouble(), in.readLong(), in.readLong())
    }
    buf
  }
}

/** The sketch build as a TypedImperativeAggregate over a double
  * column: per-partition buffers batch 4s raw values, fold exact
  * batches into the bounded summary, and merge with the interval
  * arithmetic above. Output: struct<n, marks array<struct<v, rmin,
  * rmax>>> — <= s marks per group cross the shuffle, never the
  * group's rows.
  */
case class QuantileSketchAgg(
    child: Expression, s: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buf] {

  require(s >= 4, "quantile_sketch: size must be >= 4")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"
  override def dataType: DataType = QuantileSketch.outputType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == DoubleType) TypeCheckSuccess
    else TypeCheckFailure(
      s"quantile_sketch expects double, got ${child.dataType}")
  }

  override def createAggregationBuffer(): QuantileSketch.Buf =
    new QuantileSketch.Buf(s)

  override def update(buf: QuantileSketch.Buf,
      input: InternalRow): QuantileSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: QuantileSketch.Buf,
      b: QuantileSketch.Buf): QuantileSketch.Buf = { a.absorb(b); a }

  override def eval(buf: QuantileSketch.Buf): Any =
    QuantileSketch.toInternal(buf.summary)

  override def serialize(buf: QuantileSketch.Buf): Array[Byte] =
    QuantileSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buf =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchAgg = copy(child = c(0))
}

/** Second-level fold over PRE-BUILT summaries (the [[QuantileSketchAgg]]
  * struct output) — the qs15 stream face's in-engine merge, mirroring
  * [[MisraGriesMergeAgg]]: chunk-grouped sketches fold into one
  * combined summary in the same plan.
  */
case class QuantileSketchMergeAgg(
    child: Expression, s: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buf] {

  require(s >= 4, "quantile_sketch_merge: size must be >= 4")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_merge"
  override def dataType: DataType = QuantileSketch.outputType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    // nullability-insensitive: a parquet-persisted summary (the QS15
    // stream state) reads back with nullable fields
    if (QuantileSketch.sameShape(child.dataType,
        QuantileSketch.outputType)) TypeCheckSuccess
    else TypeCheckFailure("quantile_sketch_merge expects the " +
      s"quantile_sketch output struct, got ${child.dataType}")
  }

  override def createAggregationBuffer(): QuantileSketch.Buf =
    new QuantileSketch.Buf(s)

  override def update(buf: QuantileSketch.Buf,
      input: InternalRow): QuantileSketch.Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.absorb(QuantileSketch.fromInternal(v.asInstanceOf[InternalRow]))
    buf
  }

  override def merge(a: QuantileSketch.Buf,
      b: QuantileSketch.Buf): QuantileSketch.Buf = { a.absorb(b); a }

  override def eval(buf: QuantileSketch.Buf): Any =
    QuantileSketch.toInternal(buf.summary)

  override def serialize(buf: QuantileSketch.Buf): Array[Byte] =
    QuantileSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buf =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchMergeAgg = copy(child = c(0))
}

/** Exact grouped quantiles THROUGH the sketch: summary pass → driver
  * brackets (a broadcast literal table, <= groups x quantiles rows) →
  * one exact pass that recounts below each bracket and rank-orders
  * only the in-bracket candidates. QUANTILE_CONT semantics (linear
  * interpolation at p·(n-1)), bit-equal to the full-sort q32 plan and
  * to DuckDB.
  */
object Quantiles {

  def quantileSketch(c: Column, s: Int = 2048): Column =
    Bridge.column(QuantileSketchAgg(Bridge.expression(c), s)
      .toAggregateExpression())

  def quantileSketchMerge(c: Column, s: Int = 2048): Column =
    Bridge.column(QuantileSketchMergeAgg(Bridge.expression(c), s)
      .toAggregateExpression())

  /** One bracket row shipped to the exact pass. */
  private final case class Bracket(qidx: Int, p: Double, rLo: Long,
      rHi: Long, frac: Double, a: Option[Double], b: Option[Double])

  private def bracketsOf(sum: QuantileSketch.Summary,
      ps: Seq[Double]): Seq[Bracket] =
    ps.zipWithIndex.map { case (p, qidx) =>
      val pos = p * (sum.n - 1) // 0-based fractional index, q32 form
      val rLo = math.floor(pos).toLong + 1
      val rHi = math.min(rLo + 1, sum.n)
      val (aLo, _) = sum.bracket(rLo)
      val (_, bHi) = sum.bracket(rHi)
      Bracket(qidx, p, rLo, rHi, pos - math.floor(pos), aLo, bHi)
    }

  /** The exact pass against per-group brackets. `summaries`: group key
    * Row (fields in groupCols order) → summary. Output: (groupCols...,
    * qidx int, p double, q double) — exact, interpolated, r4-rounded.
    */
  private def exactPass(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double],
      summaries: Seq[(Row, QuantileSketch.Summary)]): DataFrame = {
    val spark = df.sparkSession
    val groupFields = groupCols.map(c => df.schema(c))
    val bSchema = StructType(groupFields ++ Seq(
      StructField("__qidx", IntegerType, nullable = false),
      StructField("__p", DoubleType, nullable = false),
      StructField("__rlo", LongType, nullable = false),
      StructField("__rhi", LongType, nullable = false),
      StructField("__frac", DoubleType, nullable = false),
      StructField("__a", DoubleType, nullable = true),
      StructField("__b", DoubleType, nullable = true)))
    val bRows = for {
      (key, sum) <- summaries if sum.n > 0
      br <- bracketsOf(sum, ps)
    } yield Row.fromSeq(key.toSeq ++ Seq(br.qidx, br.p, br.rLo, br.rHi,
      br.frac, br.a.map(Double.box).orNull, br.b.map(Double.box).orNull))
    val brackets = spark.createDataFrame(
      spark.sparkContext.parallelize(bRows, 1), bSchema)

    val v = col(valueCol)
    val joined = df.select(groupCols.map(col) :+ v.as("__v"): _*)
      .join(broadcast(brackets), groupCols)
    val keys = groupCols.map(col) :+ col("__qidx")
    // recount below the bracket: partial-aggregated per partition, so
    // only <= groups x quantiles rows reach the shuffle
    val below = joined
      .groupBy(keys: _*)
      .agg(sum(when(col("__a").isNotNull && col("__v") < col("__a"), 1L)
        .otherwise(0L)).as("__c"))
    // rank-order ONLY the in-bracket candidates (~4n/s per bracket)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val inB = joined
      .where((col("__a").isNull || col("__v") >= col("__a")) &&
        (col("__b").isNull || col("__v") <= col("__b")))
      .withColumn("__rn", row_number().over(w))
      // below is provably <= groups x quantiles rows — broadcast, or
      // Spark sort-merges the candidate stream against it
      .join(broadcast(below), groupCols :+ "__qidx")
    inB.groupBy(keys: _*)
      .agg(min(col("__p")).as("__pv"), min(col("__frac")).as("__f"),
        max(when(col("__rn") === col("__rlo") - col("__c"), col("__v")))
          .as("__vlo"),
        max(when(col("__rn") === col("__rhi") - col("__c"), col("__v")))
          .as("__vhi"))
      .select(groupCols.map(col) ++ Seq(col("__qidx").as("qidx"),
        col("__pv").as("p"),
        round(col("__vlo") + col("__f") *
          (coalesce(col("__vhi"), col("__vlo")) - col("__vlo")), 4)
          .as("q")): _*)
  }

  /** Exact grouped quantiles, one-shot (xk13). */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double], s: Int = 2048): DataFrame = {
    require(groupCols.nonEmpty, "exactQuantiles: group columns")
    val sums = df.groupBy(groupCols.map(col): _*)
      .agg(quantileSketch(col(valueCol).cast(DoubleType), s).as("__qs"))
      .collect() // bounded: groups x (s marks)
      .map(r => (Row.fromSeq(r.toSeq.dropRight(1)),
        QuantileSketch.fromRow(r.getStruct(r.length - 1))))
    exactPass(df.withColumn(valueCol, col(valueCol).cast(DoubleType)),
      groupCols, valueCol, ps, sums.toSeq)
  }

  /** Exact grouped quantiles from PRE-BUILT per-group sketches
    * (possibly several per group — per chunk, per micro-batch):
    * fold through [[QuantileSketchMergeAgg]] in one plan, then the
    * identical exact pass over `df`. The shared tail of
    * [[exactQuantilesChunked]] and the QS15 file-stream runner.
    * `sketches`: groupCols ++ one `__qs` struct column.
    */
  def exactQuantilesFromSketches(df: DataFrame, sketches: DataFrame,
      groupCols: Seq[String], valueCol: String, ps: Seq[Double],
      s: Int = 2048): DataFrame = {
    require(groupCols.nonEmpty, "exactQuantilesFromSketches: group cols")
    val sums = sketches
      .groupBy(groupCols.map(col): _*)
      .agg(quantileSketchMerge(col("__qs"), s).as("__qs"))
      .collect()
      .map(r => (Row.fromSeq(r.toSeq.dropRight(1)),
        QuantileSketch.fromRow(r.getStruct(r.length - 1))))
    exactPass(df.withColumn(valueCol, col(valueCol).cast(DoubleType)),
      groupCols, valueCol, ps, sums.toSeq)
  }

  /** One per-group sketch frame over `df` — the per-chunk /
    * per-micro-batch build step feeding
    * [[exactQuantilesFromSketches]]. Output: groupCols ++ `__qs`.
    */
  def sketchByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, s: Int = 2048): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(quantileSketch(col(valueCol).cast(DoubleType), s).as("__qs"))

  /** Exact grouped quantiles over CHUNKS (qs15, the xk13 stream face):
    * per (chunk x group) sketches fold through
    * [[QuantileSketchMergeAgg]] in the same plan — bounded state (one
    * <= s-mark summary per group), any chunking — then the identical
    * exact pass. Equal to [[exactQuantiles]] on ANY chunking: the
    * merged summary's brackets may differ, but the exact pass's output
    * never depends on the brackets (only its candidate volume does).
    */
  def exactQuantilesChunked(df: DataFrame, chunkCol: Column,
      groupCols: Seq[String], valueCol: String, ps: Seq[Double],
      s: Int = 2048): DataFrame = {
    require(groupCols.nonEmpty, "exactQuantilesChunked: group columns")
    val perChunk = df
      .withColumn("__chunk", chunkCol)
      .groupBy((col("__chunk") +: groupCols.map(col)): _*)
      .agg(quantileSketch(col(valueCol).cast(DoubleType), s).as("__qs"))
    exactQuantilesFromSketches(df, perChunk, groupCols, valueCol, ps, s)
  }
}

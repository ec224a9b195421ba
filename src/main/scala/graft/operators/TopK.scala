package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs, best-first by
  * (score DESC, id ASC).
  *
  * The point is the AGGREGATION SHAPE: as a TypedImperativeAggregate
  * it participates in partial aggregation, so each map partition
  * forwards at most k pairs per group to the shuffle. Spark 4's
  * native InferWindowGroupLimit bounds the row_number()-window
  * formulation to the same shuffle volume (Partial/Final
  * WindowGroupLimit) — measured, not assumed — but it still SORTS the
  * full map partition (O(n log n) over every candidate row) before
  * the partial limit, sorts again after the shuffle, and runs the
  * rank Window on top. The bounded heap replaces both sorts with
  * O(n log k) inserts into a hash aggregate. For a brute-force
  * similarity scan the candidate stream is |corpus|·|queries| rows,
  * so sorting it is exactly the cost worth deleting.
  *
  * Buffer: a sorted set capped at k (insert + trim is O(log k)).
  * CONTRACT: ids must be unique within a group — an exact duplicate
  * (score, id) pair collapses in the set, where row_number() would
  * count it twice. Every caller (one candidate row per (qid, id) by
  * construction) satisfies this; feed pre-deduped candidates or the
  * group may return fewer than k rows.
  */
case class TopKPairs(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0, "TopKPairs: k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"
  override def dataType: DataType = ArrayType(new StructType()
    .add("sim", DoubleType).add("id", LongType), containsNull = false)

  private def ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // score desc
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // id asc
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def trim(buf: java.util.TreeSet[(Double, Long)]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.add((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      trim(buf)
    }
    buf
  }

  override def merge(a: java.util.TreeSet[(Double, Long)],
      b: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    a.addAll(b)
    trim(a)
    a
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[AnyRef](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      bb.putDouble(s); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopK {
  /** Column form: array<struct<sim,id>> of the k best pairs. Inputs
    * are cast up front — the aggregate's eval casts blindly, so an
    * int id or float score would otherwise CCE inside executor tasks.
    */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(score.cast(DoubleType)),
      Bridge.expression(id.cast(LongType)), k).toAggregateExpression())
}

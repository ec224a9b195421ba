package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: Spark 4 made Column⇄Expression conversion
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so the
  * graft engine exposes it from inside the sql package namespace — the
  * standard pattern for Catalyst-extending libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebuild a (typically just-checkpointed) DataFrame as a fresh
    * `LogicalRDD` with DEFAULT statistics. `localCheckpoint` truncates
    * RDD lineage but PRESERVES the origin plan's size-in-bytes
    * estimate, and a join's estimate is the PRODUCT of its children's
    * — so an iterative loop whose round joins the previous round's
    * frame with itself doubles the estimate's bit-length every round:
    * by round ~25 the BigInt stats math in join planning takes minutes
    * and then throws "BigInteger would overflow supported range"
    * (xd18's pointer-jumping components hit this; any self-joining
    * fixed-point loop would). For an already-materialized frame
    * `queryExecution.toRdd` is a plain scan of the checkpoint blocks —
    * no recompute.
    */
  def freshStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema)
  }
}

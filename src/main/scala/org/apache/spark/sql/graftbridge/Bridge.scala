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
    // Contract check (r14 advice): `toRdd` of an UN-materialized plan
    // re-executes the whole upstream pipeline on EVERY downstream
    // action — silently. Accept only narrow plans (project / filter /
    // union) whose every leaf is a checkpointed LogicalRDD; anything
    // else must `localCheckpoint(true)` first.
    val plan = cdf.queryExecution.analyzed
    val leavesOk = plan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    val narrowOk = plan.collect {
      case p
          if !p.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
            && !p.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.Project]
            && !p.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.Filter]
            && !p.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.Union] =>
        p
    }.isEmpty
    require(leavesOk && narrowOk,
      "freshStats: input must be checkpointed/materialized (every " +
        "leaf a LogicalRDD, only narrow ops above it) — call " +
        s"localCheckpoint(true) first; got:\n$plan")
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema)
  }
}

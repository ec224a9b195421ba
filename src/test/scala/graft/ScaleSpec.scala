package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.queries.T

/** Scale-technique specs: salting correctness and bucketed co-located
  * joins (shuffle-free SMJ — the 100TB join shape).
  */
class ScaleSpec extends SparkSpec {

  test("salted sum == direct decimal sum") {
    val ev = T.t(spark, sf0001, "events")
    val salted = Scale.saltedDecimalSum(ev, Seq("event_type"), "value", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(round(sum(col("value").cast("decimal(28,6)")).cast("double"), 4)
        .as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("skew-safe distinct == countDistinct") {
    val ev = T.t(spark, sf0001, "events")
    val safe = Scale.skewSafeCountDistinct(ev, Seq("event_type"),
        "user_id", "du")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("du"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(safe == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a temp dir set at session build — SparkSpec)
    // write both sides bucketed on the join key
    T.t(spark, sf0001, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("cust_b")
    T.t(spark, sf0001, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("ord_b")
    val joined = spark.table("cust_b")
      .join(spark.table("ord_b"), "c_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is still correct
    val direct = T.t(spark, sf0001, "customer").join(
      T.t(spark, sf0001, "orders"),
      col("c_custkey") === col("o_custkey")).count()
    assert(joined.count() == direct)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared query: the Spark-side plan builder plus (optionally) the
  * equivalent DuckDB SQL oracle. Column names/types must match exactly —
  * the driver sorts columns by name and hashes values (SURVEY Appendix A).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Shared helpers for the declared-query layer. */
object T {
  /** Load one driver testdata table (TESTDATA.md).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long — so we
    * read nanos-as-long and rebuild a µs TimestampType column. `x div
    * 1000` floors exactly like DuckDB's `ts::TIMESTAMP` ns→µs cast, so
    * both engines see identical timestamps.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Deterministic double SUM: accumulate in DECIMAL(28,6) (exact, so the
    * result is independent of partitioning / add order — a raw double sum
    * over 60k+ rows drifts past the 1e-4 rounding grain), then cast back.
    * The DuckDB oracle uses the textually identical formula (`dsumSql`).
    */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 6))).cast(DoubleType), 4)

  def dsumSql(x: String): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE),4)"

  /** Deterministic AVG: exact decimal sum, one double division. */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 6))).cast(DoubleType) / count(lit(1)), 4)

  def davgSql(x: String): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*),4)"

  /** IEEE-deterministic 4-decimal rounding: floor(x·10⁴ + 0.5)/10⁴ is
    * the same double-op sequence in both engines, unlike ROUND — Spark
    * rounds the exact decimal expansion (BigDecimal HALF_UP) while
    * DuckDB rounds the scaled double, and values sitting within an ulp
    * of a .00005 boundary diverge (observed on xt2 at sf0.1). Use for
    * per-row formulas whose values are dense in [0,1]; non-negative
    * inputs only.
    */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0

  def r4Sql(x: String): String = s"FLOOR(($x) * 10000 + 0.5) / 10000.0"
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY §2.9–§2.11, Appendix A) registers one
  * [[Q]] in a module below; `queries`/`oracleSql` are derived views over
  * that single registry so names can never drift apart.
  */
object SparkEntry {

  /** The full declared-query registry, in contract order. */
  val declared: Seq[Q] =
    CoreQueries.all ++ StreamBatchQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++
      TextAnalysisQueries.all ++ MultimodalQueries.all ++
      CodecQueries.all ++ ScaleQueries.all ++ PipelineQueries.all ++
      GraphQueries.all ++ EventQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q29: the TPC-H-style star join (scan→broadcast joins→agg→sort).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q29_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Similarity search over an embedding column (SURVEY §2.11).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: the exact baseline — broadcast the (small)
  *    query set against the corpus, rank per query. One pass over the
  *    corpus, no corpus self-shuffle; at 100TB this is the right plan
  *    whenever |queries| is broadcastable.
  *  - [[ivfTopK]]: the scale path — IVF-style partitioning. Corpus
  *    vectors are assigned to their nearest centroid once (a narrow
  *    map), queries probe only the `nprobe` nearest centroid cells, so
  *    the candidate set shrinks by ~|centroids|/nprobe. Approximate:
  *    recall measured against the brute-force baseline in tests.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (cosine), excluding
    * self-matches. `queries` must be small enough to broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    c.crossJoin(broadcast(q))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        TextFns.cosine(col("v"), col("qv")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("id"))))
      .where(col("rank") <= k)
  }

  /** IVF-style ANN: deterministic centroids (the first `nlist` corpus
    * vectors by id — a seeded k-means refinement can replace this
    * without changing the plumbing), corpus assigned to nearest
    * centroid, queries probe `nprobe` cells.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cents = c.orderBy("id").limit(nlist)
      .select(col("id").as("cent_id"), col("v").as("cent_v"))

    def nearestCells(df: DataFrame, vc: String, n: Int,
                     outCol: String): DataFrame =
      df.crossJoin(broadcast(cents))
        .select(df.columns.map(col) :+
          col("cent_id") :+
          TextFns.cosine(col(vc), col("cent_v")).as("__cs"): _*)
        .withColumn("__cr", row_number().over(
          Window.partitionBy(col(vc)).orderBy(col("__cs").desc,
            col("cent_id"))))
        .where(col("__cr") <= n)
        .withColumnRenamed("cent_id", outCol)
        .drop("__cs", "__cr")

    val assigned = nearestCells(c, "v", 1, "cell")
    val probes = nearestCells(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv")),
      "qv", nprobe, "cell")

    assigned.join(probes, "cell")
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        TextFns.cosine(col("v"), col("qv")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("id"))))
      .where(col("rank") <= k)
  }
}

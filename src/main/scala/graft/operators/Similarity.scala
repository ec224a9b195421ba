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
  *
  * Norms are precomputed per row before any pair join (computing them
  * inside the n·q pair loop triples the dot-product work) — the cosine
  * value is bit-identical either way.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (cosine), excluding
    * self-matches. `queries` must be small enough to broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      TextFns.l2norm(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      TextFns.l2norm(col(vecCol)).as("nq"))
    c.crossJoin(broadcast(q))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (TextFns.dot(col("v"), col("qv")) / (col("nv") * col("nq")))
          .as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("id"))))
      .where(col("rank") <= k)
  }

  /** Deterministic k-means centroids: init = first `nlist` corpus
    * vectors by id, then `iters` Lloyd rounds — assign every corpus
    * vector to its nearest (cosine) centroid, recompute each cell's
    * per-dimension mean. Fully distributed per round; only the
    * CENTROIDS (nlist × dim doubles — a few KB) come to the driver,
    * which also keeps the lineage flat across iterations instead of
    * stacking `iters` crossJoin+window layers into one plan.
    * Determinism: decimal-accumulated means (order-independent) and
    * id-ordered tie-breaks, so the same corpus yields the same cells
    * on any cluster size.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
    var cents = c.orderBy("id").limit(nlist)
      .select(col("id").as("cent_id"), col("v").as("cent_v"))
    var i = 0
    while (i < iters) {
      val assigned = c.crossJoin(broadcast(cents))
        .withColumn("__cs", TextFns.cosine(col("v"), col("cent_v")))
        .withColumn("__cr", row_number().over(
          Window.partitionBy(col("id"))
            .orderBy(col("__cs").desc, col("cent_id"))))
        .where(col("__cr") === 1)
      val means = assigned
        .select(col("cent_id"), posexplode(col("v")).as(Seq("__p", "__x")))
        .groupBy("cent_id", "__p")
        .agg((sum(col("__x").cast(DecimalType(38, 15))) / count(lit(1)))
          .cast(DoubleType).as("__m"))
        .groupBy("cent_id")
        .agg(transform(
          array_sort(collect_list(struct(col("__p"), col("__m")))),
          s => s.getField("__m")).as("cent_v"))
      val rows = means.select(col("cent_id").cast("long"), col("cent_v"))
        .as[(Long, scala.Seq[Double])].collect().sortBy(_._1)
      cents = rows.toSeq.toDF("cent_id", "cent_v")
      i += 1
    }
    cents
  }

  /** IVF-style ANN: seeded-k-means centroids (deterministic Lloyd
    * refinement above), corpus assigned to nearest centroid once,
    * queries probe `nprobe` cells.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 3): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      TextFns.l2norm(col(vecCol)).as("nv"))
    val cents = kmeansCentroids(corpus, idCol, vecCol, nlist, kmeansIters)

    // rank centroids per row (windowed by the row id, never by the
    // vector payload — an array partition key would shuffle and sort
    // on the vectors themselves)
    def nearestCells(df: DataFrame, idc: String, vc: String, n: Int)
        : DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("__cs", TextFns.cosine(col(vc), col("cent_v")))
        .withColumn("__cr", row_number().over(
          Window.partitionBy(col(idc))
            .orderBy(col("__cs").desc, col("cent_id"))))
        .where(col("__cr") <= n)
        .withColumnRenamed("cent_id", "cell")
        .drop("__cs", "__cr", "cent_v")

    val assigned = nearestCells(c, "id", "v", 1)
    val probes = nearestCells(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        TextFns.l2norm(col(vecCol)).as("nq")), "qid", "qv", nprobe)

    assigned.join(probes, "cell")
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (TextFns.dot(col("v"), col("qv")) / (col("nv") * col("nq")))
          .as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("id"))))
      .where(col("rank") <= k)
  }
}

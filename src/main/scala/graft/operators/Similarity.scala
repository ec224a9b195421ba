package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *  - [[ivfTopK]]: the scale path — IVF-style partitioning. Centroids
  *    are a driver-side literal (nlist × dim doubles — a few KB), so
  *    cell assignment is a NARROW MAP over the corpus (zero shuffle;
  *    an earlier broadcast-join + per-row-window formulation shuffled
  *    the whole corpus once per ranking). Queries probe the `nprobe`
  *    nearest cells, shrinking candidates by ~nlist/nprobe.
  *    Approximate: recall measured against brute force in tests.
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

  /** Cell ids of the `n` nearest centroids via the fused
    * [[NearestCentroids]] expression — a narrow map (no join, no
    * window, no shuffle) with a tight compiled inner loop. Ranks by
    * dot(v,c)/‖c‖, which orders identically to cosine for a fixed row
    * (positive 1/‖v‖ scale); ties go to the lower centroid id.
    */
  private def nearestCells(v: Column, cents: Seq[(Long, Seq[Double])],
      n: Int): Column =
    HashFns.nearestCentroids(v, cents.map(_._1), cents.map(_._2), n)

  /** Deterministic k-means centroids: init = first `nlist` corpus
    * vectors by id, then up to `iters` Lloyd rounds — assign every
    * vector to its nearest centroid (narrow map over the centroid
    * literal — no shuffle), recompute per-dimension means (one small
    * (cell, dim) aggregation). Only the centroid matrix reaches the
    * driver, which also keeps lineage flat across rounds. Stops early
    * when centroids stop moving. Determinism: decimal-accumulated
    * means (order-independent) and id-ordered tie-breaks, so the same
    * corpus yields the same cells on any cluster size.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    spark.createDataFrame(
      kmeansCentroidsLocal(corpus, idCol, vecCol, nlist, iters))
      .toDF("cent_id", "cent_v")
  }

  /** Driver-side centroid matrix (tiny) — avoids a DataFrame
    * round-trip for callers that broadcast it as a plan constant.
    */
  private def kmeansCentroidsLocal(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
    var cents: Seq[(Long, Seq[Double])] = c.orderBy("id").limit(nlist)
      .select(col("id"), col("v"))
      .as[(Long, scala.Seq[Double])].collect().toSeq
    var moved = true
    var i = 0
    while (moved && i < iters) {
      val cell = element_at(nearestCells(col("v"), cents, 1), 1)
      val next = c.select(cell.as("__cell"),
          posexplode_outer(col("v")).as(Seq("__p", "__x")))
        .groupBy("__cell", "__p")
        .agg((sum(col("__x").cast(DecimalType(38, 15))) / count(lit(1)))
          .cast(DoubleType).as("__m"))
        .groupBy("__cell")
        .agg(transform(
          array_sort(collect_list(struct(col("__p"), col("__m")))),
          s => s.getField("__m")).as("cent_v"))
        .select(col("__cell").cast("long"), col("cent_v"))
        .as[(Long, scala.Seq[Double])].collect().sortBy(_._1).toSeq
      moved = next != cents
      cents = next
      i += 1
    }
    cents
  }

  /** IVF-style ANN: seeded-k-means centroids (deterministic Lloyd
    * refinement above), corpus assigned to its cell via a narrow map,
    * queries probe `nprobe` cells.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 3): DataFrame = {
    val cents =
      kmeansCentroidsLocal(corpus, idCol, vecCol, nlist, kmeansIters)

    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        TextFns.l2norm(col(vecCol)).as("nv"))
      .withColumn("cell", element_at(nearestCells(col("v"), cents, 1), 1))
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        TextFns.l2norm(col(vecCol)).as("nq"))
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nprobe)))

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

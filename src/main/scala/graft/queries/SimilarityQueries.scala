package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import T._

/** Similarity-search entries (SURVEY §2.11). The brute-force batch
  * top-k is oracle-checked; the IVF ANN variant is approximate by
  * design → no SQL oracle (driver rows-only check) but its recall vs
  * the exact baseline is asserted in SimilaritySpec.
  */
object SimilarityQueries {

  val all: Seq[Q] = Seq(
    // Batch exact top-3 neighbors for 10 query vectors.
    Q("xs1_ann_brute_topk",
      """SELECT qid, rank, id, sim FROM (
        |  SELECT qid, id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY raw DESC, id) AS INT) AS rank,
        |    ROUND(raw, 4) AS sim
        |  FROM (
        |    SELECT q.vec_id AS qid, c.vec_id AS id,
        |      LIST_INNER_PRODUCT(c.embedding::DOUBLE[],
        |                         q.embedding::DOUBLE[]) /
        |        (SQRT(LIST_INNER_PRODUCT(c.embedding::DOUBLE[],
        |                                  c.embedding::DOUBLE[])) *
        |         SQRT(LIST_INNER_PRODUCT(q.embedding::DOUBLE[],
        |                                  q.embedding::DOUBLE[]))) AS raw
        |    FROM embeddings c,
        |         (SELECT * FROM embeddings WHERE vec_id < 10) q
        |    WHERE c.vec_id <> q.vec_id
        |  )
        |) WHERE rank <= 3 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 3)
        .select(col("qid"), col("rank"), col("id"),
          round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    },

    // IVF ANN (approximate; no SQL oracle — recall asserted in tests).
    Q.noOracle("xs2_ann_ivf") { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
        .select(col("qid"), col("rank"), col("id"),
          round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }
  )
}

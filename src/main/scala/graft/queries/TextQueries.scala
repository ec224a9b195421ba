package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import T._

/** SURVEY.md §2.11 / Appendix A QX1–QX4: text-analysis layer over the
  * `documents` table (plus the Q22-family array ops over `embeddings`
  * living in CoreQueries).
  */
object TextQueries {

  val all: Seq[Q] = Seq(
    Q("qx1_dedup_exact",
      """SELECT COUNT(*) AS total,
        |COUNT(DISTINCT SHA256(LOWER(TRIM(text)))) AS uniq
        |FROM documents""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .agg(count(lit(1)).as("total"),
          countDistinct(sha2(lower(trim(col("text"))), 256)).as("uniq"))
    },

    // Brute-force cosine top-5 vs vec_id=1 (the exact baseline for the
    // ANN layer in graft.queries.SimilarityQueries). Dot products
    // accumulate left-to-right in DOUBLE in both engines.
    Q("qx2_cosine_topk",
      """SELECT rank, vec_id, sim FROM (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY raw_sim DESC, vec_id)
        |    AS INT) AS rank, vec_id, ROUND(raw_sim, 4) AS sim
        |  FROM (
        |    SELECT e.vec_id,
        |      LIST_INNER_PRODUCT(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
        |      / (SQRT(LIST_INNER_PRODUCT(e.embedding::DOUBLE[],
        |                                 e.embedding::DOUBLE[]))
        |         * SQRT(LIST_INNER_PRODUCT(q.embedding::DOUBLE[],
        |                                   q.embedding::DOUBLE[]))) AS raw_sim
        |    FROM embeddings e,
        |         (SELECT embedding FROM embeddings WHERE vec_id = 1) q
        |    WHERE e.vec_id <> 1
        |  )
        |) WHERE rank <= 5 ORDER BY rank""".stripMargin) { (s, d) =>
      import graft.functions.TextFns
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
      val q = emb.where(col("vec_id") === 1)
        .select(col("v").as("qv"))
      // Top-5 via orderBy+limit (TakeOrderedAndProject: per-partition
      // top-k + 5-row driver merge) BEFORE the rank window — a global
      // row_number over the corpus would funnel every similarity
      // through one WindowExec partition. The window then runs on 5
      // rows only.
      emb.where(col("vec_id") =!= 1)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (TextFns.dot(col("v"), col("qv")) /
            (TextFns.l2norm(col("v")) * TextFns.l2norm(col("qv"))))
            .as("raw_sim"))
        .orderBy(col("raw_sim").desc, col("vec_id"))
        .limit(5)
        // Rank the 5 surviving rows without a WindowExec: coalesce to
        // one partition (5 rows), re-assert the order within it, and
        // number rows physically. monotonically_increasing_id on a
        // single partition is 0..n-1 in row order, so rank = id + 1.
        .coalesce(1)
        .sortWithinPartitions(col("raw_sim").desc, col("vec_id"))
        .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
        .select(col("rank"), col("vec_id"), round(col("raw_sim"), 4).as("sim"))
        .orderBy("rank")
    },

    Q("qx3_wordcount",
      """SELECT w, COUNT(*) AS c FROM (
        |  SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(text), '\s+')) AS w
        |  FROM documents
        |) WHERE w <> '' GROUP BY w ORDER BY c DESC, w LIMIT 50"""
        .stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
        .limit(50)
    },

    Q("qx4_docstats",
      """SELECT lang, source, COUNT(*) AS n,
        |ROUND(CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE)/COUNT(*), 4)
        |  AS ac
        |FROM documents GROUP BY lang, source ORDER BY lang, source"""
        .stripMargin) { (s, d) =>
      t(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"),
          round(sum(col("n_chars")).cast(DoubleType) / count(lit(1)), 4)
            .as("ac"))
        .orderBy("lang", "source")
    },

    // Data-quality profile per language: the ingest-monitoring op a
    // pipeline runs before/after every transform stage (counts,
    // cardinalities, ranges, empties). Partial+final aggregation —
    // one shuffle keyed by the profile dimension.
    Q("qx5_profile",
      s"""SELECT lang, COUNT(*) AS n,
         |CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |CAST(MIN(n_chars) AS BIGINT) AS min_c,
         |CAST(MAX(n_chars) AS BIGINT) AS max_c,
         |${davgSql("n_chars")} AS avg_c,
         |CAST(COUNT(*) FILTER (WHERE TRIM(text) = '') AS BIGINT)
         |  AS n_empty
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, d) =>
      t(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("source")).as("n_sources"),
          min("n_chars").as("min_c"),
          max("n_chars").as("max_c"),
          davg(col("n_chars")).as("avg_c"),
          count(when(trim(col("text")) === "", 1)).as("n_empty"))
        .orderBy("lang")
    }
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Dedup
import T._

/** End-to-end training-data pipeline composition (SURVEY §2.11): the
  * individual dedup/chunking operators are each hash-gated on their
  * own (xd1, xd7, xt5); this entry proves they COMPOSE — near-dup
  * pairs → connected components → one survivor per cluster → sliding-
  * window chunks — against an oracle that replays the whole chain in
  * SQL (exact all-pairs Jaccard + recursive-CTE closure + list-slice
  * chunking).
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    Q("xp1_pipeline",
      s"""WITH RECURSIVE pairs AS (
         |  SELECT * FROM (${DedupQueries.jaccardOracleSql(0.5)})
         |), edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL SELECT b AS src, a AS dst FROM pairs
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.dst AS id, r.lab AS lab
         |  FROM reach r JOIN edges e ON e.src = r.id
         |), comp AS (
         |  SELECT id, MIN(lab) AS component FROM reach GROUP BY id
         |), survivors AS (
         |  SELECT * FROM documents
         |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
         |), d AS (
         |  SELECT doc_id,
         |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'),
         |                t -> t <> '') AS fw
         |  FROM survivors
         |), chunks AS (
         |  SELECT doc_id, fw[k+1 : k+64] AS c
         |  FROM d, UNNEST(RANGE(0, GREATEST(LEN(fw), 1), 32)) u(k)
         |  WHERE LEN(fw) > 0 AND k < LEN(fw)
         |)
         |SELECT (SELECT COUNT(*) FROM survivors) AS n_docs,
         |  COUNT(*) AS n_chunks,
         |  CAST(SUM(LEN(c)) AS BIGINT) AS n_tok
         |FROM chunks""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5)
      val survivors = Dedup.dedupByComponents(docs, pairs, "doc_id")
      // Single pass over the survivor lineage: its upstream (minhash
      // bands + iterative components) is the expensive part, and
      // aggregating docs and chunks as separate branches would execute
      // that chain twice. explode_outer keeps zero-chunk docs (one
      // null-start row) so one aggregation yields all three stats.
      // Chunk semantics identical to TextFns.chunkDocs (hash-gated on
      // its own in xt5): stride-32 starts, 64-token slices.
      val chunked = survivors.select(col("doc_id"),
          filter(split(col("text"), "\\s+"), t => t =!= "").as("__toks"))
        .select(col("doc_id"), col("__toks"),
          explode_outer(when(size(col("__toks")) > 0,
            sequence(lit(0), size(col("__toks")) - 1, lit(32))))
            .as("start"))
      chunked.agg(
        sum(when(col("start") === 0 || col("start").isNull, 1)
          .otherwise(0)).cast("long").as("n_docs"),
        count(col("start")).as("n_chunks"),
        sum(when(col("start").isNotNull,
          size(slice(col("__toks"), col("start") + 1, lit(64)))))
          .cast("long").as("n_tok"))
    }
  )
}

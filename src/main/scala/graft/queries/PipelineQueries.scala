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
      val chunks = TextFns.chunkDocs(survivors, "doc_id", "text",
        maxTokens = 64, stride = 32)
      survivors.agg(count(lit(1)).as("n_docs"))
        .crossJoin(chunks.agg(count(lit(1)).as("n_chunks"),
          sum("n_tok").cast("long").as("n_tok")))
    }
  )
}

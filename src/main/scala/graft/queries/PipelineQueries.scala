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
      // One aggregation pass over the survivor lineage (minhash bands
      // + iterative components are the expensive upstream) — see
      // TextFns.chunkStats.
      TextFns.chunkStats(survivors, "doc_id", "text")
    },

    // The full training-data pipeline: md5 split → drop train docs
    // contaminated by the test split (any shared word 5-gram) →
    // MinHash near-dedup the clean train set → chunk the survivors.
    // One oracle replays every stage: bucket math, shingle-overlap
    // contamination, exact all-pairs Jaccard over the CLEAN subset,
    // recursive-CTE component closure, list-slice chunking.
    Q("xp2_train_pipeline",
      s"""WITH RECURSIVE lab AS (
         |  SELECT doc_id, text,
         |    (STRPOS('0123456789abcdef',
         |            SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |    + STRPOS('0123456789abcdef',
         |             SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
         |      AS bucket
         |  FROM documents
         |), tok0 AS (
         |  SELECT doc_id, bucket,
         |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'),
         |                t -> t <> '') AS fw
         |  FROM lab
         |), sh5 AS (
         |  SELECT DISTINCT doc_id, bucket,
         |    ARRAY_TO_STRING(fw[i+1 : i+5], ' ') AS s
         |  FROM tok0, UNNEST(RANGE(0, GREATEST(LEN(fw) - 4, 0))) u(i)
         |), contam AS (
         |  SELECT DISTINCT tr.doc_id
         |  FROM (SELECT * FROM sh5 WHERE bucket < 205) tr
         |  JOIN (SELECT * FROM sh5 WHERE bucket >= 230) te ON te.s = tr.s
         |), clean AS (
         |  SELECT doc_id, text FROM lab
         |  WHERE bucket < 205
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)
         |), pairs AS (
         |  SELECT * FROM (${DedupQueries.jaccardOracleSql(0.5,
              source = "clean")})
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
         |  SELECT * FROM clean
         |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
         |), d2 AS (
         |  SELECT doc_id,
         |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'),
         |                t -> t <> '') AS fw
         |  FROM survivors
         |), chunks AS (
         |  SELECT doc_id, fw[k+1 : k+64] AS c
         |  FROM d2, UNNEST(RANGE(0, GREATEST(LEN(fw), 1), 32)) u(k)
         |  WHERE LEN(fw) > 0 AND k < LEN(fw)
         |)
         |SELECT (SELECT COUNT(*) FROM lab WHERE bucket < 205) AS n_train,
         |  (SELECT COUNT(*) FROM contam) AS n_contam,
         |  (SELECT COUNT(*) FROM survivors) AS n_docs,
         |  COUNT(*) AS n_chunks,
         |  CAST(SUM(LEN(c)) AS BIGINT) AS n_tok
         |FROM chunks""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
        graft.operators.Scale.splitLabel(col("doc_id").cast("string"))
          .as("split"))
      val train = docs.where(col("split") === "train")
      val bench = docs.where(col("split") === "test")
      // localCheckpoint: contam (a tiny id set) feeds BOTH the
      // n_contam count and the clean-corpus anti-join upstream of the
      // minhash chain — without it the full train-corpus shingle
      // broadcast join executes twice.
      val contam = graft.operators.Decontaminate
        .overlapReport(train, bench, "doc_id", "text", n = 5)
        .select(col("train_id").as("doc_id"))
        .localCheckpoint()
      val clean = train.join(contam, Seq("doc_id"), "left_anti")
      val pairs = Dedup.minhashNearDups(clean, "doc_id", "text",
        threshold = 0.5)
      val survivors = Dedup.dedupByComponents(clean, pairs, "doc_id")
      // survivor-side stats in ONE pass (TextFns.chunkStats); the
      // train/contam counts are cheap side branches that stop before
      // the expensive minhash+components chain.
      train.agg(count(lit(1)).as("n_train"))
        .crossJoin(contam.agg(count(lit(1)).as("n_contam")))
        .crossJoin(TextFns.chunkStats(survivors, "doc_id", "text"))
    },

    // The embedding-side scale pipeline: JL random projection (xs8,
    // 64→16 dims) feeding hyperplane-LSH near-dup blocking + exact
    // verify (xd6) — the composition that makes high-dim corpora
    // cheap to block at 100TB (4× fewer dims in every signature dot
    // and every verify cosine; planted-twin recall in the projected
    // space is 467/500 at sf0.01 — the honest JL trade, and the
    // projected pair set is EXACT by the oracle, which replays
    // projection decimal-for-decimal and brute-forces all projected
    // pairs). Same planted corpus and band-parameter law as xd6.
    Q("xp3_jl_neardup",
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), corpus AS (
         |  SELECT vec_id AS id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000 AS id,
         |         LIST_TRANSFORM(v, x -> x + 0.05) AS v FROM base
         |), term AS (
         |  SELECT id, j,
         |    CAST(CASE WHEN SUBSTR(MD5(i || '_' || j), 1, 1) IN
         |        ('0','2','4','6','8','a','c','e')
         |      THEN v[i + 1] ELSE -v[i + 1] END AS DECIMAL(28,12)) AS t
         |  FROM corpus,
         |    UNNEST(RANGE(0, LEN(v))) AS ti(i),
         |    UNNEST(RANGE(0, 16)) AS tj(j)
         |), pj AS (
         |  SELECT id, j, CAST(SUM(t) AS DOUBLE) / SQRT(16.0) AS pv
         |  FROM term GROUP BY id, j
         |), proj AS (
         |  SELECT id, LIST(pv ORDER BY j) AS p FROM pj GROUP BY id
         |)
         |SELECT a, b, ROUND(c, 4) AS c FROM (
         |  SELECT x.id AS a, y.id AS b,
         |    LIST_INNER_PRODUCT(x.p, y.p) /
         |      (SQRT(LIST_INNER_PRODUCT(x.p, x.p)) *
         |       SQRT(LIST_INNER_PRODUCT(y.p, y.p))) AS c
         |  FROM proj x JOIN proj y ON x.id < y.id
         |) WHERE c >= 0.9 ORDER BY a, b""".stripMargin) { (s, d) =>
      val corpus = DedupQueries.plantedEmbeddingCorpus(
        t(s, d, "embeddings"))
      val proj = graft.operators.Similarity.randomProject(corpus, "v", 16)
      Dedup.embeddingNearDupsLSHAuto(proj, "id", "v", threshold = 0.9)
        .select(col("a"), col("b"), round(col("c"), 4).as("c"))
        .orderBy("a", "b")
    },

    // The CCNet dedup chain proper (xp4): Unicode normalization
    // front-end (xd13) → exact dedup ON the normalized keys → MinHash
    // near-dup + component closure over the normalized survivors —
    // the front-end is load-bearing for BOTH downstream stages
    // (cosmetic variants must land in one exact bucket and shingle
    // identically), which is exactly what the composed oracle proves:
    // it replays normalization → min-id grouping → exact all-pairs
    // Jaccard over the normalized text → recursive closure.
    Q("xp4_ccnet_pipeline",
      s"""WITH RECURSIVE nrm AS (
         |  SELECT doc_id, ${graft.operators.Dedup.ccnetNormalizeSql("text")}
         |    AS ntext
         |  FROM documents
         |), ex AS (
         |  SELECT MIN(doc_id) AS doc_id FROM nrm GROUP BY ntext
         |), sv AS (
         |  SELECT nrm.doc_id, nrm.ntext AS text FROM nrm
         |  JOIN ex USING (doc_id)
         |), pairs AS (
         |  SELECT * FROM (${DedupQueries.jaccardOracleSql(0.5,
              source = "sv")})
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
         |), fin AS (
         |  SELECT * FROM sv
         |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
         |)
         |SELECT (SELECT COUNT(*) FROM nrm) AS n_docs,
         |  (SELECT COUNT(*) FROM sv) AS n_exact,
         |  (SELECT COUNT(*) FROM fin) AS n_final,
         |  (SELECT CAST(SUM(LENGTH(text)) AS BIGINT) FROM fin)
         |    AS n_chars""".stripMargin) { (s, d) =>
      val nrm = t(s, d, "documents")
        .select(col("doc_id"), Dedup.ccnetNormalize(col("text"))
          .as("text"))
        .localCheckpoint()
      // exact survivors feed the pair join, the closure AND a count —
      // checkpoint once (the xp2 discipline)
      val exact = Dedup.exactDedup(nrm, "doc_id", "text")
        .localCheckpoint()
      val pairs = Dedup.minhashNearDups(exact, "doc_id", "text",
        threshold = 0.5)
      val fin = Dedup.dedupByComponents(exact, pairs, "doc_id")
      nrm.agg(count(lit(1)).as("n_docs"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(fin.agg(count(lit(1)).as("n_final"),
          sum(length(col("text"))).cast("long").as("n_chars")))
    }
  )
}

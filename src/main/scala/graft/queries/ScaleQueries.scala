package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Scale
import T._

/** Skew-technique entries: the salted/two-phase plans must reproduce
  * the direct aggregation bit-for-bit (the oracle computes the direct
  * form) — proving the skew mitigation changes only the shuffle shape,
  * never the answer. events.user_id is the hot-key column in this
  * testdata (~67 events per user per SF step).
  */
object ScaleQueries {

  val all: Seq[Q] = Seq(
    Q("xk1_salted_sum",
      s"""SELECT event_type, ${dsumSql("value")} AS s
         |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin) { (s, d) =>
      Scale.saltedDecimalSum(t(s, d, "events"), Seq("event_type"),
          "value", "s")
        .orderBy("event_type")
    },

    Q("xk2_skewsafe_distinct",
      """SELECT event_type, COUNT(DISTINCT user_id) AS du
        |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin) { (s, d) =>
      Scale.skewSafeCountDistinct(t(s, d, "events"), Seq("event_type"),
          "user_id", "du")
        .orderBy("event_type")
    },

    // Deterministic train/val/test split + stable sample: bucket =
    // value of the first two md5 hex chars of the doc id — identical
    // in any engine, so membership survives reruns/re-partitioning
    // (the property rand()-sampling lacks). Oracle replays the nibble
    // math with STRPOS.
    Q("xk3_hash_split",
      """WITH b AS (
        |  SELECT doc_id,
        |    (STRPOS('0123456789abcdef',
        |            SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |    + STRPOS('0123456789abcdef',
        |             SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
        |      AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 205 THEN 'train'
        |            WHEN bucket < 230 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS idsum
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Scale.splitLabel(col("doc_id").cast("string")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("idsum"))
        .orderBy("split")
    },

    // Stratified sample: exactly 20 docs per language, membership
    // decided by md5-of-id order (stable across engines/reruns/
    // partitionings — rand() sampling has none of those). One shuffle
    // on the stratum key; oracle replays the same window.
    Q("xk4_stratified_sample",
      """SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (
        |    PARTITION BY lang
        |    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin) { (s, d) =>
      Scale.stratifiedSample(t(s, d, "documents"), Seq("lang"),
          col("doc_id"), 20)
        .select(col("lang"), col("doc_id"), col("rn").cast("int").as("rn"))
        .orderBy("lang", "rn")
    },

    // Fixed-size global sample (deterministic reservoir): the 100
    // smallest docs in md5-of-id order. Plans as TakeOrderedAndProject
    // — per-partition top-k, k-row driver merge, no global sort.
    Q("xk5_reservoir_sample",
      """SELECT doc_id, lang FROM documents
        |ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
        |LIMIT 100""".stripMargin) { (s, d) =>
      Scale.fixedSample(t(s, d, "documents"), col("doc_id"), 100)
        .select("doc_id", "lang")
    },

    // Token-budget shard packing (pack docs into ~4096-token training
    // shards in doc_id order): the oracle is the NAIVE partition-less
    // running sum — the scale-safe two-level scan in Scale.packShards
    // must land every doc in the identical shard. Per-shard rollup
    // keeps the gate row count at n_tokens/4096.
    Q("xk6_pack_shards",
      """WITH d AS (
        |  SELECT doc_id, LEN(LIST_FILTER(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> ''))
        |    AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS c0
        |  FROM d
        |)
        |SELECT CAST(FLOOR(c0 / 4096.0) AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          size(graft.functions.TextFns.tokens(col("text"))).as("n_tok"))
      Scale.packShards(docs, "doc_id", "n_tok", budget = 4096)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard")
    }
  )
}

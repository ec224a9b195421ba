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
    }
  )
}

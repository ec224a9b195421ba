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
    }
  )
}

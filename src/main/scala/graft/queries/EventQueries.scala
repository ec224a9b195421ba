package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Events
import T._

/** Event-stream analytics (the xe family): per-key sequential
  * statistics over the `events` log — telemetry-side data-quality
  * detectors. Exactness rides the integer fixed-point discipline
  * (values quantized once, dyadic-α recursions re-floored every step),
  * so even ORDER-DEPENDENT sequential folds hash-gate against
  * recursive-CTE replays.
  */
object EventQueries {

  /** The xe1 EWMA replay, parameterized by a final-rollup restriction
    * so the qs23 stream face shares the ORACLE TEXT VERBATIM (the
    * c4OracleSql discipline — contracts cannot drift): the trajectory
    * is computed globally; `finalWhere` restricts only the emitted
    * rows (e.g. "AND e.id >= 6000" for the delta slice).
    */
  def ewmaOracleSql(finalWhere: String = ""): String =
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id AS key, event_id AS id,
       |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v2,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn
       |  FROM events
       |  WHERE value IS NOT NULL AND user_id IS NOT NULL
       |    AND ts IS NOT NULL
       |), rec(key, rn, s) AS (
       |  SELECT key, rn, v2 FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT e.key, e.rn,
       |    CAST(FLOOR((e.v2 + 3 * r.s) / 4.0) AS BIGINT)
       |  FROM rec r JOIN ev e ON e.key = r.key AND e.rn = r.rn + 1
       |)
       |SELECT e.id, e.key, e.v2, r.s AS ewma_e2,
       |  CASE WHEN e.rn > 1 AND ABS(e.v2 - rp.s) > 16000
       |    THEN 1 ELSE 0 END AS anom
       |FROM ev e
       |JOIN rec r ON r.key = e.key AND r.rn = e.rn
       |LEFT JOIN rec rp ON rp.key = e.key AND rp.rn = e.rn - 1
       |WHERE TRUE $finalWhere
       |ORDER BY e.id""".stripMargin

  /** The xe7 CUSUM replay, parameterized like [[ewmaOracleSql]] so the
    * qs29 stream face shares the ORACLE TEXT VERBATIM. The recursion
    * carries BOTH the post-reset sums (spc/snc, what the next step
    * folds from) and the pre-reset emissions (spe/sne, what the row
    * shows); the sum texts repeat across carry/emit/alarm exactly as
    * in the operator's lambda.
    */
  def cusumOracleSql(finalWhere: String = "", kE2: Long = 4000L,
      hE2: Long = 30000L): String = {
    val sp1 = s"GREATEST(CAST(0 AS BIGINT), r.spc + (e.v2 - r.v1 - $kE2))"
    val sn1 = s"GREATEST(CAST(0 AS BIGINT), r.snc + (r.v1 - e.v2 - $kE2))"
    val al = s"($sp1 > $hE2 OR $sn1 > $hE2)"
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id AS key, event_id AS id,
       |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v2,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn
       |  FROM events
       |  WHERE value IS NOT NULL AND user_id IS NOT NULL
       |    AND ts IS NOT NULL
       |), rec(key, rn, v1, spc, snc, spe, sne, alarm) AS (
       |  SELECT key, rn, v2, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT e.key, e.rn, r.v1,
       |    CASE WHEN $al THEN CAST(0 AS BIGINT) ELSE $sp1 END,
       |    CASE WHEN $al THEN CAST(0 AS BIGINT) ELSE $sn1 END,
       |    $sp1, $sn1, CASE WHEN $al THEN 1 ELSE 0 END
       |  FROM rec r JOIN ev e ON e.key = r.key AND e.rn = r.rn + 1
       |)
       |SELECT e.id, e.key, e.v2, r.spe AS sp, r.sne AS sn, r.alarm
       |FROM ev e JOIN rec r ON r.key = e.key AND r.rn = e.rn
       |WHERE TRUE $finalWhere
       |ORDER BY e.id""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // xe7: two-sided CUSUM control chart (Page 1954) per user over
    // (ts, id) order — the small-shift drift detector beside xe1's
    // EWMA: s± accumulate deviations beyond a k = 40.00 slack from the
    // key's first value, alarm when a sum crosses h = 300.00, then
    // reset (alarm trains, not one saturated flag; ~3-4% of events
    // alarm on the driver corpus at both SFs — both branches fire).
    // Pure integer max/add/compare on e2 units — NO division anywhere,
    // tighter than even xe1's dyadic floor. tsBuckets = 8: the gated
    // entry runs the bounded hot-key-safe fold, proven == one-shot by
    // the segment-resumption contract.
    Q("xe7_cusum_drift", cusumOracleSql()) { (s, d) =>
      Events.cusumAnomalies(t(s, d, "events"), "user_id", "ts",
          "event_id", "value", kE2 = 4000L, hE2 = 30000L,
          tsBuckets = 8)
        .orderBy("id")
    },

    // xe1: EWMA control chart (Roberts 1959) per user over (ts,
    // event_id) order — α = 1/4 integer fixed-point recursion
    // s ← floor((v + 3s)/4.0) on e2-quantized values; anomaly iff the
    // new value deviates > 160.00 from the pre-observation average
    // (~1.6% of events on the driver corpus — the rule FIRES and
    // non-anomalous rows dominate, the xt15 both-branches discipline).
    // The oracle replays the whole trajectory with a per-key
    // recursive CTE walking rn → rn+1 — two independent
    // implementations of a sequential fold.
    // tsBuckets = 8: the gated entry runs the BOUNDED fold (per-task
    // arrays hold a key's events per ts-slice, not its whole history —
    // the r14 verdict's hot-key fix), proven == one-shot by the
    // segment-resumption contract and gated here against the same
    // whole-trajectory recursive-CTE oracle.
    Q("xe1_ewma_anomaly", ewmaOracleSql()) { (s, d) =>
      Events.ewmaAnomalies(t(s, d, "events"), "user_id", "ts",
          "event_id", "value", threshE2 = 16000L, tsBuckets = 8)
        .orderBy("id")
    },

    // xe2: weekly cohort retention — users cohorted by first activity
    // week, counted per (cohort, offset) cell. Weeks are pure integer
    // epoch arithmetic (day DIV 7 of epoch-µs DIV 86400e6) — no
    // engine week-start semantics anywhere.
    Q("xe2_cohort_retention", cohortOracleSql) { (s, d) =>
      Events.cohortRetention(t(s, d, "events"), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    },

    // qs25: streaming cohort retention — the xe2 stream face over the
    // evolving distinct-(user, week) activity store. Distinct-union
    // is commutative, the cohort a min over the final set: the
    // order-free class (qs21/qs22) — ANY chunking in ANY order ==
    // one-shot xe2, oracle shared VERBATIM. State ∝ users × active
    // weeks (calendar-bounded).
    Q("qs25_stream_cohort", cohortOracleSql) { (s, d) =>
      val ev = t(s, d, "events")
      graft.streaming.Streams.cohortChunked(
        ev.where(col("event_id") >= 6000),
        ev.where(col("event_id") < 6000),
        Seq(7000L, 8000L))
    },

    // xe3: ordered conversion funnel view → click → purchase with a
    // 24h per-step window — step anchors are struct-min first
    // occurrences in (ts, id) order (ts ties break on id identically
    // in both engines); 150 → 60 → 25 users on the sf0.01 corpus, a
    // genuinely narrowing funnel (without the window every user
    // completes it — vacuous).
    Q("xe3_funnel", funnelOracleSql) { (s, d) =>
      Events.funnel(t(s, d, "events"), "user_id", "ts", "event_id",
          "event_type", Seq("view", "click", "purchase"),
          windowUs = 86400000000L)
        .orderBy("step")
    },

    // xe4: event-type Markov transition matrix — per-user consecutive
    // type bigrams under (ts, id) order, corpus rollup with per-source
    // totals (P(dst|src) is a ratio of exact integers the reader
    // forms; no stored float). The behavioral fingerprint beside the
    // funnel.
    Q("xe4_type_transitions", transitionsOracleSql) { (s, d) =>
      Events.typeTransitions(t(s, d, "events"), "user_id", "ts",
          "event_id", "event_type")
        .orderBy("src", "dst")
    },

    // qs27: streaming Markov transitions — the xe4 stream face on the
    // qs23/qs24 monotone-resume skeleton: per-key carried LAST-event
    // state (one small struct per key forever) bridges chunk
    // boundaries (the carried row pairs with the chunk's first event),
    // per-chunk bigram deltas fold into the types²-sized cell matrix
    // (commutative sum). Shares xe4's oracle text VERBATIM — the hash
    // match proves boundary-pair resumption across chunks == the
    // one-shot corpus-wide lag derivation.
    Q("qs27_stream_transitions", transitionsOracleSql) { (s, d) =>
      graft.streaming.Streams.transitionsChunked(
        t(s, d, "events"), Seq(3000L, 6000L, 8000L))
        .orderBy("src", "dst")
    },

    // qs24: streaming funnel — the xe3 stream face: per-key automaton
    // state (step, anchor) folded over event_id-ordered chunks (the
    // qs23 monotone contract); scanning in order makes the first
    // qualifying event the min-anchor, so the automaton equals the
    // one-shot relational derivation AND shares xe3's oracle text
    // VERBATIM. The gate proves automaton == relational == SQL.
    Q("qs24_stream_funnel", funnelOracleSql) { (s, d) =>
      val ev = t(s, d, "events")
      graft.streaming.Streams.funnelChunked(
        ev.where(col("event_id") >= 6000),
        ev.where(col("event_id") < 6000),
        Seq("view", "click", "purchase"), Seq(7000L, 8000L))
    },

    // qs23: streaming EWMA — the xe1 stream face on the qs19/qs20
    // evolving-store skeleton: corpus = events before id 6000 seeds
    // the per-key scalar store, the delta folds through it in three
    // event_id-ordered chunks (event_id order IS ts order in the
    // driver log, so the monotone-arrival contract holds). The oracle
    // is the xe1 replay VERBATIM (ewmaOracleSql), delta-restricted —
    // the hash match proves chunked resumption from carried state
    // equals the one-shot trajectory.
    Q("qs23_stream_ewma", ewmaOracleSql("AND e.id >= 6000")) { (s, d) =>
      val ev = t(s, d, "events")
      graft.streaming.Streams.ewmaChunked(
        ev.where(col("event_id") >= 6000),
        ev.where(col("event_id") < 6000),
        Seq(7000L, 8000L))
    },

    // qs29: streaming CUSUM — the xe7 stream face on the qs23
    // skeleton (corpus-seeded per-key store, event_id-ordered chunks
    // under the monotone-arrival contract; state = three BIGINTs per
    // key). Oracle = the xe7 replay VERBATIM, delta-restricted — the
    // hash match proves chunked resumption of the max/add recursion
    // (including post-alarm resets straddling chunk boundaries)
    // equals the one-shot trajectory.
    Q("qs29_stream_cusum", cusumOracleSql("AND e.id >= 6000")) { (s, d) =>
      val ev = t(s, d, "events")
      graft.streaming.Streams.cusumChunked(
        ev.where(col("event_id") >= 6000),
        ev.where(col("event_id") < 6000),
        Seq(7000L, 8000L))
    },

    // xe6: per-user inter-event-gap quantiles — the burstiness screen
    // beside xe5 (and the distribution xe5's 4h gap was calibrated
    // from). Discrete-element quantiles by the PINNED float-free rank
    // convention ceil(q·n) = (n+1) DIV 2 / (9n+9) DIV 10 over gaps
    // sorted ascending — NO interpolating MEDIAN/PERCENTILE in either
    // engine (their conventions differ); a rank inside a run of equal
    // gaps selects the same value whatever the intra-run order.
    Q("xe6_gap_quantiles",
      """WITH e AS (
        |  SELECT user_id AS key, event_id AS id, EPOCH_US(ts) AS tsu
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), g AS (
        |  SELECT key,
        |    tsu - LAG(tsu) OVER (PARTITION BY key ORDER BY tsu, id)
        |      AS gap
        |  FROM e
        |), r AS (
        |  SELECT key, gap,
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY gap) AS rn,
        |    COUNT(*) OVER (PARTITION BY key) AS n
        |  FROM g WHERE gap IS NOT NULL
        |)
        |SELECT key AS user_id, CAST(MAX(n) AS BIGINT) AS n_gaps,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS p50_gap_us,
        |  MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN gap END)
        |    AS p90_gap_us,
        |  MAX(gap) AS max_gap_us
        |FROM r GROUP BY key ORDER BY user_id""".stripMargin) { (s, d) =>
      Events.gapQuantiles(t(s, d, "events"), "user_id", "ts",
          "event_id")
        .select(col("key").as("user_id"), col("n_gaps"),
          col("p50_gap_us"), col("p90_gap_us"), col("max_gap_us"))
        .orderBy("user_id")
    },

    // xe5: gap-based sessionization rollup — per user, sessions split
    // at > 4h gaps under (ts, id) order (4h ≈ the corpus p25 gap, so
    // BOTH branches fire: ~30% of consecutive pairs stay in-session).
    // Pure integer epoch-µs arithmetic and counts. The window-based
    // batch derivation here and the qs26 per-key automaton are two
    // independent implementations gated against this one oracle.
    Q("xe5_session_stats", sessionOracleSql) { (s, d) =>
      Events.sessionStats(t(s, d, "events"), "user_id", "ts",
          "event_id", gapUs = 14400000000L)
        .select(col("key").as("user_id"), col("n_sessions"),
          col("n_events"), col("max_session_events"))
        .orderBy("user_id")
    },

    // qs26: the SAME session rollup through the REAL streaming path —
    // flatMapGroupsWithState (the §2.10 arbitrary-state primitive,
    // previously spec-only) with O(1) per-key automaton state under
    // the RocksDB store, ts-range file slices, 2 per trigger, append
    // sink of per-batch emissions, final = max-n_events emission per
    // key. Shares xe5's oracle text VERBATIM — the hash match proves
    // automaton-resumption across micro-batches == the declarative
    // window derivation == the SQL replay.
    // qs31: the SAME session rollup through Spark 4's
    // transformWithState (the StatefulProcessor successor API to
    // flatMapGroupsWithState — typed named-state handles, mandatory
    // RocksDB): third independent implementation against the one
    // sessionOracleSql (window derivation xe5 / fMGWS qs26 /
    // StatefulProcessor qs31).
    Q("qs31_stream_session_tws", sessionOracleSql) { (s, d) =>
      val ev = t(s, d, "events")
      val in = java.nio.file.Files.createTempDirectory("graft_qs31_in")
      val out = java.nio.file.Files.createTempDirectory("graft_qs31_out")
      try {
        graft.streaming.Streams.runSessionStatsStreamTws(s, ev,
            in.toString, out.resolve("res").toString,
            out.resolve("_ck").toString, gapUs = 14400000000L)
          .orderBy("user_id")
      } finally {
        try {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(in)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    },

    Q("qs26_stream_session_fmgws", sessionOracleSql) { (s, d) =>
      val ev = t(s, d, "events")
      val in = java.nio.file.Files.createTempDirectory("graft_qs26_in")
      val out = java.nio.file.Files.createTempDirectory("graft_qs26_out")
      try {
        graft.streaming.Streams.runSessionStatsStream(s, ev,
            in.toString, out.resolve("res").toString,
            out.resolve("_ck").toString, gapUs = 14400000000L)
          .orderBy("user_id")
      } finally {
        // drop the events copy eagerly (the qs4b hygiene); the sink
        // stays for the caller's materialization
        try {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(in)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  )

  /** The xe4/qs27 transition-matrix replay — shared VERBATIM by the
    * batch entry and the chunked stream face.
    */
  def transitionsOracleSql: String =
    """WITH e AS (
      |  SELECT user_id AS key, event_type AS t, ts, event_id AS id
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL
      |), p AS (
      |  SELECT key, t,
      |    LAG(t) OVER (PARTITION BY key ORDER BY ts, id) AS prev
      |  FROM e
      |), tr AS (
      |  SELECT prev AS src, t AS dst, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM p WHERE prev IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT tr.src, tr.dst, tr.n, tot.src_total
      |FROM tr JOIN (
      |  SELECT src, CAST(SUM(n) AS BIGINT) AS src_total
      |  FROM tr GROUP BY src) tot USING (src)
      |ORDER BY src, dst""".stripMargin

  /** The xe5/qs26 session-stats replay — shared VERBATIM by the batch
    * entry and the flatMapGroupsWithState stream face.
    */
  def sessionOracleSql: String =
    """WITH e AS (
      |  SELECT user_id AS key, event_id AS id, EPOCH_US(ts) AS tsu
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), f AS (
      |  SELECT key, id, tsu,
      |    CASE WHEN LAG(tsu) OVER (PARTITION BY key ORDER BY tsu, id)
      |        IS NULL
      |      OR tsu - LAG(tsu) OVER (PARTITION BY key ORDER BY tsu, id)
      |        > 14400000000
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |), s AS (
      |  SELECT key, SUM(new_s) OVER (PARTITION BY key
      |    ORDER BY tsu, id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f
      |), per AS (
      |  SELECT key, sid, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM s GROUP BY 1, 2
      |)
      |SELECT key AS user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n) AS BIGINT) AS n_events,
      |  CAST(MAX(n) AS BIGINT) AS max_session_events
      |FROM per GROUP BY key ORDER BY user_id""".stripMargin

  /** The xe2/qs25 cohort replay — shared VERBATIM by the batch entry
    * and the order-free stream face.
    */
  def cohortOracleSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id AS key,
      |    EPOCH_US(ts) // 86400000000 // 7 AS week
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), c AS (
      |  SELECT key, MIN(week) AS cohort_week FROM uw GROUP BY key
      |)
      |SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM uw JOIN c USING (key)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The xe3/qs24 funnel replay — shared VERBATIM by the batch entry
    * and the stream face (the ewmaOracleSql discipline).
    */
  def funnelOracleSql: String =
    """WITH e AS (
        |  SELECT user_id AS key, event_type AS t, ts, event_id AS id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), s1 AS (
        |  SELECT key, MIN((ts, id)) AS k FROM e WHERE t = 'view'
        |  GROUP BY key
        |), s2 AS (
        |  SELECT e.key, MIN((e.ts, e.id)) AS k
        |  FROM e JOIN s1 ON s1.key = e.key
        |  WHERE e.t = 'click' AND (e.ts, e.id) > s1.k
        |    AND EPOCH_US(e.ts) - EPOCH_US(s1.k[1]) <= 86400000000
        |  GROUP BY e.key
        |), s3 AS (
        |  SELECT e.key, MIN((e.ts, e.id)) AS k
        |  FROM e JOIN s2 ON s2.key = e.key
        |  WHERE e.t = 'purchase' AND (e.ts, e.id) > s2.k
        |    AND EPOCH_US(e.ts) - EPOCH_US(s2.k[1]) <= 86400000000
        |  GROUP BY e.key
        |)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS etype,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
        |  UNION ALL SELECT 3, 'purchase',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
        |) ORDER BY step""".stripMargin
}

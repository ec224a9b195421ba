package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics operators (the telemetry face of the
  * pipeline-quality family): per-key sequential statistics over a
  * totally-ordered event log — the data-quality drift/spike detectors
  * a production ingest pipeline runs beside its batch filters.
  */
object Events {

  /** EWMA control chart (xe1; Roberts 1959, Technometrics — the
    * classic drift/spike detector): per key, an exponentially-weighted
    * moving average of the metric under the (ts, id) total order;
    * event i is an ANOMALY when its value deviates from the
    * PRE-OBSERVATION average (the state before folding event i in) by
    * more than `threshE2`.
    *
    * Exactness — integer fixed-point recursion, the xg1 discipline
    * applied to a sequential fold: values quantize ONCE to e2 units
    * (`floor(v·100 + 0.5)`, the house quantizer), and with α = 1/4 the
    * update is `s ← floor((v + 3·s) / 4.0)` — the division by 4 is
    * exact binary scaling, the floor re-pins every step to an integer,
    * so the whole trajectory is integer-exact and the operator
    * hash-gates against a from-scratch recursive-CTE replay. The first
    * event of a key seeds the state (never an anomaly). Magnitude
    * bound (r14 advice): "exact binary scaling" holds only while
    * |v + 3·s| < 2^53 — beyond that the BIGINT→DOUBLE cast inside the
    * division drops low bits SILENTLY (both engines drop the same
    * bits, so the gate stays green, but the integer-exact invariant is
    * gone). Since s is a convex combination of past v's, the invariant
    * holds whenever |v2| ≲ 2^51 ≈ 2.25e15 — i.e. raw metric values up
    * to ~2.2e13 at the e2 quantization; clamp at ingest if a feed can
    * exceed that.
    *
    * Scale shape: one shuffle on the key, then a NARROW per-key fold —
    * `array_sort(collect_list(...))` + `aggregate` run inside the
    * codegen'd aggregation, no window over the full corpus, no
    * driver-side state. Per-key state is the key's own history; at
    * 100 TB the fold runs per time-partition with the (ewma, ts)
    * scalar carried across partition boundaries — resuming a
    * sequential fold from carried state is exact under ordered
    * chunking (the qs19/qs20 monotone-arrival contract; the stream
    * face applies it per batch).
    *
    * Output: one row per event — (id, key, v2, ewma_e2, anom) with
    * ewma_e2 the POST-observation state (so the last row per key IS
    * the carry-over state) and anom ∈ {0, 1}.
    *
    * `tsBuckets` bounds the per-task fold (r14 verdict item 3): with
    * tsBuckets = 1 a key's ENTIRE history lands in one in-task array —
    * fine for bounded keys, a hot-key OOM at 100 TB. With
    * tsBuckets = B the event log is cut into B ts-RANGE segments
    * (equal slices of [min ts, max ts] — a bucket is a function of ts
    * alone, so per-key (ts, id) order is preserved across the cut) and
    * folded SEQUENTIALLY through [[ewmaIngest]] from the carried
    * per-key scalar store; resuming a sequential fold from carried
    * state under (ts, id)-monotone chunking is EXACT (the qs19/qs20
    * contract the qs23 stream face already gates), so the union of
    * segment outputs IS the one-shot trajectory — spec-asserted — and
    * the per-task array is bounded by a key's events per ts-slice.
    */
  def ewmaAnomalies(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, threshE2: Long = 16000L,
      tsBuckets: Int = 1): DataFrame = {
    require(tsBuckets >= 1, s"ewmaAnomalies: tsBuckets=$tsBuckets")
    val empty =
      prepareEwmaStore(events.limit(0), keyCol, tsCol, idCol, valCol)
    if (tsBuckets == 1)
      ewmaIngest(events, empty, keyCol, tsCol, idCol, valCol,
        threshE2).result
    else {
      val ev = events
        .where(col(valCol).isNotNull && col(keyCol).isNotNull &&
          col(tsCol).isNotNull)
        .localCheckpoint(true) // read once per segment
      val mm = ev.agg(min(expr(s"unix_micros($tsCol)")),
        max(expr(s"unix_micros($tsCol)"))).head()
      if (mm.isNullAt(0)) // no non-null events: empty fold
        ewmaIngest(ev, empty, keyCol, tsCol, idCol, valCol,
          threshE2).result
      else {
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        // ceil span so the last edge is > hi (right-open segments)
        val w = math.max(1L, (hi - lo) / tsBuckets + 1L)
        var st = empty
        val parts = (0 until tsBuckets).map { b =>
          val (slo, shi) = (lo + b * w, lo + (b + 1) * w)
          val seg = ev.where(expr(s"unix_micros($tsCol)") >= slo &&
            expr(s"unix_micros($tsCol)") < shi)
          val ing = ewmaIngest(seg, st, keyCol, tsCol, idCol, valCol,
            threshE2)
          // stats reset at the loop boundary (the xd18 lesson): each
          // segment's full_outer store join MULTIPLIES size estimates
          // and localCheckpoint preserves the product, so by ~40
          // segments the BigInt stats math blows up at checkpoint time
          st = resetStoreStats(ing.next)
          ing.result
        }
        parts.reduce(_.unionAll(_))
      }
    }
  }

  /** Two-sided CUSUM control chart (xe7; Page 1954, Biometrika — the
    * classic SMALL-SHIFT detector beside xe1's EWMA: where EWMA flags
    * single large deviations, CUSUM accumulates many small ones, so a
    * persistent drift of less than one threshold's worth per event
    * still alarms once its sum crosses h): per key, under the (ts, id)
    * total order, with the key's FIRST value as the reference level,
    *
    *   s⁺ ← max(0, s⁺ + (v − v₁ − k))   (upward drift)
    *   s⁻ ← max(0, s⁻ + (v₁ − v − k))   (downward drift)
    *
    * alarm when s⁺ > h or s⁻ > h, then BOTH sums reset to 0 (the
    * standard post-alarm restart, so a long drift produces a alarm
    * train rather than one saturated flag). k is the slack per event
    * (drifts smaller than k/event never alarm), h the decision
    * interval.
    *
    * Exactness: the xe1 discipline with NO division anywhere — values
    * quantize once to e2 units, the recursion is max/add/compare on
    * BIGINTs, so the whole trajectory is integer-exact and hash-gates
    * against a from-scratch recursive-CTE replay. First event of a key
    * seeds v₁ (never an alarm, sums start 0). Overflow bound: |s±| ≤
    * h + |v − v₁| + k post-reset, so BIGINT is unreachable for any
    * e2-quantized feed.
    *
    * Scale shape: identical to [[ewmaAnomalies]] — one shuffle on the
    * key, a narrow per-key fold, `tsBuckets` bounding the per-task
    * array by ts-range segmentation through the carried store
    * (segment-resume == one-shot under the qs23 monotone contract).
    *
    * Output: one row per event — (id, key, v2, sp, sn, alarm) with
    * sp/sn the PRE-RESET post-observation sums (so the alarm row shows
    * the crossing value; the carried state is the post-reset pair).
    */
  def cusumAnomalies(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, kE2: Long = 4000L,
      hE2: Long = 30000L, tsBuckets: Int = 1): DataFrame = {
    require(tsBuckets >= 1, s"cusumAnomalies: tsBuckets=$tsBuckets")
    val empty = CusumStore(events.select(col(keyCol).as("key"),
      lit(0L).as("sp"), lit(0L).as("sn"), lit(0L).as("v1"))
      .limit(0).localCheckpoint(true))
    if (tsBuckets == 1)
      cusumIngest(events, empty, keyCol, tsCol, idCol, valCol, kE2,
        hE2).result
    else {
      val ev = events
        .where(col(valCol).isNotNull && col(keyCol).isNotNull &&
          col(tsCol).isNotNull)
        .localCheckpoint(true) // read once per segment
      val mm = ev.agg(min(expr(s"unix_micros($tsCol)")),
        max(expr(s"unix_micros($tsCol)"))).head()
      if (mm.isNullAt(0))
        cusumIngest(ev, empty, keyCol, tsCol, idCol, valCol, kE2,
          hE2).result
      else {
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val w = math.max(1L, (hi - lo) / tsBuckets + 1L)
        var st = empty
        val parts = (0 until tsBuckets).map { b =>
          val (slo, shi) = (lo + b * w, lo + (b + 1) * w)
          val seg = ev.where(expr(s"unix_micros($tsCol)") >= slo &&
            expr(s"unix_micros($tsCol)") < shi)
          val ing = cusumIngest(seg, st, keyCol, tsCol, idCol, valCol,
            kE2, hE2)
          // stats reset at the loop boundary (the xd18/xe1 lesson)
          st = resetCusumStoreStats(ing.next)
          ing.result
        }
        parts.reduce(_.unionAll(_))
      }
    }
  }

  /** Evolving per-key CUSUM state (qs29): one row per key ever seen —
    * `(key, sp, sn, v1)`, the post-reset sums and the reference level.
    * The ENTIRE stream state is three BIGINTs per key.
    */
  final case class CusumStore private[operators] (state: DataFrame)

  /** Fresh-stats rebuild for store-resumption loops (see
    * [[resetStoreStats]]).
    */
  private[graft] def resetCusumStoreStats(s: CusumStore): CusumStore =
    CusumStore(org.apache.spark.sql.graftbridge.Bridge
      .freshStats(s.state))

  final case class CusumIngest(result: DataFrame, next: CusumStore)

  /** Seed the store by folding `corpus` from empty state. */
  def prepareCusumStore(corpus: DataFrame, keyCol: String,
      tsCol: String, idCol: String, valCol: String,
      kE2: Long = 4000L, hE2: Long = 30000L): CusumStore = {
    val empty = CusumStore(corpus.select(col(keyCol).as("key"),
      lit(0L).as("sp"), lit(0L).as("sn"), lit(0L).as("v1"))
      .limit(0).localCheckpoint(true))
    if (corpus.isEmpty) empty
    else cusumIngest(corpus, empty, keyCol, tsCol, idCol, valCol, kE2,
      hE2).next
  }

  /** Fold one batch through the CUSUM store (the qs23 monotone-arrival
    * contract, as [[ewmaIngest]]): returns the batch's per-event rows
    * and the advanced store.
    */
  def cusumIngest(batch: DataFrame, store: CusumStore, keyCol: String,
      tsCol: String, idCol: String, valCol: String,
      kE2: Long = 4000L, hE2: Long = 30000L): CusumIngest = {
    val q = batch
      .where(col(valCol).isNotNull && col(keyCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        col(tsCol).as("__ts"),
        floor(col(valCol) * 100 + 0.5).cast(LongType).as("v2"))
    // the recursion's three faces share these exact texts (the lambda
    // binds no intermediates, so the sums appear in emit, carry, alarm)
    val sp1 = s"GREATEST(CAST(0 AS BIGINT), acc.sp + (x.v2 - acc.v1 - $kE2))"
    val sn1 = s"GREATEST(CAST(0 AS BIGINT), acc.sn + (acc.v1 - x.v2 - $kE2))"
    val al = s"($sp1 > $hE2 OR $sn1 > $hE2)"
    val folded = q.groupBy("key")
      .agg(array_sort(collect_list(struct(col("__ts"), col("id"),
        col("v2")))).as("__xs"))
      .join(store.state.select(col("key"), col("sp").as("__sp0"),
        col("sn").as("__sn0"), col("v1").as("__v10")), Seq("key"),
        "left")
      .select(col("key"), expr(
        s"""aggregate(__xs,
           |  named_struct('v1', __v10,
           |    'sp', coalesce(__sp0, CAST(0 AS BIGINT)),
           |    'sn', coalesce(__sn0, CAST(0 AS BIGINT)), 'out',
           |    CAST(array() AS array<struct<
           |      id:bigint,v2:bigint,sp:bigint,sn:bigint,alarm:int>>)),
           |  (acc, x) -> CASE WHEN acc.v1 IS NULL THEN named_struct(
           |      'v1', x.v2, 'sp', CAST(0 AS BIGINT),
           |      'sn', CAST(0 AS BIGINT),
           |      'out', array_append(acc.out, named_struct(
           |        'id', x.id, 'v2', x.v2, 'sp', CAST(0 AS BIGINT),
           |        'sn', CAST(0 AS BIGINT), 'alarm', 0)))
           |    ELSE named_struct(
           |      'v1', acc.v1,
           |      'sp', CASE WHEN $al THEN CAST(0 AS BIGINT)
           |        ELSE $sp1 END,
           |      'sn', CASE WHEN $al THEN CAST(0 AS BIGINT)
           |        ELSE $sn1 END,
           |      'out', array_append(acc.out, named_struct(
           |        'id', x.id, 'v2', x.v2, 'sp', $sp1, 'sn', $sn1,
           |        'alarm', CASE WHEN $al THEN 1 ELSE 0 END)))
           |    END,
           |  acc -> acc)""".stripMargin.replace("\n", " "))
        .as("__f"))
      .localCheckpoint(true) // rows AND next-state read it
    val rows = folded
      .select(col("key"), explode(col("__f.out")).as("o"))
      .select(col("o.id").as("id"), col("key"), col("o.v2").as("v2"),
        col("o.sp").as("sp"), col("o.sn").as("sn"),
        col("o.alarm").as("alarm"))
    val next = store.state
      .withColumnRenamed("sp", "__osp").withColumnRenamed("sn", "__osn")
      .withColumnRenamed("v1", "__ov1")
      .join(folded.select(col("key"), col("__f.sp").as("__nsp"),
        col("__f.sn").as("__nsn"), col("__f.v1").as("__nv1")),
        Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("__nsp"), col("__osp")).as("sp"),
        coalesce(col("__nsn"), col("__osn")).as("sn"),
        coalesce(col("__nv1"), col("__ov1")).as("v1"))
      .localCheckpoint(true)
    CusumIngest(rows, CusumStore(next))
  }

  /** Weekly cohort-retention matrix (xe2) — the product-analytics
    * staple: users cohorted by their FIRST activity week, then counted
    * per (cohort, week-offset) cell. Weeks are pure integer epoch
    * arithmetic (`day = epoch_µs div 86400e6`, `week = day div 7` —
    * no engine-specific DATE_TRUNC/week-start semantics anywhere), so
    * the matrix hash-gates exactly.
    *
    * Scale shape: one distinct over (user, week) — map-side combined
    * — then a users-sized min-aggregate broadcast back; cells are a
    * weeks² rollup. Nothing corpus-sized leaves the first shuffle.
    *
    * Output: (cohort_week, week_offset, n_users).
    */
  def cohortRetention(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    cohortCounts(prepareCohortStore(events, keyCol, tsCol))

  /** Ordered conversion funnel (xe3) — the other product-analytics
    * staple, and a data-pipeline audit tool (how many documents pass
    * stage A then B then C within a window): per key, step i+1 counts
    * only if an event of its type occurs STRICTLY AFTER the step-i
    * anchor in the (ts, id) total order AND within `windowUs` of it;
    * each step's anchor is the EARLIEST qualifying event
    * (min(struct(ts, id)) — the struct-min first-occurrence idiom, so
    * ts ties break on id identically in both engines).
    *
    * Scale shape: one filtered min-aggregate + one broadcast-joinable
    * (users-sized) frame per step — steps are few and fixed; no
    * per-user sequence materialization.
    *
    * Output: (step, etype, n_users) — n_users non-increasing in step.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Seq[String],
      windowUs: Long = 86400000000L): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val e = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(idCol).as("id"))
      .localCheckpoint(true) // read once per step
    var anchors = e.where(col("t") === steps.head)
      .groupBy("key")
      .agg(min(struct(col("ts"), col("id"))).as("k"))
      .localCheckpoint(true)
    var out = anchors.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), lit(steps.head).as("etype"),
        col("n_users"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      anchors = e.where(col("t") === st)
        .join(anchors.select(col("key"), col("k").as("__prev")), "key")
        .where(struct(col("ts"), col("id")) > col("__prev") &&
          expr("unix_micros(ts)") - expr("unix_micros(__prev.ts)")
            <= windowUs)
        .groupBy("key")
        .agg(min(struct(col("ts"), col("id"))).as("k"))
        .localCheckpoint(true)
      out = out.unionAll(anchors.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2).as("step"), lit(st).as("etype"),
          col("n_users")))
    }
    out
  }

  /** Per-key session statistics (xe5) — gap-based sessionization, the
    * telemetry/product-analytics primitive (and the training-data use:
    * interaction-log segmentation before per-session sampling): under
    * the (ts, id) total order a key's events split into sessions at
    * gaps > `gapUs`; the rollup reports per key the session count,
    * event count, and largest session.
    *
    * Exactness: pure integer epoch-µs arithmetic and counts — gap
    * flags, running-sum session ids, and the three aggregates are all
    * BIGINT; ts ties break on id in both engines (the struct-order
    * idiom via ORDER BY tsu, id). Trivially hash-gated.
    *
    * Scale shape: one shuffle on the key; the per-key window is
    * sort-based and SPILLS gracefully (no array materialization —
    * unlike a collect_list fold, a hot key streams through its sorted
    * window run). Sessions never cross keys, so the rollup is
    * map-side combinable. The qs26 stream face computes the same
    * stats with O(1) per-key automaton state — two independent
    * implementations against one oracle.
    *
    * Output: (key, n_sessions, n_events, max_session_events).
    */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapUs: Long = 14400000000L): DataFrame = {
    require(gapUs > 0, s"sessionStats: gapUs=$gapUs")
    import org.apache.spark.sql.expressions.Window
    val e = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        expr(s"unix_micros($tsCol)").as("tsu"))
    val w = Window.partitionBy("key").orderBy("tsu", "id")
    val withSid = e
      .withColumn("new_s",
        when(lag(col("tsu"), 1).over(w).isNull ||
          col("tsu") - lag(col("tsu"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSid.groupBy("key", "sid").agg(count(lit(1)).as("n"))
      .groupBy("key").agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
  }

  /** Per-key inter-event-gap quantiles (xe6) — the burstiness screen
    * a telemetry/interaction-log pipeline runs beside sessionization:
    * a key whose p50 gap is tiny but p90 is huge is bursty (bot
    * screens, rate-anomaly detection, session-gap calibration — xe5's
    * gapUs is picked from exactly this distribution).
    *
    * Exactness: gaps are integer epoch-µs differences under the
    * (ts, id) total order; quantiles are DISCRETE ELEMENTS selected by
    * the PINNED integer rank convention rank_q = ceil(q·n) computed
    * float-free (p50 → (n+1) DIV 2, p90 → (9n+9) DIV 10) over gaps
    * sorted ascending — a rank landing inside a run of equal gap
    * values selects that same value whatever the intra-run order, so
    * the output is total-order-independent and hash-gates. No
    * interpolating MEDIAN/PERCENTILE anywhere (the engines'
    * conventions differ; an explicit rank is the same object in both).
    *
    * Scale shape: one shuffle on the key; the per-key rank window is
    * sort-based and spills gracefully; the rollup is one conditional
    * aggregate — nothing corpus-sized crosses a second shuffle, no
    * driver-side state.
    *
    * Output: (key, n_gaps, p50_gap_us, p90_gap_us, max_gap_us) —
    * keys with fewer than 2 events have no gaps and are absent.
    */
  def gapQuantiles(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ow = Window.partitionBy("key").orderBy("tsu", "id")
    val gaps = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        expr(s"unix_micros($tsCol)").as("tsu"))
      .withColumn("gap", col("tsu") - lag(col("tsu"), 1).over(ow))
      .where(col("gap").isNotNull)
    val rw = Window.partitionBy("key").orderBy("gap")
    gaps
      .withColumn("rn", row_number().over(rw).cast(LongType))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("key")))
      .groupBy("key").agg(
        max(col("n")).as("n_gaps"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("gap")))
          .as("p50_gap_us"),
        max(when(col("rn") === expr("(n * 9 + 9) DIV 10"), col("gap")))
          .as("p90_gap_us"),
        max(col("gap")).as("max_gap_us"))
  }

  /** Evolving cohort store (qs25): the distinct (key, week) activity
    * set. Distinct-union is associative AND commutative and the
    * cohort is a min over it, so the stream face is ORDER-FREE (the
    * qs21/qs22 class — any chunking in any order folds to the
    * one-shot matrix). State ∝ users × active weeks (weeks are
    * calendar-bounded; the honest growth statement).
    */
  final case class CohortStore private[operators] (state: DataFrame)

  def prepareCohortStore(corpus: DataFrame, keyCol: String,
      tsCol: String): CohortStore =
    CohortStore(activityWeeks(corpus, keyCol, tsCol)
      .localCheckpoint(true))

  def cohortIngest(batch: DataFrame, store: CohortStore,
      keyCol: String, tsCol: String): CohortStore =
    CohortStore(store.state
      .unionAll(activityWeeks(batch, keyCol, tsCol))
      .distinct()
      .localCheckpoint(true))

  /** The xe2 rollup off the store. */
  def cohortCounts(store: CohortStore): DataFrame = {
    val uw = store.state.localCheckpoint(true)
    uw.join(uw.groupBy("key").agg(min("week").as("cohort_week")),
        "key")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  private def activityWeeks(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div 86400000000 div 7").as("week"))
      .distinct()

  /** Event-type Markov transition matrix (xe4) — the behavioral
    * fingerprint beside the funnel: per key, consecutive event-type
    * bigrams under the (ts, id) total order, rolled up corpus-wide
    * with the per-source totals (so P(dst|src) = n / src_total is a
    * ratio of exact integers the reader forms, never a stored float).
    *
    * Scale shape: the lag runs in a window PARTITIONED BY KEY (never
    * corpus-wide), then two bounded rollups (types² cells).
    *
    * Output: (src, dst, n, src_total).
    */
  def typeTransitions(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("ts", "id")
    val trans = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(keyCol).as("key"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(idCol).as("id"))
      .withColumn("__prev", lag(col("t"), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("src"), col("t").as("dst"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // cells AND totals read it
    trans
      .join(trans.groupBy("src").agg(sum("n").as("src_total")), "src")
  }

  /** Evolving per-key funnel state (qs24): one row per key —
    * `(key, step, ats, aid)` with `step` the deepest step reached and
    * (ats, aid) its anchor. The whole stream state is one small
    * struct per key.
    */
  final case class FunnelStore private[operators] (state: DataFrame)

  /** Seed the store by folding `corpus` from empty state. */
  def prepareFunnelStore(corpus: DataFrame, keyCol: String,
      tsCol: String, idCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long = 86400000000L)
      : FunnelStore = {
    val empty = FunnelStore(corpus
      .select(col(keyCol).as("key"), lit(0).as("step"),
        col(tsCol).as("ats"), col(idCol).cast(LongType).as("aid"))
      .limit(0).localCheckpoint(true))
    if (corpus.isEmpty) empty
    else funnelIngest(corpus, empty, keyCol, tsCol, idCol, typeCol,
      steps, windowUs)
  }

  /** Fold one batch of events through the funnel automaton (the qs23
    * monotone-arrival contract: chunks must partition the log in
    * (ts, id) order per key). Scanning in order, the first qualifying
    * event IS the min-anchor of the batch-relational [[funnel]], so
    * chunked resumption equals the one-shot derivation exactly.
    */
  def funnelIngest(batch: DataFrame, store: FunnelStore,
      keyCol: String, tsCol: String, idCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long = 86400000000L)
      : FunnelStore = {
    val stepArr = steps.map(s => s"'${s.replace("'", "''")}'")
      .mkString("array(", ", ", ")")
    val q = batch
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(keyCol).as("key"), col(tsCol).as("ts"),
        col(idCol).cast(LongType).as("id"), col(typeCol).as("t"))
    val folded = q.groupBy("key")
      .agg(array_sort(collect_list(struct(col("ts"), col("id"),
        col("t")))).as("__xs"))
      .join(store.state.select(col("key"), col("step").as("__s0"),
        col("ats").as("__a0"), col("aid").as("__i0")), Seq("key"),
        "left")
      .select(col("key"), expr(
        s"""aggregate(__xs,
           |  named_struct('step', coalesce(__s0, 0),
           |    'ats', __a0, 'aid', __i0),
           |  (acc, x) -> CASE WHEN acc.step < ${steps.length}
           |      AND x.t = element_at($stepArr, acc.step + 1)
           |      AND (acc.step = 0 OR (
           |        named_struct('a', x.ts, 'b', x.id)
           |          > named_struct('a', acc.ats, 'b', acc.aid)
           |        AND unix_micros(x.ts) - unix_micros(acc.ats)
           |          <= $windowUs))
           |    THEN named_struct('step', acc.step + 1,
           |      'ats', x.ts, 'aid', x.id)
           |    ELSE acc END)""".stripMargin.replace("\n", " "))
        .as("__f"))
    val next = store.state
      .withColumnRenamed("step", "__os").withColumnRenamed("ats", "__oa")
      .withColumnRenamed("aid", "__oi")
      .join(folded, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("__f.step"), col("__os")).as("step"),
        coalesce(col("__f.ats"), col("__oa")).as("ats"),
        coalesce(col("__f.aid"), col("__oi")).as("aid"))
      .localCheckpoint(true)
    FunnelStore(next)
  }

  /** Per-step user counts from the store — the [[funnel]] output
    * shape: (step, etype, n_users).
    */
  def funnelCounts(store: FunnelStore, steps: Seq[String]): DataFrame = {
    val st = store.state.localCheckpoint(true)
    steps.zipWithIndex.map { case (et, i) =>
      st.where(col("step") >= i + 1)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(et).as("etype"),
          col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Evolving per-key EWMA state (qs23): one row per key ever seen —
    * `(key, s)` with `s` the post-observation average after the last
    * folded event. The ENTIRE stream state is one scalar per key
    * (keys × 16 bytes at any corpus size).
    */
  final case class EwmaStore private[operators] (state: DataFrame)

  /** Rebuild a store frame with fresh DEFAULT statistics — required by
    * any loop that resumes the store across many iterations (segments,
    * micro-batches): the per-iteration full_outer join multiplies
    * size-in-bytes estimates and checkpointing PRESERVES the product
    * (see [[org.apache.spark.sql.graftbridge.Bridge.freshStats]]).
    */
  private[graft] def resetStoreStats(s: EwmaStore): EwmaStore =
    EwmaStore(org.apache.spark.sql.graftbridge.Bridge
      .freshStats(s.state))

  final case class EwmaIngest(result: DataFrame, next: EwmaStore)

  /** Seed the store by folding `corpus` from empty state. */
  def prepareEwmaStore(corpus: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, threshE2: Long = 16000L)
      : EwmaStore = {
    val empty = EwmaStore(corpus.select(col(keyCol).as("key"),
      lit(0L).as("s")).limit(0).localCheckpoint(true))
    if (corpus.isEmpty) empty
    else ewmaIngest(corpus, empty, keyCol, tsCol, idCol, valCol,
      threshE2).next
  }

  /** Fold one batch through the store (the qs19/qs20 monotone-arrival
    * contract: batches must partition the event log in (ts, id) order
    * per key — resuming a sequential fold from carried scalar state is
    * then EXACT, so any such chunking equals the one-shot [[ewmaAnomalies]]
    * trajectory). Returns the batch's per-event rows and the advanced
    * store (keys untouched by the batch carry over unchanged).
    */
  def ewmaIngest(batch: DataFrame, store: EwmaStore, keyCol: String,
      tsCol: String, idCol: String, valCol: String,
      threshE2: Long = 16000L): EwmaIngest = {
    val q = batch
      .where(col(valCol).isNotNull && col(keyCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        col(tsCol).as("__ts"),
        floor(col(valCol) * 100 + 0.5).cast(LongType).as("v2"))
    val folded = q.groupBy("key")
      .agg(array_sort(collect_list(struct(col("__ts"), col("id"),
        col("v2")))).as("__xs"))
      .join(store.state.withColumnRenamed("s", "__s0"), Seq("key"),
        "left")
      .select(col("key"), expr(
        s"""aggregate(__xs,
           |  named_struct('s', coalesce(__s0, CAST(0 AS BIGINT)),
           |    'first', __s0 IS NULL, 'out',
           |    CAST(array() AS
           |      array<struct<id:bigint,v2:bigint,ewma_e2:bigint,anom:int>>)),
           |  (acc, x) -> named_struct(
           |    's', CASE WHEN acc.first THEN x.v2
           |      ELSE CAST(FLOOR((x.v2 + 3 * acc.s) / 4.0) AS BIGINT) END,
           |    'first', false,
           |    'out', array_append(acc.out, named_struct(
           |      'id', x.id,
           |      'v2', x.v2,
           |      'ewma_e2', CASE WHEN acc.first THEN x.v2
           |        ELSE CAST(FLOOR((x.v2 + 3 * acc.s) / 4.0) AS BIGINT) END,
           |      'anom', CASE WHEN NOT acc.first
           |          AND ABS(x.v2 - acc.s) > $threshE2
           |        THEN 1 ELSE 0 END))),
           |  acc -> named_struct('out', acc.out, 's', acc.s))"""
          .stripMargin.replace("\n", " "))
        .as("__f"))
      .localCheckpoint(true) // rows AND next-state read it
    val rows = folded
      .select(col("key"), explode(col("__f.out")).as("o"))
      .select(col("o.id").as("id"), col("key"), col("o.v2").as("v2"),
        col("o.ewma_e2").as("ewma_e2"), col("o.anom").as("anom"))
    val next = store.state.withColumnRenamed("s", "__old")
      .join(folded.select(col("key"), col("__f.s").as("__new")),
        Seq("key"), "full_outer")
      .select(col("key"), coalesce(col("__new"), col("__old")).as("s"))
      .localCheckpoint(true)
    EwmaIngest(rows, EwmaStore(next))
  }
}

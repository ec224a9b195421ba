package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Round-15 scale harness, three legs at `f` and `2f` × bench scale
  * (the R13/R14Stress shape — deterministic work counters graded,
  * cpu informational):
  *
  *  - xg9 capped co-citation: a PLANTED HUB (out-degree n/10) makes
  *    the uncapped wedge volume quadratic across the factor step
  *    (C(H,2) ~ 4×) while the capped operator's measured wedge volume
  *    matches the closed form Σ C(min(outdeg, maxOut), 2) EXACTLY and
  *    stays ~2× (linear) — the r14 verdict's skew bomb, defused and
  *    measured.
  *  - xe1 bounded EWMA fold: ONE key owns 90% of events; the graded
  *    bound is the max per-(key, ts-bucket) event count — the actual
  *    in-task array size — vs the hot key's total (what tsBuckets=1
  *    would materialize), plus bucketed == one-shot row identity at
  *    both factors.
  *  - xg10 SSSP: frontier Bellman-Ford output == an independent FULL
  *    Bellman-Ford replay (relax ALL edges every round) at the same
  *    cap — the frontier-scan optimization proven result-identical at
  *    scale; rounds-to-converge recorded across the step (diameter
  *    physics, not work blowup).
  *  - xd19 prefix-filter candidate law: a corpus where EVERY doc
  *    shares a boilerplate tail (share-any-shingle join = C(n,2) by
  *    construction) — the df-ascending prefixes exclude the hot
  *    shingles, so candidates track the planted near-dup count
  *    (linear, ~2× across the step vs ~4× for the quadratic floor)
  *    and the output equals the planted construction exactly.
  *
  * Writes `SCALE_r15.json`.
  */
object R15Stress {

  def main(args: Array[String]): Unit = {
    val f = args.lift(0).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.LinkedHashMap[String, Any]()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
      })
    def timed[A](body: => A): (A, Double, Double) = {
      Thread.sleep(50)
      val c0 = cpuNs.get; val t0 = System.nanoTime()
      val a = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      (a, sec, (cpuNs.get - c0) / 1e9)
    }
    def dropPersisted(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    // the shared synthetic link-graph derivation (GraphQueries twin)
    def synthEdges(n: Long) = {
      val nodes = spark.range(n).select(col("id"))
      nodes
        .where(pmod(col("id"), lit(97L)) =!= 0L)
        .select(col("id").as("src"),
          explode(sequence(lit(1),
            lit(1) + pmod(col("id"), lit(3L)).cast(IntegerType)))
            .as("j"))
        .select(col("src"),
          pmod(graft.operators.Scale.hashBucket16(
              concat(col("src").cast(StringType), lit(":"),
                col("j").cast(StringType))).cast(LongType),
            lit(n)).as("dst"))
        .where(col("dst") =!= col("src")).distinct()
        .localCheckpoint(true)
    }

    // ---------- xg9 capped co-citation legs ----------
    val MaxOut = 8
    case class CLeg(n: Long, hubDeg: Long, wedgesCapped: Long,
      wedgesClosed: Long, wedgesUncapped: Long, outRows: Long,
      sec: Double, cpu: Double)

    def cocitLeg(n: Long): CLeg = {
      val hubDeg = n / 10
      // base graph + one hub (node 0) linking 1..hubDeg — the skew
      // shape a power-law crawl graph delivers
      val edges = synthEdges(n).unionAll(
          spark.range(1, hubDeg + 1)
            .select(lit(0L).as("src"), col("id").as("dst")))
        .distinct().localCheckpoint(true)
      val (out, sec, cpu) = timed {
        val o = graft.operators.Graph.cocitation(edges, maxOut = MaxOut)
        o.queryExecution.toRdd.count()
        o
      }
      val outRows = out.count()
      // independent replay of the capped wedge volume + closed form
      val capped = edges
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("src").orderBy("dst")))
        .where(col("__rn") <= MaxOut).drop("__rn")
        .localCheckpoint(true)
      val wedgesCapped = capped.as("a").join(capped.as("b"),
          col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
        .count()
      val wedgesClosed = edges.groupBy("src")
        .agg(least(count(lit(1)), lit(MaxOut.toLong)).as("d"))
        .agg(sum(expr("d * (d - 1) DIV 2"))).head.getLong(0)
      val wedgesUncapped = edges.groupBy("src")
        .agg(count(lit(1)).as("d"))
        .agg(sum(expr("d * (d - 1) DIV 2"))).head.getLong(0)
      dropPersisted()
      println(f"[xg9] n=$n%-7d hub=$hubDeg capped=$wedgesCapped " +
        f"closed=$wedgesClosed uncapped=$wedgesUncapped " +
        f"out=$outRows wall=$sec%.2fs cpu=$cpu%.2fs")
      CLeg(n, hubDeg, wedgesCapped, wedgesClosed, wedgesUncapped,
        outRows, sec, cpu)
    }

    val c1 = cocitLeg(5000L * f)
    val c2 = cocitLeg(5000L * 2 * f)
    for ((l, p) <- Seq(c1 -> s"xg9_f$f", c2 -> s"xg9_f${2 * f}")) {
      results += s"${p}_n" -> l.n
      results += s"${p}_hub_outdeg" -> l.hubDeg
      results += s"${p}_wedges_capped" -> l.wedgesCapped
      results += s"${p}_wedges_closed_form" -> l.wedgesClosed
      results += s"${p}_wedges_uncapped" -> l.wedgesUncapped
      results += s"${p}_out_rows" -> l.outRows
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
      require(l.wedgesCapped == l.wedgesClosed,
        s"n=${l.n}: capped wedge volume ${l.wedgesCapped} != closed " +
          s"form ${l.wedgesClosed}")
    }
    val cappedRatio = c2.wedgesCapped.toDouble / c1.wedgesCapped
    val uncappedRatio = c2.wedgesUncapped.toDouble / c1.wedgesUncapped
    results += "xg9_capped_wedge_ratio" -> cappedRatio
    results += "xg9_uncapped_wedge_ratio" -> uncappedRatio
    require(cappedRatio > 1.7 && cappedRatio < 2.3,
      f"capped wedge ratio $cappedRatio%.3f not ~2 (linear)")
    require(uncappedRatio > 3.5,
      f"uncapped wedge ratio $uncappedRatio%.3f not ~4 — the hub " +
        "didn't dominate; the planted skew is broken")
    results += "xg9_cpu_ratio_info" -> (c2.cpu / c1.cpu)

    // ---------- xe1 hot-key bounded fold legs ----------
    val Buckets = 16
    case class ELeg(n: Long, hotTotal: Long, maxTaskArray: Long,
      rows: Long, sec: Double, cpu: Double)

    def ewmaLeg(n: Long): ELeg = {
      // one key owns 90% of events; ts monotone in id (1s apart)
      val ev = spark.range(n).select(
          col("id").as("event_id"),
          expr("timestamp_micros(1700000000000000 + id * 1000000)")
            .as("ts"),
          when(pmod(col("id"), lit(10L)) =!= 0L, lit(7777L))
            .otherwise(col("id")).as("user_id"),
          (pmod(graft.operators.Scale.hashBucket16(
            col("id").cast(StringType)).cast(LongType), lit(10000L))
            / lit(100.0)).as("value"))
        .localCheckpoint(true)
      val (out, sec, cpu) = timed {
        val o = graft.operators.Events.ewmaAnomalies(ev, "user_id",
          "ts", "event_id", "value", tsBuckets = Buckets)
        o.queryExecution.toRdd.count()
        o
      }
      val oneShot = graft.operators.Events.ewmaAnomalies(ev, "user_id",
        "ts", "event_id", "value")
      // bucketed == one-shot, row-identical, at scale
      val d1 = out.exceptAll(oneShot).count()
      val d2 = oneShot.exceptAll(out).count()
      require(d1 == 0 && d2 == 0,
        s"n=$n: bucketed fold diverged from one-shot ($d1/$d2 rows)")
      val rows = out.count()
      // the graded bound: max per-(key, ts-bucket) count == the actual
      // in-task array size (independent replay of the bucket math)
      val mm = ev.agg(min(expr("unix_micros(ts)")),
        max(expr("unix_micros(ts)"))).head
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val w = math.max(1L, (hi - lo) / Buckets + 1L)
      val maxTaskArray = ev
        .groupBy(col("user_id"),
          ((expr("unix_micros(ts)") - lit(lo)) / lit(w))
            .cast(LongType).as("b"))
        .agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head.getLong(0)
      val hotTotal = ev.where(col("user_id") === 7777L).count()
      dropPersisted()
      println(f"[xe1] n=$n%-8d hot=$hotTotal max_task_array=" +
        f"$maxTaskArray rows=$rows wall=$sec%.2fs cpu=$cpu%.2fs")
      ELeg(n, hotTotal, maxTaskArray, rows, sec, cpu)
    }

    val e1 = ewmaLeg(20000L * f)
    val e2 = ewmaLeg(20000L * 2 * f)
    for ((l, p) <- Seq(e1 -> s"xe1_f$f", e2 -> s"xe1_f${2 * f}")) {
      results += s"${p}_n" -> l.n
      results += s"${p}_hot_key_total" -> l.hotTotal
      results += s"${p}_max_task_array" -> l.maxTaskArray
      results += s"${p}_unbounded_would_be" -> l.hotTotal
      results += s"${p}_rows" -> l.rows
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
      // uniform ts ⇒ each bucket holds ~1/Buckets of the hot key
      require(l.maxTaskArray <= l.hotTotal / Buckets + l.hotTotal / 50,
        s"n=${l.n}: max task array ${l.maxTaskArray} not bounded by " +
          s"~hot/$Buckets (${l.hotTotal / Buckets})")
    }
    results += "xe1_bound_ratio_f1" ->
      (e1.maxTaskArray.toDouble / e1.hotTotal)
    results += "xe1_bound_ratio_f2" ->
      (e2.maxTaskArray.toDouble / e2.hotTotal)
    results += "xe1_cpu_ratio_info" -> (e2.cpu / e1.cpu)

    // ---------- xg10 SSSP legs ----------
    case class SLeg(n: Long, edges: Long, rounds: Int, reached: Long,
      sec: Double, cpu: Double)

    def ssspLeg(n: Long): SLeg = {
      val nodes = spark.range(n).select(col("id"))
      val edges = synthEdges(n)
      val nEdges = edges.count()
      val we = edges.withColumn("w",
        lit(1L) + pmod(graft.operators.Scale.hashBucket16(
          concat(lit("w:"), col("src").cast(StringType), lit(":"),
            col("dst").cast(StringType))).cast(LongType), lit(9L)))
        .localCheckpoint(true)
      val seed = pmod(col("id"), lit(101L)) === 0L
      val (out, sec, cpu) = timed {
        val o = graft.operators.Graph.sssp(nodes, we, seed,
          maxRounds = 40)
        o.queryExecution.toRdd.count()
        o
      }
      val rounds = graft.operators.Graph.lastSsspRounds
      // independent FULL Bellman-Ford replay (relax ALL edges every
      // round — no frontier): the frontier scan optimization must be
      // result-identical at the same cap
      var dist = nodes.select(col("id"),
          when(seed, 0L).otherwise(lit(null).cast(LongType))
            .as("cost"))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val cand = we
          .join(dist.where(col("cost").isNotNull)
            .select(col("id").as("src"), col("cost").as("fc")), "src")
          .select(col("dst").as("id"), (col("fc") + col("w")).as("nc"))
          .groupBy("id").agg(min("nc").as("nc"))
        dist = dist.join(cand, Seq("id"), "left")
          .select(col("id"),
            when(col("nc") < coalesce(col("cost"),
              lit(Long.MaxValue)), col("nc"))
              .otherwise(col("cost")).as("cost"))
          .localCheckpoint(true)
      }
      val full = dist.select(col("id"),
        coalesce(col("cost"), lit(-1L)).as("cost"))
      val d1 = out.exceptAll(full).count()
      val d2 = full.exceptAll(out).count()
      require(d1 == 0 && d2 == 0,
        s"n=$n: frontier BF diverged from full BF ($d1/$d2 rows)")
      val reached = out.where(col("cost") >= 0L).count()
      dropPersisted()
      println(f"[xg10] n=$n%-7d edges=$nEdges rounds=$rounds " +
        f"reached=$reached wall=$sec%.2fs cpu=$cpu%.2fs")
      SLeg(n, nEdges, rounds, reached, sec, cpu)
    }

    val s1 = ssspLeg(5000L * f)
    val s2 = ssspLeg(5000L * 2 * f)
    for ((l, p) <- Seq(s1 -> s"xg10_f$f", s2 -> s"xg10_f${2 * f}")) {
      results += s"${p}_n" -> l.n
      results += s"${p}_edges" -> l.edges
      results += s"${p}_rounds" -> l.rounds
      results += s"${p}_reached" -> l.reached
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
    }
    // rounds grow like weighted eccentricity (log-ish), never like n
    require(s2.rounds <= s1.rounds + 8,
      s"rounds ${s1.rounds} -> ${s2.rounds} across the 2x step — " +
        "convergence is not diameter-bounded")
    results += "xg10_cpu_ratio_info" -> (s2.cpu / s1.cpu)

    // ---------- xd19 prefix-filter candidate-law legs ----------
    // Every doc carries the SAME 5-word boilerplate tail (3 pure-
    // boilerplate shingles with df = n — the share-any-shingle join is
    // C(n,2), quadratic BY CONSTRUCTION) plus 9 hash-derived unique
    // words; docs id ≡ 0 (mod 10) get a partner (id + n) differing in
    // one word → J = 9/15 = 0.6, the only pairs ≥ 0.5. Graded: the
    // df-ascending prefixes EXCLUDE the hot shingles, so candidate
    // volume tracks the planted-pair count (linear, ratio ~2 across
    // the 2× step) while the quadratic C(n,2) floor the xd3-style
    // share-any join would pay grows ~4×; output == the planted set
    // exactly at both factors.
    case class PLeg(n: Long, cand: Long, pairs: Long, planted: Long,
      shareAny: Long, sec: Double, cpu: Double)

    def ppjoinLeg(nBase: Long): PLeg = {
      val planted = nBase / 10
      def uw(j: Int, of: org.apache.spark.sql.Column) =
        concat(lit(s"t$j"), graft.operators.Scale.hashBucket16(
          concat(of.cast(StringType), lit(s":$j"))).cast(StringType))
      def text(of: org.apache.spark.sql.Column, last: String) =
        concat_ws(" ", (0 until 8).map(uw(_, of)) ++
          Seq(concat(lit(last), graft.operators.Scale.hashBucket16(
            concat(of.cast(StringType), lit(":8"))).cast(StringType)),
            lit("lorem ipsum dolor sit amet")): _*)
      val docs = spark.range(nBase)
        .select(col("id").as("doc_id"), text(col("id"), "t8").as("text"))
        .unionAll(spark.range(0, nBase, 10)
          .select((col("id") + nBase).as("doc_id"),
            text(col("id"), "x8").as("text")))
        .localCheckpoint(true)
      val n = docs.count()
      val (out, sec, cpu) = timed {
        val o = graft.operators.Dedup.allPairsJaccard(docs, "doc_id",
          "text", threshold = 0.5)
        o.queryExecution.toRdd.count()
        o
      }
      val shArr = docs.select(col("doc_id").as("__id"),
        graft.functions.TextFns.wordShingles(col("text"), 3).as("__sh"))
      val cand = graft.operators.Dedup.allPairsCandidates(shArr, 0.5)
        .count()
      // output == the planted construction exactly (no strays, every
      // partner found at exactly 9/15)
      val expected = spark.range(0, nBase, 10)
        .select(col("id").as("a"), (col("id") + nBase).as("b"),
          lit(9.0 / 15.0).as("j"))
      val d1 = out.exceptAll(expected).count()
      val d2 = expected.exceptAll(out).count()
      require(d1 == 0 && d2 == 0,
        s"n=$n: xd19 output != planted construction ($d1/$d2 rows)")
      val shareAny = n * (n - 1) / 2 // every doc shares the boiler tail
      dropPersisted()
      println(f"[xd19] n=$n%-7d cand=$cand planted=$planted " +
        f"share_any_floor=$shareAny wall=$sec%.2fs cpu=$cpu%.2fs")
      PLeg(n, cand, planted, planted, shareAny, sec, cpu)
    }

    val p1 = ppjoinLeg(500L * f)
    val p2 = ppjoinLeg(500L * 2 * f)
    for ((l, p) <- Seq(p1 -> s"xd19_f$f", p2 -> s"xd19_f${2 * f}")) {
      results += s"${p}_docs" -> l.n
      results += s"${p}_candidates" -> l.cand
      results += s"${p}_true_pairs" -> l.planted
      results += s"${p}_share_any_floor" -> l.shareAny
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
    }
    val candRatio = p2.cand.toDouble / p1.cand
    results += "xd19_candidate_ratio" -> candRatio
    results += "xd19_share_any_ratio" ->
      (p2.shareAny.toDouble / p1.shareAny)
    require(candRatio > 1.7 && candRatio < 2.5,
      f"xd19 candidate ratio $candRatio%.3f not ~2 (linear) — the " +
        "prefix filter is admitting the hot boilerplate shingles")
    results += "xd19_cpu_ratio_info" -> (p2.cpu / p1.cpu)

    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("SCALE_r15.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

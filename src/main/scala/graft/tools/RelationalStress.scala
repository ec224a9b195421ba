package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-layer scale stress: the TPC-H-shape twin of
  * [[ScaleStress]] (which covers the dedup/ANN paths). Replicates the
  * FACT tables (lineitem, orders) `factor`× with order-key offsets —
  * dimensions stay byte-identical, so every replica order joins the
  * same customer/part/supplier rows and per-group aggregates grow
  * exactly `factor`× — then:
  *
  *  1. times the headline relational shapes at the scaled directory
  *     under the default (AQE-on) config;
  *  2. snapshots each plan's join skeleton with broadcast DISABLED and
  *     AQE off — the >broadcast-threshold regime a 1000-executor
  *     cluster sees — and asserts every join degrades to a shuffle
  *     join, never a nested-loop/cartesian;
  *  3. leaves the scaled directory in place so the standard oracle
  *     gate (graft.Verify + scripts/check_oracle.py) can run DuckDB
  *     hash-parity over the SAME scaled tables — correctness evidence
  *     at 10× bench scale, not just wall-times.
  *
  * Artifacts: SCALE_r5_relational.json + SCALE_r5_relational_plans.txt.
  */
object RelationalStress {

  import StressUtil.joinLines

  private val shapes = Seq("q29_star", "q31_tpch_q3", "q38_tpch_q5",
    "q48_tpch_q9", "q49_tpch_q18", "q50_tpch_q21", "q52_tpch_q4",
    "q53_tpch_q7", "q54_tpch_q10", "q14_frame_running",
    // round-5 additions: window-decorrelated scalar MIN (q56), nested
    // IN chain with date-pruned correlated SUM (q60), 7-table
    // market-share ratio (q62), distinct-count + anti-join (q65)
    "q56_tpch_q2", "q60_tpch_q20", "q62_tpch_q8", "q65_tpch_q16")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    // optional artifact suffix ("f100" → SCALE_r5_relational_f100.json)
    // so scaling-curve runs at several factors don't overwrite each other
    val suffix = args.lift(2).map("_" + _).getOrElse("")
    val outDir = s"/tmp/graft_scale_rel$suffix"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ------------------------------------------------ scaled directory
    val tGen0 = System.nanoTime()
    Files.createDirectories(Paths.get(outDir))
    // dims (and doc/emb/events, for the oracle harness' table views)
    // are copied byte-identical — same values, same encoded types
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings"))
      Files.copy(Paths.get(s"$baseDir/$t.parquet"),
        Paths.get(s"$outDir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    // facts replicate with an order-key offset: replica orders keep
    // their customer (and lineitems their part/supplier), so dim joins
    // and group compositions are preserved exactly
    val OFF = 10000000L
    // guard the replication invariant: replica key ranges must be
    // disjoint (max base key < OFF) and the top replica's offset must
    // not overflow Long — a silent collision would corrupt the exact
    // factor-x multiplicities this harness certifies
    locally {
      val maxKey = spark.read.parquet(s"$baseDir/orders.parquet")
        .agg(max(col("o_orderkey"))).head.getLong(0)
      require(maxKey < OFF,
        s"base o_orderkey max $maxKey >= offset $OFF: replica keys " +
          "would collide; raise OFF above the base key range")
      require(factor.toLong * OFF > 0 &&
        OFF <= Long.MaxValue / factor.toLong,
        s"factor $factor * OFF $OFF overflows Long")
    }
    def replicate(name: String, keyCol: String): Long = {
      val base = spark.read.parquet(s"$baseDir/$name.parquet")
      spark.range(factor).crossJoin(base)
        .withColumn(keyCol, col(keyCol) + col("id") * OFF)
        .drop("id")
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      spark.read.parquet(s"$outDir/$name.parquet").count()
    }
    val nOrders = replicate("orders", "o_orderkey")
    val nLineitem = replicate("lineitem", "l_orderkey")
    val genSec = (System.nanoTime() - tGen0) / 1e9

    val results = scala.collection.mutable.LinkedHashMap[String, Any]()
    results += "base_dir" -> baseDir
    results += "factor" -> factor
    results += "n_orders" -> nOrders
    results += "n_lineitem" -> nLineitem
    results += "gen_sec" -> genSec

    // ------------------------------------------------ timed runs (AQE on)
    val plans = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    for (name <- shapes) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, outDir)
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // q14 reads ONLY the events table, which is copied byte-identical
      // (unscaled): label its result as base-scale so the artifact
      // never presents it as factor-x evidence
      val key = if (name == "q14_frame_running") s"${name}_sec_base"
        else s"${name}_sec"
      results += key -> sec
      results += s"${name}_rows" -> rows
      println(f"[rel-scale] $name%-18s $sec%8.2fs  rows=$rows")
    }

    // -------------------- join skeletons in the no-broadcast regime
    // (static snapshot: AQE off so the recorded shape is the planned
    // one, broadcast threshold -1 so stats-based broadcasts disappear;
    // explicit broadcast() hints on genuinely tiny dims survive, which
    // is exactly the at-scale contract)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- shapes)
        plans += name -> joinLines(
          graft.SparkEntry.queries(name)(spark, outDir))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
    val bad = plans.toSeq.flatMap { case (n, ls) =>
      ls.filter(l => l.contains("Cartesian") ||
        l.contains("BroadcastNestedLoop")).map(n -> _)
    }
    require(bad.isEmpty,
      s"scale-killer join shapes at ${factor}x with broadcast off: $bad")

    // ------------------------------------------------ emit artifacts
    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"SCALE_r5_relational$suffix.json"),
      payload + "\n")
    val report = new StringBuilder
    report ++= s"# Relational join skeletons at ${factor}x bench scale " +
      s"($nLineitem lineitem / $nOrders orders), broadcast DISABLED\n"
    report ++= "# (explicit broadcast() hints on tiny dims survive " +
      "by design; no Cartesian/BroadcastNestedLoopJoin anywhere)\n"
    for ((n, ls) <- plans) {
      report ++= s"\n## $n\n"
      ls.foreach(l => report ++= s"  $l\n")
    }
    Files.writeString(Paths.get(s"SCALE_r5_relational_plans$suffix.txt"),
      report.toString)
    println(payload)
    spark.stop()
  }
}

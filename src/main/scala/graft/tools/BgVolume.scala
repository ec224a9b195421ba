package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Background-pair candidate-volume demonstration for the MinHash
  * band law: the regime `minhashParams`' rows-per-band growth targets
  * is a corpus with MODERATE-Jaccard mass (template-similar pages,
  * j ≈ 0.3–0.5 — below the verify threshold but far above random).
  * The ScaleStress corpus deliberately lacks that mass (its replicas
  * are full word-shuffles, j ≈ 0), so its volume comparison cannot
  * show the suppression; this tool generates the template regime —
  * replicas keep the first half of each text verbatim and shuffle the
  * rest, giving j ≈ 0.3–0.5 cliques per base doc — and reports the
  * banded candidate volume under the derived (bands, rowsPerBand) vs
  * the fixed 32×4. Per-pair expected colliding bands at j: B·j^r —
  * e.g. at j=0.33, f20's (51,5) gives 0.20 vs 32×4's 0.38.
  *
  * Usage: runMain graft.tools.BgVolume [sfDir] [factor]
  */
object BgVolume {

  /** Shuffle only the second half of the words — first-half shingles
    * survive verbatim, so replica cliques sit at moderate Jaccard.
    */
  private def halfShuffle(text: String, seed: Long): String = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val half = words.length / 2
    val r = new java.util.Random(seed)
    var i = words.length - 1
    while (i > half) {
      val j = half + r.nextInt(i - half + 1)
      val tmp = words(i); words(i) = words(j); words(j) = tmp
      i -= 1
    }
    words.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val OFF = 1000000L
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text")
    // same replication guard as StressUtil/RelationalStress: disjoint
    // replica id ranges, no Long overflow — a silent collision would
    // corrupt both volume numbers this artifact exists to publish
    locally {
      val maxId = base.agg(max(col("doc_id"))).head.getLong(0)
      require(maxId < OFF,
        s"base doc_id max $maxId >= offset $OFF: replica ids would " +
          "collide; raise OFF above the base id range")
      require(factor.toLong * OFF > 0 &&
        OFF <= Long.MaxValue / factor.toLong,
        s"factor $factor * OFF $OFF overflows Long")
    }
    val bg = spark.range(factor).crossJoin(base)
      .select(col("id").as("k"), col("doc_id"), col("text"))
      .as[(Long, Long, String)]
      .map { case (k, id, text) =>
        (id + k * OFF, if (k == 0) text else halfShuffle(text, id * 17 + k))
      }
      .toDF("doc_id", "text")
      .localCheckpoint(true)
    val n = bg.count()
    val (bands, rows) = Dedup.minhashParams(n, recallAt = 0.75)
    val auto = Dedup.minhashCandidateVolume(bg, "doc_id", "text", 3,
      bands, rows)
    val fixed = Dedup.minhashCandidateVolume(bg, "doc_id", "text", 3,
      32, 4)
    val payload =
      s"""{"base_dir":"$baseDir","factor":$factor,"n_documents":$n,""" +
      s""""bands":$bands,"rows_per_band":$rows,""" +
      s""""auto_cand_pairs":$auto,"fixed_32x4_cand_pairs":$fixed}"""
    Files.writeString(
      Paths.get(s"SCALE_r7_bgvol_f$factor.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

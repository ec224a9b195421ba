package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-12 scale legs (VERDICT r11 #8/#9):
  *
  *  1. qs10 GRAM-STORE SIZE LAW. LSM compaction bounds rewrite cost
  *     but not store size; this leg streams a replicated corpus
  *     through the evolving store and (a) asserts the EXACT identity
  *     `final store rows == one-shot distinct l-gram keys` — the law
  *     that makes store growth a function of distinct content, not
  *     stream volume — (b) publishes the per-batch growth curve
  *     (cumulative appended keys vs cumulative streamed chars), and
  *     (c) re-runs the same batches with the parquet COLD-TIER knob
  *     after every batch and asserts the result digest and store size
  *     are bit-identical (tiering is a representation change only).
  *     The half-corpus law ratio vs the full-corpus law shows rows ∝
  *     distinct chars across a 2× content step.
  *
  *  2. xs2 LLOYD CONVERGENCE/WORK COUNTERS (the xs10 published-
  *     counters discipline). The production IVF trainer runs on the
  *     base embeddings and on a 2× replicated corpus: the bounded
  *     sample must stay AT THE CAP (training work independent of
  *     corpus size — the 100 TB story), and the per-iteration
  *     centroid-shift curve + non-empty cell counts are published,
  *     with an extended-iteration run showing the decay to
  *     convergence. The xs2 recall gate (OperatorsSpec) is untouched.
  *
  * Writes SCALE_r12_gate.json in the repo root (driver-visible).
  */
object GramXs2Scale {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(4)
    require(factor >= 2 && factor % 2 == 0, "factor must be even >= 2")
    val outDir = "/tmp/graft_gramxs2"
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
    results += "factor" -> factor

    // ---------------------------------------------- leg 1: gram store
    val OFF = 1000000L
    val nDocs = StressUtil.replicateDocuments(spark, baseDir, outDir,
      factor)
    results += "n_documents" -> nDocs
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val corpusK = factor / 2
    val corpus = docs.where(col("doc_id") < corpusK * OFF)
      .localCheckpoint(true)
    val maxBase = spark.read.parquet(s"$baseDir/documents.parquet")
      .agg(max(col("doc_id"))).head.getLong(0)
    val cut = maxBase / 2
    val batchBounds: Seq[(Long, Long)] =
      (corpusK until factor).flatMap { k =>
        Seq((k * OFF, k * OFF + cut), (k * OFF + cut, (k + 1) * OFF))
      }
    results += "n_batches" -> batchBounds.size

    // the corpus checkpoint must survive run-boundary releases (its
    // lineage is truncated — an unpersisted localCheckpoint cannot
    // recompute); everything created inside a run is fair game
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet

    def digest(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr(s"bit_xor(xxhash64(${df.columns.mkString(",")}))")).head
      (r.getLong(0), r.getLong(1))
    }

    /** Ingest the batches; `tier` spills the store to a versioned
      * parquet cold dir after every batch (the runner's tierEvery=1
      * shape). Returns (digest, corpus-store rows, final rows,
      * per-batch appended, per-batch chars, wall).
      */
    def runChunks(tier: Boolean, label: String)
        : ((Long, Long), Long, Long, Seq[Long], Seq[Long], Double) = {
      val t0 = System.nanoTime()
      var gs = Dedup.prepareGramStore(corpus, "doc_id", "text")
      val corpusRows = gs.grams.count()
      val appended = Seq.newBuilder[Long]
      val chars = Seq.newBuilder[Long]
      var outs = List.empty[DataFrame]
      batchBounds.zipWithIndex.foreach { case ((lo, hi), i) =>
        val batch = docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        chars += batch.agg(sum(length(col("text")))).head.getLong(0)
        val ing = Dedup.substringDedupIngest(batch, gs, "doc_id", "text")
        outs ::= ing.result.localCheckpoint(true)
        appended += ing.appended.count()
        gs = ing.next
        if (tier)
          gs = Dedup.tierGramStore(gs, s"$outDir/tier_${label}_$i")
      }
      val finalRows = gs.grams.count()
      val d = digest(outs.reduce(_.unionByName(_)))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds(id) }
        .values.foreach(_.unpersist(blocking = false))
      (d, corpusRows, finalRows, appended.result(), chars.result(), wall)
    }

    val (dFlat, corpusRows, storeRows, app, chars, wFlat) =
      runChunks(tier = false, "flat")
    val (dTier, _, tierRows, _, _, wTier) =
      runChunks(tier = true, "tier")
    require(dFlat == dTier,
      s"tiered != flat results: $dFlat vs $dTier")
    require(storeRows == tierRows,
      s"tiered != flat store size: $storeRows vs $tierRows")

    // the exact law: evolving store rows == one-shot distinct grams
    val law = Dedup.gramStoreSizeLaw(docs, "doc_id", "text")
    require(storeRows == law,
      s"store-size law broken: store $storeRows != one-shot $law")
    // content-proportionality across a 2x distinct-content step
    val lawHalf = Dedup.gramStoreSizeLaw(
      docs.where(col("doc_id") < corpusK * OFF), "doc_id", "text")
    val lawRatio = law.toDouble / lawHalf
    results += "store_rows_corpus" -> corpusRows
    results += "store_rows_final" -> storeRows
    results += "store_rows_one_shot_law" -> law
    results += "store_law_identity_ok" -> true
    results += "tiered_equals_flat_ok" -> true
    results += "store_rows_half_corpus" -> lawHalf
    results += "store_law_2x_ratio" -> lawRatio
    results += "batch_appended_gram_keys" ->
      RawJson(app.mkString("[", ",", "]"))
    results += "batch_streamed_chars" ->
      RawJson(chars.mkString("[", ",", "]"))
    results += "flat_wall_sec" -> wFlat
    results += "tiered_wall_sec" -> wTier

    // ------------------------------------------------- leg 2: xs2
    StressUtil.replicateEmbeddings(spark, baseDir, outDir, 2)
    val embBase = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val emb2x = spark.read.parquet(s"$outDir/embeddings.parquet")
    def lloydLeg(emb: DataFrame, tag: String)
        : Similarity.LloydDiag = {
      val t0 = System.nanoTime()
      val (cents, diag) = Similarity.kmeansCentroidsDiag(
        emb, "vec_id", "embedding", nlist = 16, iters = 3)
      val sec = (System.nanoTime() - t0) / 1e9
      require(cents.nonEmpty)
      results += s"xs2_${tag}_sample_size" -> diag.sampleSize
      results += s"xs2_${tag}_dim" -> diag.dim
      results += s"xs2_${tag}_iters_run" -> diag.itersRun
      results += s"xs2_${tag}_converged" -> diag.converged
      results += s"xs2_${tag}_shifts" -> RawJson(diag.shifts
        .map(s => String.format(java.util.Locale.ROOT, "%.4f",
          Double.box(s))).mkString("[", ",", "]"))
      results += s"xs2_${tag}_nonempty_cells" ->
        RawJson(diag.nonEmpty.mkString("[", ",", "]"))
      results += s"xs2_${tag}_train_wall_sec" -> sec
      diag
    }
    val d1 = lloydLeg(embBase, "base")
    val d2 = lloydLeg(emb2x, "2x")
    // the bounded-work gate: once the corpus exceeds the cap
    // (max(128*nlist, 2048)), the sample — and with it the Lloyd work
    // unit (sample x nlist x dim x iters) — is IDENTICAL as the
    // corpus doubles. Below the cap (smoke runs at tiny SF) the
    // sample is the whole corpus, which is the same boundedness
    // statement from the other side.
    val cap = math.max(128 * 16, 2048)
    if (embBase.count() >= cap)
      require(d1.sampleSize == cap && d2.sampleSize == cap,
        s"sample cap not binding: ${d1.sampleSize} vs ${d2.sampleSize}")
    else
      require(d2.sampleSize <= cap,
        s"sample exceeded cap: ${d2.sampleSize}")
    results += "xs2_sample_cap" -> cap
    results += "xs2_sample_cap_binding_ok" -> true
    // extended run: the convergence curve to (near-)flat
    val (_, dExt) = Similarity.kmeansCentroidsDiag(
      embBase, "vec_id", "embedding", nlist = 16, iters = 12)
    results += "xs2_extended_iters_run" -> dExt.itersRun
    results += "xs2_extended_converged" -> dExt.converged
    results += "xs2_extended_shifts" -> RawJson(dExt.shifts
      .map(s => String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(s))).mkString("[", ",", "]"))
    require(dExt.shifts.nonEmpty &&
      dExt.shifts.last <= dExt.shifts.head,
      s"shift curve did not decay: ${dExt.shifts}")

    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("SCALE_r12_gate.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

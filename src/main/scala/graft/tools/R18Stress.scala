package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-18 scale harness: the re-blocking epoch's laws and the
  * hierarchical-descent trend (VERDICT r17 #1/#4).
  *
  * LEG A — re-blocking epoch under drift, at a corpus and its 2×
  * extension. The [[StressUtil.driftedEmbeddings]] corpus: an initial
  * clustered region plus a delta whose clusters concentrate around ONE
  * new direction the initial corpus never saw. Graded laws:
  *
  *  - STALE CONCENTRATION: under cells frozen from the initial region
  *    (the qs36 regime), the drifted delta lands in a few stale cells
  *    and the blocked candidate volume Σ load₁·load_p balloons — the
  *    production reason the epoch exists. Recounted, not argued.
  *  - REFRESH RE-BALANCE: `balancedKmeansSeq` (Lloyd + deterministic
  *    ISODATA bisection passes — plain Lloyd re-training splits a
  *    tight region only 2-3 ways before winner-take-all collapse)
  *    restores the candidate volume toward the balanced floor;
  *    gated < 0.5× stale at BOTH sizes.
  *  - LINEAR REBUILD COST: the epoch is ONE blocked rebuild — its
  *    candidate volume grows ≈ linearly across the 2× corpus step at
  *    nlist ∝ n (the SCALE_r17 construction law applied to the
  *    refresh), while exact all-pairs grows 4×.
  *  - RECALL RETENTION on delta-region queries (where stale cells
  *    degrade): refreshed ≥ 0.9 and ≥ stale − 0.05 at both sizes.
  *
  * LEG B — hierarchical-descent trend at THREE sizes (r17 leg C
  * carried two): per-query top-3-medoid seeding vs the flat
  * all-medoid tier, with nlist growing with the corpus. The two-layer
  * argument predicts the visited-set shrink WIDENS as nlist grows
  * (flat seeds = nlist, hierarchical seeds = 3 regardless); the third
  * point establishes the monotone law. Recall re-gated at every
  * point.
  *
  * Wall/cpu are informational (host-era noise); graded numbers are
  * deterministic counters. Writes `SCALE_r18.json`.
  */
object R18Stress {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val results = scala.collection.mutable.LinkedHashMap[String, Any]()
    def dropPersisted(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    val scratch = Files.createTempDirectory("r18stress").toString

    // leg filter (e.g. SPARK_GRAFT_R18_LEGS=d re-runs only leg D);
    // fresh results MERGE over the existing artifact by key, so a
    // partial run never discards the other legs' recorded laws
    val legs = sys.env.getOrElse("SPARK_GRAFT_R18_LEGS", "abcd")

    // ---------- LEG A: re-blocking epoch laws ----------
    if (legs.contains('a')) {
      case class ALeg(n: Long, nlist: Int, candStale: Long,
        candRefreshed: Long, exact: Long, recallStale: Double,
        recallRefreshed: Double)
      def aLeg(mInit: Int, mDelta: Int, nlist: Int): ALeg = {
        StressUtil.driftedEmbeddings(spark, sfDir, scratch,
          mInit, mDelta, deltaCids = 1000)
        val all = spark.read
          .parquet(s"$scratch/embeddings_drifted.parquet")
          .select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v"),
            col("is_delta"))
          .localCheckpoint(true)
        val n = all.count()
        val initial = all.where(!col("is_delta")).select("id", "v")
        val acc = all.select("id", "v").localCheckpoint(true)
        val stale = Similarity.kmeansCentroidsSeq(initial, "id", "v",
          nlist)
        val refreshed = Similarity.balancedKmeansSeq(acc, "id", "v",
          nlist)
        def candVolume(cents: Seq[(Long, Seq[Double])]): Long = {
          def assigned(p: Int) = acc.select(col("id"),
            graft.operators.HashFns.nearestCentroids(col("v"),
              cents.map(_._1), cents.map(_._2), p).as("cells"))
          assigned(1)
            .select(col("id"), element_at(col("cells"), 1).as("cell"))
            .join(assigned(2).select(col("id").as("nb"),
              explode(col("cells")).as("cell")), "cell")
            .where(col("id") =!= col("nb")).count()
        }
        val cs = candVolume(stale)
        val cr = candVolume(refreshed)
        // delta-region queries: where the stale cells degrade
        val queries = all.where(col("is_delta")).select("id", "v")
          .orderBy("id").limit(10).localCheckpoint(true)
        def pairsOf(df: DataFrame) = df.select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val bf = pairsOf(Similarity.bruteForceTopK(acc, queries, "id",
          "v", 3))
        def recallWith(cents: Seq[(Long, Seq[Double])]): Double = {
          val graph = Similarity.ivfSeededGraph(acc, "id", "v", cents,
            probe = 2, k = 10).localCheckpoint(true)
          val entries = Similarity.cellMedoids(acc, "id", "v", cents)
          val beam = pairsOf(Similarity.beamSearchTopK(acc, queries,
            graph, "id", "v", entries, ef = 24, rounds = 10, k = 3))
          (bf & beam).size.toDouble / bf.size
        }
        val rs = recallWith(stale)
        val rr = recallWith(refreshed)
        dropPersisted()
        println(f"[reblock] n=$n%-6d nlist=$nlist candStale=$cs " +
          f"candRefreshed=$cr recallStale=$rs%.3f " +
          f"recallRefreshed=$rr%.3f")
        ALeg(n, nlist, cs, cr, n * (n - 1), rs, rr)
      }
      val a1 = aLeg(mInit = 2, mDelta = 4, nlist = 64)
      val a2 = aLeg(mInit = 4, mDelta = 8, nlist = 128)
      for ((l, p) <- Seq(a1 -> "reblock_f1", a2 -> "reblock_f2")) {
        results += s"${p}_n" -> l.n
        results += s"${p}_nlist" -> l.nlist
        results += s"${p}_cand_stale" -> l.candStale
        results += s"${p}_cand_refreshed" -> l.candRefreshed
        results += s"${p}_exact_allpairs" -> l.exact
        results += s"${p}_rebalance_frac" ->
          (l.candRefreshed.toDouble / l.candStale)
        results += s"${p}_recall_stale" -> l.recallStale
        results += s"${p}_recall_refreshed" -> l.recallRefreshed
      }
      val corpusRatio = a2.n.toDouble / a1.n
      val refreshRatio = a2.candRefreshed.toDouble / a1.candRefreshed
      results += "reblock_corpus_ratio" -> corpusRatio
      results += "reblock_refresh_cost_ratio" -> refreshRatio
      results += "reblock_exact_ratio" ->
        (a2.exact.toDouble / a1.exact)
      // refresh re-balances the stale concentration at both sizes
      require(a1.candRefreshed < a1.candStale / 2 &&
        a2.candRefreshed < a2.candStale / 2,
        s"refresh bought no re-balancing: ${a1.candRefreshed}/" +
          s"${a1.candStale}, ${a2.candRefreshed}/${a2.candStale}")
      // the epoch's rebuild cost is LINEAR across the 2× step (the
      // blocked-construction law applied to the refresh), not the 4×
      // of an exact rebuild
      require(refreshRatio < 1.6 * corpusRatio,
        f"refresh cost ratio $refreshRatio%.2f is super-linear over " +
          f"the corpus ratio $corpusRatio%.2f")
      // recall retention (the VERDICT r17 gate)
      require(a1.recallRefreshed >= 0.9 && a2.recallRefreshed >= 0.9,
        f"refreshed recall dropped: ${a1.recallRefreshed}%.3f / " +
          f"${a2.recallRefreshed}%.3f")
      require(a1.recallRefreshed >= a1.recallStale - 0.05 &&
        a2.recallRefreshed >= a2.recallStale - 0.05,
        "refresh lost recall vs stale cells")
    }

    // ---------- LEG B: hierarchical-descent trend, 3 sizes ----------
    if (legs.contains('b')) {
      case class BLeg(n: Long, nlist: Int, vFlat: Long, vHier: Long,
        recall: Double)
      def bLeg(members: Int, nlist: Int): BLeg = {
        StressUtil.clusteredEmbeddings(spark, sfDir, scratch, members)
        val corpus = spark.read
          .parquet(s"$scratch/embeddings_clustered.parquet")
          .select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .localCheckpoint(true)
        val n = corpus.count()
        val queries = corpus.where(col("id") < 10).localCheckpoint(true)
        val cents = Similarity.kmeansCentroidsSeq(corpus, "id", "v",
          nlist)
        val graph = Similarity.ivfSeededGraph(corpus, "id", "v", cents,
          probe = 2, k = 10).localCheckpoint(true)
        val entries = Similarity.cellMedoids(corpus, "id", "v", cents)
        def visited(seedM: Int) = Similarity.beamSearchVisitedSeeded(
          corpus, queries, graph, "id", "v", entries, ef = 24,
          rounds = 10, seedM = seedM).localCheckpoint(true)
        val vFlat = visited(0).count()
        val vH = visited(3)
        val vHier = vH.count()
        val hier = Similarity.rankVisitedTopK(vH, 3)
          .select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val bf = Similarity.bruteForceTopK(corpus, queries, "id", "v",
            3).select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (bf & hier).size.toDouble / bf.size
        dropPersisted()
        println(f"[hier3] n=$n%-6d nlist=$nlist flat=$vFlat " +
          f"hier=$vHier shrink=${vHier.toDouble / vFlat}%.3f " +
          f"recall=$recall%.3f")
        BLeg(n, nlist, vFlat, vHier, recall)
      }
      val b1 = bLeg(members = 4, nlist = 32)
      val b2 = bLeg(members = 8, nlist = 64)
      val b3 = bLeg(members = 16, nlist = 128)
      for ((l, p) <- Seq(b1 -> "hier3_f4", b2 -> "hier3_f8",
          b3 -> "hier3_f16")) {
        results += s"${p}_n" -> l.n
        results += s"${p}_nlist" -> l.nlist
        results += s"${p}_visited_flat" -> l.vFlat
        results += s"${p}_visited_hier" -> l.vHier
        results += s"${p}_shrink" -> (l.vHier.toDouble / l.vFlat)
        results += s"${p}_recall" -> l.recall
      }
      require(b1.recall >= 0.9 && b2.recall >= 0.9 && b3.recall >= 0.9,
        f"hier recall dropped: ${b1.recall}%.3f ${b2.recall}%.3f " +
          f"${b3.recall}%.3f")
      val s1 = b1.vHier.toDouble / b1.vFlat
      val s2 = b2.vHier.toDouble / b2.vFlat
      val s3 = b3.vHier.toDouble / b3.vFlat
      require(s2 < s1 && s3 < s2,
        f"the shrink must WIDEN monotonically as nlist grows with " +
          f"the corpus: $s1%.3f -> $s2%.3f -> $s3%.3f")
    }

    // ---------- LEG C: multi-epoch lifecycle amortized cost ----------
    // The epoch-cadence law over a DRIFTING STREAM, counted per batch
    // in TWO regimes (all counters are deterministic candidate-pair
    // recounts of the exact joins the maintenance runs):
    //
    //  - SMALL-DELTA regime (batch ≪ store — the streaming case the
    //    incremental fold exists for): FROZEN cells pay growing
    //    per-batch ingest candidates (every delta batch lands in the
    //    same few stale hot cells, whose load accumulates — linear
    //    per batch, quadratic cumulative); LIFECYCLE (epoch every E)
    //    keeps the tail flat and its total — ingests + (B/E) blocked
    //    rebuilds — stays well under REBUILD-PER-BATCH.
    //  - LARGE-DELTA regime (batch ≈ store): the measured CROSSOVER —
    //    rebuild-per-batch under fresh balanced cells is CHEAPER than
    //    incremental maintenance under drifting frozen cells, because
    //    |B|·hot-load exceeds a balanced full rebuild. Recorded and
    //    GATED as a law, not hidden: incremental maintenance is the
    //    right call iff deltas-between-epochs ≪ store; at bulk-load
    //    scale, re-prepare.
    if (legs.contains('c')) {
      case class CReg(perBatchFrozen: Seq[Long], perBatchLife: Seq[Long],
        epochCands: Long, perBatchRebuild: Seq[Long])
      def cReg(mDelta: Int, nB: Int, e: Int, prefix: String): CReg = {
        StressUtil.driftedEmbeddings(spark, sfDir, scratch,
          mInit = 2, mDelta = mDelta, deltaCids = 1000)
        val all = spark.read
          .parquet(s"$scratch/embeddings_drifted.parquet")
          .select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v"),
            col("is_delta"))
          .localCheckpoint(true)
        val nlist = 64
        val initial = all.where(!col("is_delta")).select("id", "v")
          .localCheckpoint(true)
        val deltaIds = all.where(col("is_delta")).select("id")
          .orderBy("id").collect().map(_.getLong(0))
        val cuts = (1 until nB)
          .map(i => deltaIds(i * deltaIds.length / nB))
        val edgesB = (Long.MinValue +: cuts) :+ Long.MaxValue
        val batches = edgesB.sliding(2).map { case Seq(lo, hi) =>
          all.where(col("is_delta") && col("id") >= lo &&
            col("id") < hi).select("id", "v").localCheckpoint(true)
        }.toSeq
        def asg(df: DataFrame, cents: Seq[(Long, Seq[Double])],
            p: Int) =
          df.select(col("id"),
            graft.operators.HashFns.nearestCentroids(col("v"),
              cents.map(_._1), cents.map(_._2), p).as("cells"))
        // the two directed ingest legs of blockedGraphIngest, ids only
        def ingestCand(b: DataFrame, store: DataFrame,
            cents: Seq[(Long, Seq[Double])]): Long = {
          def prim(df: DataFrame) = asg(df, cents, 1)
            .select(col("id"), element_at(col("cells"), 1).as("cell"))
          def prb(df: DataFrame) = asg(df, cents, 2)
            .select(col("id").as("nb"),
              explode(col("cells")).as("cell"))
          val sAll = store.unionByName(b)
          prim(b).join(prb(sAll), "cell")
            .where(col("id") =!= col("nb")).count() +
            prim(store).join(prb(b), "cell")
              .where(col("id") =!= col("nb")).count()
        }
        def rebuildCand(df: DataFrame,
            cents: Seq[(Long, Seq[Double])]): Long =
          asg(df, cents, 1)
            .select(col("id"), element_at(col("cells"), 1).as("cell"))
            .join(asg(df, cents, 2).select(col("id").as("nb"),
              explode(col("cells")).as("cell")), "cell")
            .where(col("id") =!= col("nb")).count()
        val stale = Similarity.kmeansCentroidsSeq(initial, "id", "v",
          nlist)
        var store = initial
        val frozenPerBatch = batches.map { b =>
          val c = ingestCand(b, store, stale)
          store = store.unionByName(b).localCheckpoint(true)
          c
        }
        store = initial
        var cents = stale
        var epochCands = 0L
        val lifePerBatch = batches.zipWithIndex.map { case (b, i) =>
          val c = ingestCand(b, store, cents)
          store = store.unionByName(b).localCheckpoint(true)
          if ((i + 1) % e == 0) {
            cents = Similarity.balancedKmeansSeq(store, "id", "v",
              nlist)
            epochCands += rebuildCand(store, cents)
          }
          c
        }
        store = initial
        val rebuildPerBatch = batches.map { b =>
          store = store.unionByName(b).localCheckpoint(true)
          val cb = Similarity.balancedKmeansSeq(store, "id", "v",
            nlist)
          rebuildCand(store, cb)
        }
        dropPersisted()
        results += s"${prefix}_n_batches" -> nB
        results += s"${prefix}_epoch_every" -> e
        results += s"${prefix}_frozen_per_batch" ->
          RawJson(frozenPerBatch.mkString("[", ",", "]"))
        results += s"${prefix}_lifecycle_per_batch" ->
          RawJson(lifePerBatch.mkString("[", ",", "]"))
        results += s"${prefix}_epoch_rebuild_cands" -> epochCands
        results += s"${prefix}_rebuild_per_batch" ->
          RawJson(rebuildPerBatch.mkString("[", ",", "]"))
        results += s"${prefix}_frozen_total" -> frozenPerBatch.sum
        results += s"${prefix}_lifecycle_total" ->
          (lifePerBatch.sum + epochCands)
        results += s"${prefix}_rebuild_total" -> rebuildPerBatch.sum
        println(s"[$prefix] frozen=${frozenPerBatch.mkString(",")} " +
          s"life=${lifePerBatch.mkString(",")} epochs=$epochCands " +
          s"rebuildEach=${rebuildPerBatch.mkString(",")}")
        CReg(frozenPerBatch, lifePerBatch, epochCands, rebuildPerBatch)
      }
      // SMALL-DELTA regime: 8 batches of ~125 over a 4000-vector
      // initial store, epoch every 4
      val small = cReg(mDelta = 1, nB = 8, e = 4, prefix = "life_small")
      require(small.perBatchFrozen.last > 2 * small.perBatchFrozen.head,
        s"frozen per-batch cost did not grow: ${small.perBatchFrozen}")
      require(small.perBatchLife.last < small.perBatchFrozen.last,
        "epochs bought nothing at the tail (small regime)")
      require(small.perBatchLife.sum + small.epochCands <
        small.perBatchRebuild.sum,
        s"lifecycle ${small.perBatchLife.sum + small.epochCands} !< " +
          s"rebuild-per-batch ${small.perBatchRebuild.sum} (small regime)")
      // LARGE-DELTA regime: 4 batches of ~1000 over 4000 — the
      // crossover, gated as measured
      val large = cReg(mDelta = 4, nB = 4, e = 2, prefix = "life_large")
      require(large.perBatchFrozen.last > 2 * large.perBatchFrozen.head,
        s"frozen per-batch cost did not grow: ${large.perBatchFrozen}")
      require(large.perBatchLife.last < large.perBatchFrozen.last,
        "epochs bought nothing at the tail (large regime)")
      require(large.perBatchRebuild.sum <
        large.perBatchLife.sum + large.epochCands,
        "the large-delta crossover did not reproduce: rebuild-per-" +
          "batch should beat incremental when batch ≈ store")
    }

    // ---------- LEG D: prefix-index re-blocking epoch (qs40's law) ----
    // The text-side twin of leg A, at bench scale: the full sf
    // document corpus, with the delta era drifted by a shared
    // BOILERPLATE suffix the prepare-era corpus never saw. Frozen df
    // ranks the boilerplate shingles 0 (rarest → in EVERY delta
    // prefix), so the next batch's candidate join goes delta×delta on
    // them; one reprepareAllPairsIndex epoch ranks them common (out of
    // every prefix half) and pruning is restored. Graded laws, all
    // deterministic recounts of the exact joins the ingest runs:
    //  - candidate collapse: refreshed < stale/2 (measured far lower);
    //  - answer invariance: the emitted pair set of the NEXT batch is
    //    IDENTICAL under either index — df is a pruning model (the
    //    qs40 oracle gates the same theorem end-to-end on real text);
    //  - linear epoch cost: the re-derivation touches each stored doc
    //    once (prefix rows == the one-shot prepare's over the same
    //    docs — recounted equal).
    if (legs.contains('d')) {
      import graft.operators.Dedup
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      val half = nDocs / 2
      val cut = half + (nDocs - half) / 2
      val boiler = " all rights reserved terms of service apply " +
        "contact the site administrator to request content removal"
      val corpus = docs.where(col("doc_id") < half)
        .localCheckpoint(true)
      val delta = docs.where(col("doc_id") >= half)
        .select(col("doc_id"),
          concat(col("text"), lit(boiler)).as("text"))
        .localCheckpoint(true)
      val b1 = delta.where(col("doc_id") < cut)
      val b2 = delta.where(col("doc_id") >= cut)
      val ix0 = Dedup.prepareAllPairsIndex(corpus, "doc_id", "text",
        0.5)
      val staleIx = Dedup.allPairsIngest(b1, ix0, "doc_id", "text").next
      val refIx = Dedup.reprepareAllPairsIndex(staleIx)
      val candStale = Dedup.allPairsIngestCandidates(b2, staleIx,
        "doc_id", "text")
      val candRef = Dedup.allPairsIngestCandidates(b2, refIx,
        "doc_id", "text")
      def outOf(ix: Dedup.PrefixIndex) =
        Dedup.allPairsIngest(b2, ix, "doc_id", "text").result
          .select("a", "b", "j").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            math.round(r.getDouble(2) * 1e9))).toSet
      val oStale = outOf(staleIx)
      val oRef = outOf(refIx)
      require(oStale == oRef,
        s"epoch changed the answer: ${(oStale -- oRef).size} stale-" +
          s"only, ${(oRef -- oStale).size} refreshed-only")
      require(oRef.nonEmpty, "no pairs in the gated batch — vacuous")
      require(candRef * 2 < candStale,
        s"epoch bought no pruning: stale $candStale refreshed $candRef")
      // linear epoch cost: re-derived prefixes == one-shot prepare's
      val refPrefixRows = refIx.pref.count()
      val oneShotPrefixRows = Dedup.prepareAllPairsIndex(
        corpus.unionByName(b1), "doc_id", "text", 0.5).pref.count()
      require(refPrefixRows == oneShotPrefixRows,
        s"epoch prefix rows $refPrefixRows != one-shot " +
          s"$oneShotPrefixRows")
      dropPersisted()
      results += "prefix_epoch_n_docs" -> nDocs
      results += "prefix_epoch_store_docs" -> cut
      results += "prefix_epoch_batch_docs" -> (nDocs - cut)
      results += "prefix_epoch_cand_stale" -> candStale
      results += "prefix_epoch_cand_refreshed" -> candRef
      results += "prefix_epoch_prune_frac" ->
        (math.round(1e3 * candRef.toDouble / candStale) / 1e3)
      results += "prefix_epoch_pairs" -> oRef.size
      results += "prefix_epoch_prefix_rows" -> refPrefixRows
      println(f"[prefix_epoch] stale=$candStale refreshed=$candRef " +
        f"(${candRef.toDouble / candStale}%.4f) pairs=${oRef.size}")
    }

    // ---------- LEG E: filtered-serve over-fetch law (xs19's dial) ----
    // The ef dial measured at bench scale, at a corpus and its 2×
    // extension: per ef ∈ {8,16,32,48}, the filtered harvest's recall
    // vs per-label exact brute force, and the visited-set size the
    // beam pays for it (both deterministic — set-semantic traversals).
    // Laws gated: recall at the top of the dial ≥ 0.9 at BOTH sizes
    // (the xs19 spec gate's scale form), recall(ef_max) ≥ recall(
    // ef_min) (widening the beam never hurts the harvest here), and
    // the SCALE_r16 touched-node law surviving the filter: visited
    // sets are parameter-bounded (entries + rounds·ef·deg), so the
    // 2× corpus pays ≈ the same visited count per ef — the corpus
    // FRACTION halves (brute-force filtered search pays |corpus|).
    if (legs.contains('e')) {
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"),
          col("label"))
      def corpusAt(f: Int): DataFrame =
        (if (f == 1) emb
         else emb.unionByName(emb.select((col("id") + 100000L).as("id"),
           transform(col("v"), x => x + lit(0.05)).as("v"),
           col("label"))))
          .localCheckpoint(true)
      val curves = scala.collection.mutable.Map[Int, Seq[(Int, Long, Double)]]()
      val sizes = scala.collection.mutable.Map[Int, Long]()
      for (f <- Seq(1, 2)) {
        val corpus = corpusAt(f)
        val n = corpus.count()
        val queries = corpus.where(col("id") < 10)
        val cents = Similarity.kmeansCentroidsSeq(corpus, "id", "v",
          nlist = 32 * f)
        val graph = Similarity.ivfSeededGraph(corpus, "id", "v", cents,
          probe = 2, k = 10).localCheckpoint(true)
        val entries = Similarity.cellMedoids(corpus, "id", "v", cents)
        def pairsOf(df: DataFrame) = df.select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val qLabels = queries.select("label").distinct().collect()
          .map(_.getInt(0)).toSeq
        val bf = qLabels.map { l =>
          pairsOf(Similarity.bruteForceTopK(
            corpus.where(col("label") === l),
            queries.where(col("label") === l), "id", "v", 3))
        }.reduce(_ ++ _)
        val efs = Seq(8, 16, 32, 48)
        val curve = efs.map { ef =>
          val visited = Similarity.beamSearchVisitedSeeded(corpus,
            queries, graph, "id", "v", entries, ef = ef, rounds = 10,
            seedM = 3).count()
          val got = pairsOf(Similarity.beamSearchTopKHierFiltered(
            corpus, queries, graph, "id", "v", "label", entries,
            seedM = 3, ef = ef, rounds = 10, k = 3))
          val rec = (bf & got).size.toDouble / bf.size
          (ef, visited, math.round(rec * 1e3) / 1e3)
        }
        dropPersisted()
        require(curve.last._3 >= 0.9,
          s"f$f: recall ${curve.last._3} < 0.9 at ef=${curve.last._1}")
        require(curve.last._3 >= curve.head._3,
          s"f$f: widening the beam LOST recall: $curve")
        curves(f) = curve
        sizes(f) = n
        results += s"filtered_f${f}_n" -> n
        results += s"filtered_f${f}_ef" ->
          RawJson(efs.mkString("[", ",", "]"))
        results += s"filtered_f${f}_visited" ->
          RawJson(curve.map(_._2).mkString("[", ",", "]"))
        results += s"filtered_f${f}_recall" ->
          RawJson(curve.map(_._3).mkString("[", ",", "]"))
        println(s"[filtered f$f] n=$n curve=$curve")
      }
      // the touched-node law under filtering: per ef, the 2× corpus
      // visits ≈ the same parameter-bounded set (≤1.5×), so the
      // corpus FRACTION shrinks — the xs19 scale story (filtered
      // brute force pays |corpus| per query instead)
      for (((ef, v1, _), (_, v2, _)) <- curves(1).zip(curves(2)))
        require(v2 <= v1 * 3 / 2,
          s"ef=$ef: visited grew with the corpus ($v1 -> $v2) — " +
            "the parameter-bound law broke under filtering")
    }

    val fresh = results.toSeq
      .map { case (k, v) => k -> StressUtil.jsonScalar(v) }
    val path = Paths.get("SCALE_r18.json")
    val payload =
      if (!Files.exists(path))
        fresh.map { case (k, v) => s""""$k":$v""" }
          .mkString("{", ",", "}")
      else {
        // top-level key split (bracket-depth aware — array values
        // carry commas); fresh keys overwrite, others survive
        val body = Files.readString(path).trim
          .stripPrefix("{").stripSuffix("}")
        val parts = scala.collection.mutable.ArrayBuffer[String]()
        var depth = 0
        val sb = new StringBuilder
        body.foreach { ch =>
          if (ch == '[') depth += 1
          if (ch == ']') depth -= 1
          if (ch == ',' && depth == 0) { parts += sb.toString; sb.clear() }
          else sb.append(ch)
        }
        if (sb.nonEmpty) parts += sb.toString
        val freshKeys = fresh.map(_._1).toSet
        val kept = parts.filter { p =>
          !freshKeys(p.trim.stripPrefix("\"").takeWhile(_ != '"'))
        }
        (kept ++ fresh.map { case (k, v) => s""""$k":$v""" })
          .mkString("{", ",", "}")
      }
    Files.writeString(path, payload + "\n")
    println(payload)
    spark.stop()
  }
}

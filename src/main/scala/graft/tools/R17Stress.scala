package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-17 scale harness: two measured laws for the graph-ANN family.
  *
  * LEG A — blocked construction (VERDICT r16 #2): the in-code claim at
  * `Similarity.knnGraphExact` ("production feeds the SAME traversal
  * blocked edge lists") graded with counters instead of argument.
  * `ivfSeededGraph` builds the edge list from cell-blocked candidates
  * (probe-2 IVF assignment, nlist ∝ n so per-cell load stays ~flat);
  * the harness recounts the construction's ACTUAL candidate-pair
  * volume at a corpus and its 2× extension and grades
  *
  *  - candidate ratio ≈ the corpus ratio (LINEAR — the exact build's
  *    all-pairs volume grows 4× across the same step, also recounted);
  *  - traversal recall vs brute force ≥ 0.9 AT BOTH SIZES over the
  *    blocked graph with `cellMedoids` entry points (one per cell —
  *    the two-layer HNSW shape: the coarse quantizer is the upper
  *    layer), so the cheap construction still NAVIGATES.
  *
  * Corpus: [[StressUtil.clusteredEmbeddings]] — the clustered geometry
  * that is IVF's premise (and SemDedup's; real embedding spaces
  * cluster). The isotropic-replica corpus is the ANN worst case — on
  * it NO cell blocking can hold recall, which is exactly why xs15's
  * gated construction is the exact graph; the blocked path is the
  * production answer for the corpus class production actually has.
  *
  * LEG B — navigation cost (VERDICT r16 #3): the xs16 Hamming-steering
  * win counted, not argued. Both traversals score every visited node
  * exactly once, so per-round scored-row counters are deterministic:
  * xs15 pays a dim-length dot per scored row; xs16 pays one
  * xor+popcount Hamming per scored row, and exact dots only in the
  * rerank — |visited| of them in the gated full-rerank shape,
  * |queries|·shortlist in the production shortlisted shape (measured
  * here; recall re-checked against brute force at both rerank shapes).
  * Publishes per-round arrays and the op-weighted navigation ratio
  * (dim multiply-adds vs xor+2·popcount word ops).
  *
  * Wall/cpu are informational (host-era noise); graded numbers are
  * deterministic counters. Writes `SCALE_r17.json`.
  */
object R17Stress {

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

    val scratch = Files.createTempDirectory("r17stress").toString

    // ---------- LEG A: blocked-construction law ----------
    {
      // clustered corpus (IVF's premise): `members` satellites per
      // base vector at cos≈0.92 within a cluster, ≈0 across. With
      // members ≥ 4 every node's true top-3 are its own cluster-mates
      // — the recall target is geometric, not accidental. The 2×
      // step doubles members AND nlist (the production configuration:
      // nlist ∝ n keeps per-cell load flat), so the LINEAR candidate
      // law probe·n·load is what the recount must show while exact
      // all-pairs grows 4×.
      case class ALeg(n: Long, nlist: Int, blocked: Long, exact: Long,
        recall: Double, entries: Int)
      def aLeg(members: Int, nlist: Int): ALeg = {
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
        // the construction's ACTUAL candidate volume, recounted from
        // the same primary×probe cell join (ids only — no sims)
        def assigned(p: Int) = corpus.select(col("id"),
          graft.operators.HashFns.nearestCentroids(col("v"),
            cents.map(_._1), cents.map(_._2), p).as("cells"))
        val blocked = assigned(1)
          .select(col("id"), element_at(col("cells"), 1).as("cell"))
          .join(assigned(2).select(col("id").as("nb"),
            explode(col("cells")).as("cell")), "cell")
          .where(col("id") =!= col("nb")).count()
        val beam = Similarity.beamSearchTopK(corpus, queries, graph,
            "id", "v", entries, ef = 24, rounds = 10, k = 3)
          .select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val bf = Similarity.bruteForceTopK(corpus, queries, "id", "v",
            3).select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (bf & beam).size.toDouble / bf.size
        dropPersisted()
        println(f"[xs-blocked] n=$n%-6d nlist=$nlist blocked=$blocked " +
          f"exact=${n * (n - 1)} recall=$recall%.3f " +
          f"entries=${entries.size}")
        ALeg(n, nlist, blocked, n * (n - 1), recall, entries.size)
      }
      val a1 = aLeg(members = 4, nlist = 32)
      val a2 = aLeg(members = 8, nlist = 64)
      for ((l, p) <- Seq(a1 -> "blocked_f4", a2 -> "blocked_f8")) {
        results += s"${p}_n" -> l.n
        results += s"${p}_nlist" -> l.nlist
        results += s"${p}_entry_points" -> l.entries
        results += s"${p}_blocked_candidates" -> l.blocked
        results += s"${p}_exact_allpairs" -> l.exact
        results += s"${p}_blocked_frac" -> (l.blocked.toDouble / l.exact)
        results += s"${p}_recall" -> l.recall
      }
      val corpusRatio = a2.n.toDouble / a1.n
      val blockedRatio = a2.blocked.toDouble / a1.blocked
      val exactRatio = a2.exact.toDouble / a1.exact
      results += "blocked_corpus_ratio" -> corpusRatio
      results += "blocked_candidate_ratio" -> blockedRatio
      results += "blocked_exact_ratio" -> exactRatio
      require(a1.recall >= 0.9 && a2.recall >= 0.9,
        f"blocked-graph recall dropped: f4=${a1.recall}%.3f " +
          f"f8=${a2.recall}%.3f")
      // the construction must be cell-blocked at both sizes AND grow
      // linearly across the 2× step (nlist ∝ n keeps load flat; the
      // exact build grows ~4×, recounted above)
      require(a1.blocked < a1.exact / 4 && a2.blocked < a2.exact / 4,
        s"blocking buys nothing: ${a1.blocked}/${a1.exact}, " +
          s"${a2.blocked}/${a2.exact}")
      require(blockedRatio < 0.75 * exactRatio,
        f"blocked candidate ratio $blockedRatio%.2f tracks the exact " +
          f"all-pairs ratio $exactRatio%.2f — not a blocked build")
      require(blockedRatio < 1.6 * corpusRatio,
        f"blocked candidate ratio $blockedRatio%.2f is super-linear " +
          f"across the corpus ratio $corpusRatio%.2f step")
    }

    // ---------- LEG B: navigation-cost counters ----------
    {
      // the clustered corpus (sign-bit navigation's premise, the same
      // corpus class xs13's own recall gate uses — on isotropic data
      // every pair sits at hd≈32±4 and NO Hamming ranking can work)
      // with the LEG-A blocked graph and medoid entries: the full
      // production stack — blocked construction, integer navigation,
      // shortlisted exact rerank — counted end to end
      StressUtil.clusteredEmbeddings(spark, sfDir, scratch, 4)
      val corpus = spark.read
        .parquet(s"$scratch/embeddings_clustered.parquet")
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .localCheckpoint(true)
      val n = corpus.count()
      val queries = corpus.where(col("id") < 10).localCheckpoint(true)
      val nQ = queries.count()
      val cents = Similarity.kmeansCentroidsSeq(corpus, "id", "v", 32)
      val graph = Similarity.ivfSeededGraph(corpus, "id", "v", cents,
        probe = 2, k = 10).localCheckpoint(true)
      // Short ≈ 20·k: sized for the 64-bit signature's coarseness
      // (hd takes 65 values, ties are broad) — corpus-independent
      val Ef = 24; val Rounds = 10; val K = 3; val Short = 64
      val entries = Similarity.cellMedoids(corpus, "id", "v", cents)

      val dotRounds = scala.collection.mutable.ArrayBuffer[Long]()
      Similarity.beamSearchVisited(corpus, queries, graph, "id", "v",
        entries, Ef, Rounds, diagOut = dotRounds)
        .queryExecution.toRdd.count()
      val hamRounds = scala.collection.mutable.ArrayBuffer[Long]()
      val visitedBq = Similarity.beamSearchVisitedBQ(corpus, queries,
        graph, "id", "v", entries, Ef, Rounds, diagOut = hamRounds)
        .localCheckpoint(true)
      val bqNonSelf = visitedBq
        .where(col("id") =!= col("qid")).count()

      val dots15 = dotRounds.sum
      val hams16 = hamRounds.sum
      // rerank dot counts: gated shape pays the full visited set,
      // production shortlists to ≤ Short per query (both recounted)
      val rerankFull = bqNonSelf
      val rerankShort = math.min(bqNonSelf, nQ * Short)
      // recall of both rerank shapes vs brute force — a cheaper
      // traversal that stops finding neighbors would be a regression
      def pairsOf(df: DataFrame) = df.select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bf = pairsOf(Similarity.bruteForceTopK(corpus, queries,
        "id", "v", K))
      val recallFull = (bf & pairsOf(Similarity.beamSearchTopKBQ(
        corpus, queries, graph, "id", "v", entries, Ef, Rounds,
        K))).size.toDouble / bf.size
      val recallShort = (bf & pairsOf(Similarity.beamSearchTopKBQ(
        corpus, queries, graph, "id", "v", entries, Ef, Rounds, K,
        shortlist = Short))).size.toDouble / bf.size

      val dim = 64
      results += "nav_n" -> n
      results += "nav_queries" -> nQ
      results += "nav_dot_rounds" ->
        RawJson(dotRounds.mkString("[", ",", "]"))
      results += "nav_hamming_rounds" ->
        RawJson(hamRounds.mkString("[", ",", "]"))
      results += "nav_dots_xs15" -> dots15
      results += "nav_hammings_xs16" -> hams16
      results += "nav_rerank_dots_full" -> rerankFull
      results += "nav_rerank_dots_shortlist" -> rerankShort
      // op-weighted navigation cost: a 64-dim dot = 64 multiply-adds;
      // a sign-Hamming = xor + 2 popcounts ≈ 3 word ops on the packed
      // 64-bit signature
      results += "nav_ops_xs15" -> (dots15 * dim)
      results += "nav_ops_xs16_shortlist" ->
        (hams16 * 3 + rerankShort * dim)
      results += "nav_op_ratio" ->
        ((dots15 * dim).toDouble / (hams16 * 3 + rerankShort * dim))
      results += "nav_recall_full_rerank" -> recallFull
      results += "nav_recall_shortlist_rerank" -> recallShort
      require(recallFull >= 0.9 && recallShort >= 0.9,
        f"xs16 rerank recall dropped: full=$recallFull%.3f " +
          f"short=$recallShort%.3f")
      // the navigation win must be real: op-weighted xs16 (hamming
      // steering + shortlisted rerank) beats xs15's all-dot traversal
      require(hams16 * 3 + rerankShort * dim < dots15 * dim,
        s"no navigation win: ${hams16 * 3 + rerankShort * dim} ops vs " +
          s"${dots15 * dim}")
      dropPersisted()
      println(f"[nav] dots15=$dots15 hams16=$hams16 " +
        f"rerank_short=$rerankShort op_ratio=" +
        f"${(dots15 * dim).toDouble / (hams16 * 3 + rerankShort * dim)}%.1f " +
        f"recall full=$recallFull%.2f short=$recallShort%.2f")
    }

    // ---------- LEG C: hierarchical-descent visited law ----------
    // xs18's win counted at two corpus sizes: per-query top-3-medoid
    // seeding must (a) shrink the visited set vs the flat all-medoid
    // tier at BOTH sizes and (b) keep recall — and the shrink should
    // WIDEN as nlist grows with the corpus (flat seeds = nlist,
    // hierarchical seeds = 3 regardless).
    {
      case class CLeg(n: Long, nlist: Int, vFlat: Long, vHier: Long,
        recall: Double)
      def cLeg(members: Int, nlist: Int): CLeg = {
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
        val vF = visited(0); val vFlat = vF.count()
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
        println(f"[hier] n=$n%-6d nlist=$nlist flat=$vFlat " +
          f"hier=$vHier recall=$recall%.3f")
        CLeg(n, nlist, vFlat, vHier, recall)
      }
      val c1 = cLeg(members = 4, nlist = 32)
      val c2 = cLeg(members = 8, nlist = 64)
      for ((l, p) <- Seq(c1 -> "hier_f4", c2 -> "hier_f8")) {
        results += s"${p}_n" -> l.n
        results += s"${p}_visited_flat" -> l.vFlat
        results += s"${p}_visited_hier" -> l.vHier
        results += s"${p}_shrink" -> (l.vHier.toDouble / l.vFlat)
        results += s"${p}_recall" -> l.recall
      }
      require(c1.recall >= 0.9 && c2.recall >= 0.9,
        f"hier recall dropped: f4=${c1.recall}%.3f f8=${c2.recall}%.3f")
      require(c1.vHier < c1.vFlat && c2.vHier < c2.vFlat,
        "hierarchical seeding did not shrink the visited set")
      require(c2.vHier.toDouble / c2.vFlat <
          c1.vHier.toDouble / c1.vFlat,
        "the shrink must WIDEN as nlist grows with the corpus " +
          s"(${c1.vHier}/${c1.vFlat} then ${c2.vHier}/${c2.vFlat})")
    }

    val payload = results
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("SCALE_r17.json"), payload + "\n")
    println(payload)
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Sparse retrieval (SURVEY §2.11): BM25 top-k documents per query —
  * the RAG / nearest-reference lookup over a token corpus.
  *
  * Scale shape (xt20): the corpus token stream is restricted to the
  * BROADCAST query vocabulary BEFORE any aggregation, so the posting
  * tf/df build touches query-term occurrences only — the
  * full-vocabulary inverted index is never materialized. Document
  * length rides the explode (no corpus-wide length join); per-term
  * scores quantize to DECIMAL(28,12) so the per-(query,doc) sum is
  * order-free exact on any partitioning; the per-query ranking is the
  * bounded [[TopKPairs]] aggregate (≤ k pairs per partition per query
  * cross the wire — no corpus-volume sort).
  *
  * BM25 constants k1=1.2, b=0.75 (the (k1+1)=2.2 numerator form),
  * IDF = ln((N − df + 0.5)/(df + 0.5) + 1) — same formula family as
  * the xt10 single-query entry.
  */
object Retrieval {

  /** Top-k docs per query. `queryTerms`: (qid: long, w: string) —
    * tiny by construction (a query set, not a corpus). Output:
    * (qid, rnk 1..k, doc_id, score r4-rounded), ordered.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int): DataFrame = {
    import graft.queries.T.{davg, r4}
    val toksArr = docs.select(col(idCol).as("doc_id"),
      TextFns.tokens(col(textCol)).as("fw"))
    val n = docs.agg(count(lit(1)).as("n"))
    val al = toksArr.where(size(col("fw")) > 0)
      .agg(davg(size(col("fw"))).as("avglen"))
    val postings = toksArr
      .select(col("doc_id"), size(col("fw")).as("len"),
        explode(col("fw")).as("w"))
      .join(broadcast(queryTerms.select("w").distinct()), "w")
      .groupBy("w", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("len")).as("len"))
    val dfq = postings.groupBy("w").agg(count(lit(1)).as("df"))
    val contrib = postings.join(broadcast(queryTerms), "w")
      .join(broadcast(dfq), "w")
      .crossJoin(broadcast(n)).crossJoin(broadcast(al))
      .select(col("qid"), col("doc_id"),
        (log((col("n").cast(DoubleType) - col("df") + 0.5) /
            (col("df") + 0.5) + 1.0)
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("len") / col("avglen"))))
          .cast(DecimalType(28, 12)).as("c"))
    val scored = contrib.groupBy("qid", "doc_id")
      .agg(sum(col("c")).cast(DoubleType).as("raw"))
    scored.groupBy("qid")
      .agg(TopK.topKPairs(col("raw"), col("doc_id"), k).as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("doc_id"), r4(col("col.sim")).as("score"))
      .orderBy("qid", "rnk")
  }

  /** Intermediate frames of [[maxScoreTopK]], exposed for the
    * work-counter spec: `impacts` is the per-posting impact index,
    * `essential` the per-query surviving terms, `candDocs` the
    * (qid, doc_id) pairs that reach exact scoring — the pruning win
    * is `candDocs`/`scored-volume` vs the brute Σ_q Σ_{t∈q} df_t.
    */
  private[graft] case class MaxScoreParts(impacts: DataFrame,
      essential: DataFrame, candDocs: DataFrame, result: DataFrame)

  /** Exact top-k BM25 with MaxScore dynamic pruning (Turtle & Flood
    * 1995; the batch re-expression of the block-max/WAND family of
    * Ding & Suel 2011): identical output to a brute [[bm25TopK]]
    * ranking — the pruning is EXACTNESS-PRESERVING, the LSH/Bloom
    * contract — while the expensive per-(query,doc) scoring stage
    * touches only docs that can still reach the top k.
    *
    * How: per-term impact upper bound U_w = max posting contribution
    * (one agg over the impact index). θ seeds from the RAREST terms:
    * per query, the minimal U-descending term prefix whose cumulative
    * df reaches k, each term contributing only its k highest-impact
    * postings (bounded [[TopKPairs]] — a common term that slips into
    * the seed prefix never ships its whole list); the seed docs are
    * scored EXACTLY and θ = the k-th seed score — a LOWER bound on
    * the true k-th score, since it is the k-th best of a doc subset.
    * Terms in the longest U-ascending prefix with P_i = ΣU_j < θ are
    * non-essential: a doc matching ONLY them scores ≤ P_i < θ ≤ the
    * true k-th score, so it cannot reach or even tie the top k —
    * candidate docs are exactly those with ≥1 essential-term
    * posting. At 100 TB the non-essential lists are the LONG ones
    * (common words have low idf ⇒ low U): their postings are read
    * only via the bounded doc_id semi-join, never scanned per query.
    *
    * Exactness discipline: contributions are the same DECIMAL(28,12)
    * quantized terms as [[bm25TopK]], so per-doc sums are order-free
    * exact; ranking-facing scores then cast to DOUBLE through the
    * IDENTICAL expression as the brute scorer, and the final ranking
    * is the same bounded [[TopKPairs]] stage — so "pruned == brute"
    * holds bit-for-bit. The θ/prefix comparison happens in that same
    * double space with a STRICT inequality: a pruned doc's double
    * score ≤ cast(P_i) < θ = the k-th seed double, so at least k
    * docs beat it strictly — no double-rounding tie can resurrect a
    * pruned doc, whatever the doc_id tiebreak says. The xt25 oracle
    * IS the brute replay and must hash-match. The index build scans
    * the corpus once, as any retrieval index build does.
    */
  def maxScoreTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int): DataFrame =
    maxScoreParts(docs, idCol, textCol, queryTerms, k).result

  private[graft] def maxScoreParts(docs: DataFrame, idCol: String,
      textCol: String, queryTerms: DataFrame, k: Int): MaxScoreParts = {
    import graft.queries.T.{davg, r4}
    import org.apache.spark.sql.expressions.Window
    val toksArr = docs.select(col(idCol).as("doc_id"),
      TextFns.tokens(col(textCol)).as("fw"))
    val n = docs.agg(count(lit(1)).as("n"))
    val al = toksArr.where(size(col("fw")) > 0)
      .agg(davg(size(col("fw"))).as("avglen"))
    val postings = toksArr
      .select(col("doc_id"), size(col("fw")).as("len"),
        explode(col("fw")).as("w"))
      .join(broadcast(queryTerms.select("w").distinct()), "w")
      .groupBy("w", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("len")).as("len"))
    val dfq = postings.groupBy("w").agg(count(lit(1)).as("df"))
    // the impact index: per-posting decimal contribution (identical
    // expression to bm25TopK), materialized once and reused by the
    // U-bound agg, the θ seed scoring, and the candidate scoring
    val impacts = postings.join(broadcast(dfq), "w")
      .crossJoin(broadcast(n)).crossJoin(broadcast(al))
      .select(col("w"), col("doc_id"),
        (log((col("n").cast(DoubleType) - col("df") + 0.5) /
            (col("df") + 0.5) + 1.0)
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("len") / col("avglen"))))
          .cast(DecimalType(28, 12)).as("c"))
      .localCheckpoint()
    val uBound = impacts.groupBy("w").agg(max(col("c")).as("u"))
    // per-query term bounds + df; corpus-absent terms drop out (they
    // contribute nothing in the brute ranking either)
    val qt = queryTerms.select("qid", "w").join(broadcast(uBound), "w")
      .join(broadcast(dfq), "w")
    // P_i: U-ascending prefix sums, exact in decimal then cast once
    // to double — cast is monotone, so cast(P_i) still upper-bounds
    // the double score of any doc matching only prefix terms
    val qpref = qt.withColumn("pref", sum(col("u")).over(
        Window.partitionBy("qid").orderBy(col("u").asc, col("w").asc))
      .cast(DoubleType))
    // seed terms: the minimal rarest-first (U desc) prefix whose
    // EXCLUSIVE cumulative df is < k — the seed pool reaches k docs
    // whenever the query's full match set does, and no further
    // common list is pulled once the rare ones already cover k
    val seedTerms = qt.withColumn("cum", coalesce(sum(col("df")).over(
        Window.partitionBy("qid").orderBy(col("u").desc, col("w").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("cum") < k).select("qid", "w")
    // per seed term only its k highest-impact postings feed θ (any
    // seed subset yields a valid lower bound; highest-impact keeps θ
    // tight) — TopKPairs, so a common seed term's long list shrinks
    // map-side and never crosses the wire whole
    val seedDocs = impacts.join(broadcast(seedTerms), "w")
      .groupBy("qid", "w")
      .agg(TopK.topKPairs(col("c").cast(DoubleType), col("doc_id"), k)
        .as("hits"))
      .select(col("qid"), explode(col("hits")).as("h"))
      .select(col("qid"), col("h.id").as("doc_id")).distinct()
    val seedIds = seedDocs.select("doc_id").distinct()
    // exact FULL scores of the seed docs, through the identical
    // decimal-sum→double expression as the brute scorer
    val seedScores = impacts.join(seedIds, Seq("doc_id"), "left_semi")
      .join(broadcast(queryTerms.select("qid", "w")), "w")
      .join(seedDocs, Seq("qid", "doc_id"), "left_semi")
      .groupBy("qid", "doc_id")
      .agg(sum(col("c")).cast(DoubleType).as("s"))
    // θ = the k-th seed double score. Fewer than k seed docs ⇒ no
    // θ ⇒ every term stays essential (degenerates to brute).
    val theta = seedScores.withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("s").desc, col("doc_id"))))
      .where(col("rn") === k)
      .select(col("qid"), col("s").as("theta"))
    // strict <: a pruned doc's double score ≤ cast(P_i) < θ, and ≥ k
    // seed docs score ≥ θ — it cannot reach or tie the top k
    val essential = qpref.join(theta, Seq("qid"), "left")
      .where(col("theta").isNull || col("pref") >= col("theta"))
      .select(col("qid"), col("w"))
    val candDocs = impacts.join(broadcast(essential), "w")
      .select(col("qid"), col("doc_id")).distinct()
    val candIds = candDocs.select("doc_id").distinct()
    val scored = impacts.join(candIds, Seq("doc_id"), "left_semi")
      .join(broadcast(queryTerms.select("qid", "w")), "w")
      .join(candDocs, Seq("qid", "doc_id"), "left_semi")
      .groupBy("qid", "doc_id")
      .agg(sum(col("c")).cast(DoubleType).as("raw"))
    // final ranking = the brute scorer's own bounded TopKPairs stage
    // over the pruned candidate set — identical expression chain, so
    // equal inputs give bit-equal output
    val result = scored.groupBy("qid")
      .agg(TopK.topKPairs(col("raw"), col("doc_id"), k).as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("doc_id"), r4(col("col.sim")).as("score"))
      .orderBy("qid", "rnk")
    MaxScoreParts(impacts, essential, candDocs, result)
  }

  /** The xt20 query derivation: each doc with id < `nQueries` is a
    * query whose terms are its first 8 distinct tokens alphabetically
    * (deterministic in Spark and DuckDB alike).
    */
  def queriesFromDocs(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int): DataFrame =
    docs.where(col(idCol) < nQueries)
      .select(col(idCol).as("qid"),
        explode(slice(array_sort(array_distinct(
          TextFns.tokens(col(textCol)))), 1, 8)).as("w"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR'09) of
    * two per-query ranked lists — the standard hybrid-retrieval merge
    * of a sparse (BM25) and a dense (ANN) arm in a RAG stack. Inputs:
    * (qid, id, rnk) each; score = Σ_arms 1/(c + rnk), a missing arm
    * contributing 0. Deterministic by construction: the ranks are
    * ints, each reciprocal is one IEEE division, and the sum is two
    * terms in fixed arm order — exactly replayable in SQL, so unlike
    * the arms themselves (approximate retrieval) the FUSION is
    * hash-gated with no rounding risk beyond the displayed r4.
    *
    * Scale shape: both inputs are bounded top-k lists (≤ k rows per
    * query), so the full-outer join and the per-query rank window
    * touch queries×k rows — nothing corpus-sized. Output: (qid, rnk
    * 1..k, id, score r4), ties broken by id.
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    import graft.queries.T.r4
    import org.apache.spark.sql.expressions.Window
    val s = sparse.select(col("qid"), col("id"), col("rnk").as("__rs"))
    val dn = dense.select(col("qid"), col("id"), col("rnk").as("__rd"))
    val fused = s.join(dn, Seq("qid", "id"), "full_outer")
      .select(col("qid"), col("id"),
        (coalesce(lit(1.0) / (lit(c) + col("__rs")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("__rd")), lit(0.0)))
          .as("__score"))
    fused.withColumn("rnk", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("__score").desc, col("id"))).cast(IntegerType))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id"),
        r4(col("__score")).as("score"))
      .orderBy("qid", "rnk")
  }
}

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

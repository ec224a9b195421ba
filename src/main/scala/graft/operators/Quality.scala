package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Quality-classifier scoring (SURVEY §2.11, the GPT-3/LLaMA "trained
  * classifier" filter with a deterministic stand-in model): multinomial
  * Naive Bayes fit on two labeled source slices, scoring any document
  * set by token log-likelihood ratio plus the doc-count prior.
  *
  * Factored out of the xt18 declared query so the SAME model/scoring
  * code serves the batch entry and the qs11 stream (score the incoming
  * crawl with a FROZEN model — the model frames are fit once on the
  * static corpus and broadcast into every micro-batch's scoring join).
  *
  * Exactness contract (both engines replay it): integer counts → LN
  * doubles → DECIMAL(28,12) per-token quantization → order-free exact
  * sum; unknown tokens take the symmetric add-1 floor via LEFT join +
  * COALESCE (never silently dropped by an inner join).
  *
  * Scale shape: one token explode over the training slices feeds the
  * per-word count table (vocab-sized — broadcast when small, a plain
  * equi-join at 100TB vocabularies); scoring is explode → model join →
  * one doc_id rollup shuffle. Nothing ever collects to the driver.
  */
object Quality {

  /** Frozen NB model: per-word class counts + token totals + doc-count
    * prior inputs. All three frames are tiny relative to any corpus
    * (vocab / 1 / 1 rows) and deterministic given the corpus slice.
    */
  final case class NbModel(cw: DataFrame, tot: DataFrame, dc: DataFrame)

  /** Fit on `corpus` rows whose `source` is `posSrc` (positive class)
    * or `negSrc` (negative class); other rows are unlabeled and
    * ignored by the fit (but still scorable).
    */
  def fitNb(corpus: DataFrame, posSrc: String = "src0",
      negSrc: String = "src1"): NbModel = {
    val tr = corpus.where(col("source").isin(posSrc, negSrc))
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("w"))
    val cw = tr.groupBy("w").agg(
      count(when(col("source") === posSrc, 1)).as("cp"),
      count(when(col("source") === negSrc, 1)).as("cn"))
    val tot = tr.agg(
      count(when(col("source") === posSrc, 1)).as("np"),
      count(when(col("source") === negSrc, 1)).as("nn"),
      countDistinct(col("w")).as("v"))
    val dc = corpus.where(col("source").isin(posSrc, negSrc)).agg(
      count(when(col("source") === posSrc, 1)).as("dp"),
      count(when(col("source") === negSrc, 1)).as("dn"))
    NbModel(cw, tot, dc)
  }

  /** Freeze a fitted model: materialize the three frames so a long
    * stream does not re-aggregate the training corpus per batch.
    */
  def freeze(m: NbModel): NbModel =
    NbModel(m.cw.localCheckpoint(true), m.tot.localCheckpoint(true),
      m.dc.localCheckpoint(true))

  /** Score `docs`: (doc_id, n_tok, log_odds r4-rounded, pred 0/1),
    * ordered by doc_id. Docs with zero tokens produce no row (no
    * token evidence — same contract in the SQL replay).
    */
  def scoreNb(docs: DataFrame, m: NbModel): DataFrame = {
    val tk = docs.select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("w"))
    val lp = tk.join(m.cw, Seq("w"), "left").crossJoin(broadcast(m.tot))
      .select(col("doc_id"),
        (log((coalesce(col("cp"), lit(0L)) + 1).cast(DoubleType)
            / (col("np") + col("v")))
          - log((coalesce(col("cn"), lit(0L)) + 1).cast(DoubleType)
            / (col("nn") + col("v"))))
          .cast(DecimalType(28, 12)).as("l"))
    val lo = log(col("dp").cast(DoubleType) / col("dn")) +
      col("sl").cast(DoubleType)
    lp.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("l")).as("sl"))
      .crossJoin(broadcast(m.dc))
      .select(col("doc_id"), col("n_tok"),
        // the r4 grain (queries.T.r4) inlined — operators must not
        // depend back on the query layer
        (floor(lo * 10000 + 0.5) / 10000.0).as("log_odds"),
        (lo > 0).cast(IntegerType).as("pred"))
      .orderBy("doc_id")
  }
}

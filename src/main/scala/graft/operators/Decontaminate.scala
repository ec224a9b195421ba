package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/benchmark decontamination (SURVEY §2.11 extension): find
  * training documents that share at least one word n-gram with a
  * benchmark/eval document — the standard train-test contamination
  * check for LLM training corpora (13-gram-style overlap scans).
  *
  * Scale shape: the benchmark side is small by construction (an eval
  * suite, not a corpus), so its exploded distinct-shingle set is
  * BROADCAST — the train side streams through a broadcast hash join
  * with no shuffle of the corpus, then one aggregation keyed by the
  * (already-filtered, tiny) contaminated-doc set. Shingling is the
  * single-pass [[WordShingles]] expression.
  */
object Decontaminate {

  /** Per-train-doc contamination report: (train_id, distinct shared
    * shingles, distinct benchmark docs hit). Clean docs don't appear.
    */
  def overlapReport(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    def sh(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(HashFns.wordShingles(col(textCol), n)).as("s"))
    sh(train, "train_id")
      .join(broadcast(sh(bench, "bench_id")), "s")
      .groupBy("train_id")
      .agg(countDistinct(col("s")).as("n_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}

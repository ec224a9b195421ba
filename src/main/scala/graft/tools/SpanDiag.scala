package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Dedup, ParagraphSplitter}

/** Span-level LSH occupancy diagnostic for the paragraph-dedup near
  * stage: builds xd10's exact-survivor span table with the PRODUCTION
  * code ([[Dedup.paragraphSpanStore]] / [[Dedup.minhashBanded]] — not
  * a re-implementation, so it cannot desynchronize from the operator
  * it measures), bands it at the production-derived (bands,
  * rowsPerBand), and reports the bucket-size histogram plus
  * capped/uncapped candidate volumes — the measured decomposition
  * behind the autoMaxBucket story (where does the near-stage join
  * work actually live, and how much of it does the cap remove).
  *
  * Usage: runMain graft.tools.SpanDiag <corpusDir> [paraWords] [thr]
  */
object SpanDiag {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_sf1")
    val paraWords = args.lift(1).map(_.toInt).getOrElse(6)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val shingleN = 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val s1 = Dedup.paragraphSpanStore(docs, "doc_id", "text",
        ParagraphSplitter.FixedWindow(paraWords))
      .where(col("nw") >= shingleN)
      .select(col("pid").as("__id"),
        TextFns.wordShingles(col("ptext"), shingleN).as("__sh"))
      .localCheckpoint(true)
    val n = s1.count()
    val (bands, rows) = Dedup.minhashParams(n, recallAt = threshold)
    val cap = Dedup.autoMaxBucket(n)
    println(s"[spandiag] spans=$n derived bands=$bands rows=$rows cap=$cap")

    val buckets = Dedup.minhashBanded(s1, "__id", "__sh", bands, rows)
      .groupBy("__band", "__key").agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val hist = buckets.groupBy(
        when(col("m") === 1, lit("1"))
          .when(col("m") <= 4, lit("2-4"))
          .when(col("m") <= 16, lit("5-16"))
          .when(col("m") <= 64, lit("17-64"))
          .when(col("m") <= cap, lit(s"65-cap($cap)"))
          .otherwise(lit("hot(>cap)")).as("bucket_size"))
      .agg(count(lit(1)).as("buckets"), sum("m").as("members"),
        sum(expr("m * (m - 1) DIV 2")).as("cand_pairs"))
      .orderBy("bucket_size")
    hist.collect().foreach(r => println(
      f"[spandiag] size=${r.getString(0)}%-12s buckets=${r.getLong(1)}%10d " +
        f"members=${r.getLong(2)}%10d cand_pairs=${r.getLong(3)}%12d"))
    val tot = buckets.agg(
      sum(expr("m * (m - 1) DIV 2")).as("uncapped"),
      sum(expr("CASE WHEN m <= " + cap +
        " THEN m * (m - 1) DIV 2 ELSE 0 END")).as("capped")).head
    println(s"[spandiag] cand_volume uncapped=${tot.getLong(0)} " +
      s"capped=${tot.getLong(1)} " +
      f"removed=${1.0 - tot.getLong(1).toDouble /
        math.max(1L, tot.getLong(0))}%.4f")
    spark.stop()
  }
}

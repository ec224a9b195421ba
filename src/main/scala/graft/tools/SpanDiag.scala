package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFns
import graft.operators.{Dedup, HashFns}

/** Span-level LSH occupancy diagnostic for the paragraph-dedup near
  * stage: rebuilds xd10's exact-survivor span table over a corpus,
  * bands it at the production-derived (bands, rowsPerBand), and
  * reports the bucket-size histogram plus capped/uncapped candidate
  * volumes — the measured decomposition behind the autoMaxBucket
  * story (where does the near-stage join work actually live, and how
  * much of it does the cap remove).
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
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // exact-survivor spans, same construction as paragraphDedup
    val words = filter(split(lower(col("text")), "\\s+"), w => w =!= "")
    val paras = docs
      .select(col("doc_id").cast(LongType).as("doc_id"), words.as("__w"))
      .where(size(col("__w")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          ceil(size(col("__w")) / lit(paraWords.toDouble)).cast("int")
            - lit(1)),
        i => slice(col("__w"), i * paraWords + 1, lit(paraWords))))
        .as(Seq("idx", "__pw")))
      .select(struct(col("doc_id"), col("idx")).as("pid"),
        array_join(col("__pw"), " ").as("ptext"),
        size(col("__pw")).as("nw"))
    val s1 = paras
      .withColumn("__fp", min(col("pid")).over(Window.partitionBy("ptext")))
      .where(col("pid") === col("__fp"))
      .where(col("nw") >= shingleN)
      .select(col("pid").as("id"), col("ptext"))
      .localCheckpoint(true)
    val n = s1.count()
    val (bands, rows) = Dedup.minhashParams(n, recallAt = threshold)
    val cap = Dedup.autoMaxBucket(n)
    println(s"[spandiag] spans=$n derived bands=$bands rows=$rows cap=$cap")

    val banded = s1.select(col("id"),
      HashFns.minhashSignature(TextFns.wordShingles(col("ptext"), shingleN),
        bands * rows).as("__sig"))
      .select(col("id"), posexplode_outer(transform(
        sequence(lit(0), lit(bands - 1)),
        i => slice(col("__sig"), i * rows + 1, lit(rows))))
        .as(Seq("__band", "__k0")))
      .select(col("__band"), xxhash64(col("__k0")).as("__key"))
      .groupBy("__band", "__key").agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val hist = banded.groupBy(
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
    val tot = banded.agg(
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

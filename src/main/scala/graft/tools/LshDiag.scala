package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.HashFns

/** One-off diagnostic: hyperplane-LSH bucket occupancy + candidate
  * volume on the scale corpus (drives the banding-parameter choice).
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_sf1")
    val bands = args.lift(1).map(_.toInt).getOrElse(96)
    val bits = args.lift(2).map(_.toInt).getOrElse(12)
    val center = args.lift(3).contains("center")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // shared planted-corpus definition (see DedupQueries Scaladoc)
    val corpus = graft.queries.DedupQueries.plantedEmbeddingCorpus(emb)
    val vec =
      if (!center) corpus
      else {
        val dim = corpus.selectExpr("size(v)").first().getInt(0)
        val mean = corpus
          .select((0 until dim).map(i =>
            avg(element_at(col("v"), i + 1)).as(s"m$i")): _*)
          .first()
        val mcol = array((0 until dim).map(i =>
          lit(mean.getDouble(i))): _*)
        corpus.select(col("id"),
          zip_with(col("v"), mcol, (a, b) => a - b).as("v"))
      }
    val banded = vec.select(col("id"),
      posexplode_outer(HashFns.hyperplaneBands(col("v"), bands, bits,
        0x5eed)).as(Seq("__band", "__key")))
    val sizes = banded.groupBy("__band", "__key")
      .agg(count(lit(1)).as("m")).cache()
    val stats = sizes.agg(count(lit(1)).as("buckets"), max("m").as("max_m"),
      avg("m").as("avg_m"),
      sum(col("m") * (col("m") - 1) / 2).as("pair_volume")).first()
    println(s"center=$center bands=$bands bits=$bits " +
      s"buckets=${stats.getLong(0)} max=${stats.getLong(1)} " +
      f"avg=${stats.getDouble(2)}%.1f pairVolume=${stats.get(3)}")
    spark.stop()
  }
}

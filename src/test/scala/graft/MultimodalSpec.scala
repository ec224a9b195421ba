package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.queries.T

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(schema("width") == "integer" && schema("height") == "integer")
    val r = media.orderBy("media_id").limit(1).collect()(0)
    val nb = r.getAs[Long]("n_bytes")
    assert(r.getAs[Array[Byte]]("payload").length.toLong == nb)
    assert(r.getAs[Int]("width") == 64 + (nb % 576).toInt)
  }

  test("decode+featurize via mapPartitions: normalized histograms, " +
      "deterministic") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.decodeAndFeaturize(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.histogram.length == 16)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    }
    // repartitioning must not change per-row results
    val feats2 = Multimodal.decodeAndFeaturize(media.repartition(7))
      .collect().map(f => f.media_id -> f.histogram.toSeq).toMap
    assert(feats.map(f => f.media_id -> f.histogram.toSeq).toMap == feats2)
  }
}

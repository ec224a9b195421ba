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

  test("resize rewrites metadata, keeps payload; no shuffle in plan") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
      .as[Multimodal.MediaRecord]
    val resized = Multimodal.resize(media, 224, 224)
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize must be a narrow map:\n$plan")
    val r = resized.orderBy("media_id").limit(1).collect()(0)
    assert(r.width == 224 && r.height == 224)
    assert(r.payload.nonEmpty)
  }

  test("frame sampling emits every stride-th frame, payload partitioned") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(T.t(spark, sf0001, "documents"))
      .as[Multimodal.MediaRecord].limit(5)
    val frames = Multimodal.sampleFrames(media, frameCount = 8, stride = 3)
      .collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.size == 5)
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_no).sorted.toSeq == Seq(0, 3, 6))
    }
    // sampled frames are disjoint slices of the payload
    val one = media.orderBy("media_id").limit(1)
      .collect()(0)
    val sampled = frames.filter(_.media_id == one.media_id)
      .sortBy(_.frame_no)
    // ceil framing tiles the whole payload; no frame starts past the end
    val frameSize = math.max(1, (one.payload.length + 7) / 8)
    sampled.foreach { f =>
      assert(f.frame_no * frameSize < one.payload.length)
      val expect = java.util.Arrays.copyOfRange(one.payload,
        f.frame_no * frameSize,
        math.min(f.frame_no * frameSize + frameSize, one.payload.length))
      assert(java.util.Arrays.equals(f.frame, expect))
      assert(f.frame.nonEmpty)
    }
    // stride=1 over a tiny payload: frames concatenate to the payload,
    // no empty frames for payload shorter than frameCount
    import spark.implicits._
    val tiny = Seq(Multimodal.MediaRecord(99L, "video",
      Array[Byte](1, 2, 3, 4, 5), 0, 0, 5L)).toDS()
    val tf = Multimodal.sampleFrames(tiny, frameCount = 8, stride = 1)
      .collect().sortBy(_.frame_no)
    assert(tf.forall(_.frame.nonEmpty))
    assert(tf.flatMap(_.frame).toSeq == Seq[Byte](1, 2, 3, 4, 5))
  }
}

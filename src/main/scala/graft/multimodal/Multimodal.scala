package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2.11): media as opaque `binary`
  * payloads plus a typed metadata struct, processed with batch-shaped
  * `mapPartitions` over typed Datasets — the Scala analog of PySpark's
  * `mapInPandas` (iterator-of-batches in, iterator-of-batches out, no
  * per-row UDF dispatch, constant memory per partition).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): [[DecodeStub]] produces a deterministic fake decode
  * from the payload bytes. The Spark-side plumbing — schema, encoders,
  * partitioning, batch iteration, feature shape — is real and tested
  * (MultimodalSpec).
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_bytes: Long)

  /** Output of the (stubbed) decode + feature-extraction stage. */
  case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      histogram: Array[Double])

  /** STUB decode: a real implementation would parse the image/audio
    * container here (payload → pixel/sample buffer). The deterministic
    * fake derives "dimensions" from the byte length and "pixels" from
    * the bytes themselves, keeping every downstream shape honest.
    */
  object DecodeStub {
    def dims(nBytes: Long): (Int, Int) =
      (64 + (nBytes % 576).toInt, 64 + ((nBytes * 7) % 416).toInt)

    /** 16-bin byte histogram, L1-normalized — stands in for an image
      * feature vector.
      */
    def features(payload: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      var i = 0
      while (i < payload.length) {
        h((payload(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < 16) { h(j) /= payload.length; j += 1 }
      }
      h
    }
  }

  /** Wrap a text table as a media table: payload = utf-8 bytes (the
    * honest parts — BinaryType column, metadata struct — are exactly
    * what a real image table would carry).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast(LongType))
      .withColumn("width", (lit(64) + col("n_bytes") % 576).cast(IntegerType))
      .withColumn("height",
        (lit(64) + (col("n_bytes") * 7) % 416).cast(IntegerType))

  /** Batch decode + feature extraction via typed mapPartitions: one
    * decode context per partition (the expensive part for real codecs),
    * streaming over rows.
    */
  def decodeAndFeaturize(media: Dataset[MediaRecord])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stub) decoder goes here
      it.map { r =>
        val feats = DecodeStub.features(r.payload)
        MediaFeatures(r.media_id, r.kind, r.width, r.height, feats)
      }
    }
  }

  /** Resize stage (stub): a real implementation re-encodes the pixel
    * buffer at (targetW, targetH); the stub rewrites the metadata and
    * keeps the payload opaque. The Spark shape is the honest part —
    * a narrow per-partition map, no shuffle, metadata struct updated
    * in-plan.
    */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => r.copy(width = targetW, height = targetH))
    }
  }

  /** One sampled frame of a (stub-)video payload. */
  case class MediaFrame(
      media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame sampling (stub decode): treat the payload as `frameCount`
    * fixed-size frames and emit every `stride`-th one — the row-
    * expanding iterator-to-iterator shape of real video sampling
    * (one decoder per partition, frames streamed out, never the whole
    * video's frames in memory at once).
    */
  def sampleFrames(media: Dataset[MediaRecord], frameCount: Int,
      stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(frameCount > 0 && stride > 0)
    media.mapPartitions { it =>
      it.flatMap { r =>
        // ceil framing: frames tile the WHOLE payload (no unreachable
        // tail bytes); frames past the end are skipped, not emitted
        // empty (short payloads yield fewer frames)
        val frameSize =
          math.max(1, (r.payload.length + frameCount - 1) / frameCount)
        (0 until frameCount by stride).iterator
          .map(f => (f, f * frameSize,
            math.min(f * frameSize + frameSize, r.payload.length)))
          .takeWhile { case (_, from, _) => from < r.payload.length }
          .map { case (f, from, until) =>
            MediaFrame(r.media_id, f,
              java.util.Arrays.copyOfRange(r.payload, from, until))
          }
      }
    }
  }
}

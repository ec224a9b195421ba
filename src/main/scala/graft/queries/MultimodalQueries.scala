package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.Multimodal
import T._

/** Multimodal-column entries (SURVEY §2.11): binary payload handling is
  * oracle-checked (byte length / hash / derived metadata are exact SQL);
  * the decode+feature mapPartitions pipeline is rows-only checked here
  * and value-tested in MultimodalSpec.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    Q("xm1_media_meta",
      """SELECT media_id, n_bytes, width, height, sha FROM (
        |  SELECT doc_id AS media_id,
        |    CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
        |    CAST(64 + OCTET_LENGTH(ENCODE(text)) % 576 AS INT) AS width,
        |    CAST(64 + (OCTET_LENGTH(ENCODE(text)) * 7) % 416 AS INT)
        |      AS height,
        |    SUBSTR(SHA256(text), 1, 16) AS sha
        |  FROM documents
        |) ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.asMediaTable(t(s, d, "documents"))
        .select(col("media_id"), col("n_bytes").cast(IntegerType).as("n_bytes"),
          col("width"), col("height"),
          substring(sha2(col("payload"), 256), 1, 16).as("sha"))
        .orderBy("media_id")
    },

    // Decode + featurize through the typed mapPartitions pipeline; the
    // histogram is reduced to a stable scalar per row for the driver's
    // rows-only check (full vectors asserted in MultimodalSpec).
    Q.noOracle("xm2_media_features") { (s, d) =>
      import s.implicits._
      val media = Multimodal.asMediaTable(t(s, d, "documents"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodeAndFeaturize(media)
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("histogram"), 7), 4).as("h7"))
        .orderBy("media_id")
    }
  )
}

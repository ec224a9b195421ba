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
    },

    // REAL image decode: each doc becomes a genuine 24bpp BMP (dims
    // planted from the id, pixels from the text), and the query
    // recovers width/height/bpp/pixel-count by PARSING the container
    // bytes. The oracle recomputes the planted formulas in SQL — a
    // decoder bug (stride, bottom-up rows, header offsets) breaks the
    // hash match. Both stages are narrow per-partition maps.
    Q("xm3_bmp_decode",
      """SELECT doc_id AS media_id,
        |CAST(8 + doc_id % 24 AS INT) AS width,
        |CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |CAST(24 AS INT) AS bpp,
        |CAST((8 + doc_id % 24) * (8 + (doc_id * 3) % 16) * 3 AS INT)
        |  AS npx
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.decodeBmpMeta(
          Multimodal.encodeBmpTable(t(s, d, "documents")))
        .toDF().orderBy("media_id")
    },

    // Real audio decode: 16-bit PCM WAV per doc (rate/channels from
    // the id, frame count from the text byte length), metadata
    // recovered by walking the RIFF chunks. Duration is exact integer
    // math in both engines.
    Q("xm4_wav_decode",
      """SELECT doc_id AS media_id,
        |CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |CAST(1 + doc_id % 2 AS INT) AS channels,
        |CAST(16 AS INT) AS bits,
        |CAST(50 + OCTET_LENGTH(ENCODE(COALESCE(text, ''))) % 200
        |  AS INT) AS n_frames,
        |CAST((50 + OCTET_LENGTH(ENCODE(COALESCE(text, ''))) % 200)
        |  * 1000
        |  // (8000 + (doc_id % 4) * 4000) AS INT) AS dur_ms
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.decodeWavMeta(
          Multimodal.encodeWavTable(t(s, d, "documents")))
        .toDF().orderBy("media_id")
    }
  )
}

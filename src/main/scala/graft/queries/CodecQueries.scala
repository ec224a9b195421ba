package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.RqEngine
import graft.functions.CodecFns
import T._

/** Codec-matrix entries for the oracle gate (SURVEY §2.1/§2.2): each
  * query pushes real table data THROUGH a codec (Catalyst expression or
  * the rq DSv2 source/sink) and re-aggregates; the DuckDB oracle
  * computes the same aggregate directly on parquet. A hash match proves
  * the codec round-trip is lossless for the exercised shapes.
  */
object CodecQueries {

  val all: Seq[Q] = Seq(
    // MessagePack via Catalyst expressions: row → JSON → msgpack →
    // JSON → fields.
    Q("qc1_msgpack_expr",
      s"""SELECT COUNT(*) AS n, ${dsumSql("o_totalprice")} AS s
         |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select(CodecFns.from_msgpack(CodecFns.to_msgpack(
          to_json(struct(col("o_orderkey"), col("o_totalprice")))))
          .as("j"))
        .select(
          get_json_object(col("j"), "$.o_totalprice").cast(DoubleType)
            .as("tp"))
        .agg(count(lit(1)).as("n"), dsum(col("tp")).as("s"))
    },

    // CBOR via the rq DSv2 sink+source (file round-trip).
    Q("qc2_cbor_dsv2",
      """SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS ids,
        |CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents""".stripMargin) { (s, d) =>
      val engine = new RqEngine(s)
      val dir = Files.createTempDirectory("qc2").toString
      engine.write("cbor",
        t(s, d, "documents").select("doc_id", "n_chars"), dir)
      engine.readTyped("cbor", dir)
        .agg(count(lit(1)).as("n"),
          sum("doc_id").as("ids"), sum("n_chars").as("chars"))
    },

    // rq CSV semantics (headerless, all cells strings) via DSv2.
    Q("qc3_csv_rq",
      """SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS ks
        |FROM nation""".stripMargin) { (s, d) =>
      val engine = new RqEngine(s)
      val dir = Files.createTempDirectory("qc3").toString
      // record = Sequence of strings (reference S2/K4 shape)
      engine.write("csv",
        t(s, d, "nation").select(to_json(array(
          col("n_nationkey").cast(StringType),
          col("n_name"))).as("value")), dir)
      engine.read("csv", dir)
        .select(get_json_object(col("value"), "$[0]").cast(LongType)
          .as("k"))
        .agg(count(lit(1)).as("n"), sum("k").as("ks"))
    },

    // Avro OCF round-trip with deflate, writer schema supplied.
    Q("qc4_avro_ocf",
      s"""SELECT COUNT(*) AS n, ${dsumSql("s_acctbal")} AS bal
         |FROM supplier""".stripMargin) { (s, d) =>
      val engine = new RqEngine(s)
      val dir = Files.createTempDirectory("qc4").toString
      val schema =
        """{"type":"record","name":"S","fields":[
          |{"name":"s_suppkey","type":"long"},
          |{"name":"s_acctbal","type":"double"}]}""".stripMargin
      engine.write("avro",
        t(s, d, "supplier").select("s_suppkey", "s_acctbal"), dir,
        Map("avroSchema" -> schema, "codec" -> "deflate"))
      engine.readTyped("avro", dir)
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("bal"))
    },

    // Protobuf wire round-trip via expressions (the hardest hand-rolled
    // codec — ProtoWire/ProtoSchema — under the same hash gate as
    // qc1-qc5): row → JSON → proto wire bytes → decode → fields.
    Q("qc6_protobuf_expr",
      s"""SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS ks,
         |${dsumSql("o_totalprice")} AS s
         |FROM orders""".stripMargin) { (s, d) =>
      val proto =
        """syntax = "proto3";
          |package graft;
          |message Order {
          |  int64 o_orderkey = 1;
          |  string o_orderstatus = 2;
          |  double o_totalprice = 3;
          |}""".stripMargin
      t(s, d, "orders")
        .select(CodecFns.from_protobuf(
          CodecFns.to_protobuf(
            to_json(struct(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"))),
            proto, ".graft.Order"),
          proto, ".graft.Order").as("j"))
        .select(
          get_json_object(col("j"), "$.o_orderkey").cast(LongType).as("k"),
          get_json_object(col("j"), "$.o_totalprice").cast(DoubleType)
            .as("tp"))
        .agg(count(lit(1)).as("n"), sum("k").as("ks"), dsum(col("tp")).as("s"))
    },

    // YAML expression round-trip on the events props JSON.
    Q("qc5_yaml_expr",
      """SELECT CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k')
        |  AS BIGINT)) AS BIGINT) AS ks
        |FROM events""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(CodecFns.from_yaml(CodecFns.to_yaml(col("props"))).as("j"))
        .select(get_json_object(col("j"), "$.k").cast(LongType).as("k"))
        .agg(sum("k").as("ks"))
    }
  )
}

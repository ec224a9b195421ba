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

    // Heterogeneous-stream VARIANT round-trip (doc/tutorial.md:13-17's
    // `null true {"a":2.5}` shape — mixed top-level scalars, nulls,
    // objects and arrays in ONE stream is legal rq input, SURVEY §1.1):
    // documents rows become a deterministic 5-way type mix keyed on
    // doc_id % 5, go through the rq JSON sink + source, land in a
    // single VariantType column, and are shredded back with
    // schema_of_variant / try_variant_get. The oracle computes the
    // same per-kind counts and sums straight from parquet — a hash
    // match proves the VARIANT carrier preserves every kind end to
    // end.
    Q("qc7_variant_stream",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(SUM(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
        |CAST(SUM(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_str,
        |CAST(SUM(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_obj,
        |CAST(SUM(CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_arr,
        |CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN n_chars END) AS BIGINT) AS sum_num,
        |CAST(SUM(CASE WHEN doc_id % 5 = 3 THEN n_chars END) AS BIGINT) AS sum_obj_c,
        |CAST(SUM(CASE WHEN doc_id % 5 = 4 THEN n_chars END) AS BIGINT) AS sum_arr1
        |FROM documents""".stripMargin) { (s, d) =>
      val engine = new RqEngine(s)
      val dir = Files.createTempDirectory("qc7").toString
      val mixed = t(s, d, "documents").select(
        when(col("doc_id") % 5 === 0, col("n_chars").cast(StringType))
          .when(col("doc_id") % 5 === 1, // lang is [a-z]{2} — no escaping
            concat(lit("\""), col("lang"), lit("\"")))
          .when(col("doc_id") % 5 === 2, lit("null"))
          .when(col("doc_id") % 5 === 3,
            to_json(struct(col("doc_id").as("id"), col("n_chars").as("c"))))
          .otherwise(to_json(array(col("doc_id"), col("n_chars"))))
          .as("value"))
      engine.write("json", mixed, dir)
      engine.readVariant("json", dir)
        .select(expr("schema_of_variant(value)").as("kind"),
          expr("is_variant_null(value)").as("isnull"),
          expr("try_variant_get(value, '$', 'bigint')").as("num"),
          expr("try_variant_get(value, '$.c', 'bigint')").as("objc"),
          expr("try_variant_get(value, '$[1]', 'bigint')").as("arr1"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("isnull"), 1L).otherwise(0L)).as("n_null"),
          sum(when(col("kind") === "BIGINT", 1L).otherwise(0L)).as("n_num"),
          sum(when(col("kind") === "STRING", 1L).otherwise(0L)).as("n_str"),
          sum(when(col("kind").startsWith("OBJECT"), 1L).otherwise(0L))
            .as("n_obj"),
          sum(when(col("kind").startsWith("ARRAY"), 1L).otherwise(0L))
            .as("n_arr"),
          sum(col("num")).as("sum_num"),
          sum(col("objc")).as("sum_obj_c"),
          sum(when(col("kind").startsWith("ARRAY"), col("arr1")))
            .as("sum_arr1"))
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

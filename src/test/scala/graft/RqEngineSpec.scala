package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.CodecFns

/** End-to-end rq engine tests: DSv2 source/sink round-trips across the
  * codec matrix (the reference's identity pipeline, §2.3), typed reads
  * via schema inference, and the codec Catalyst expressions.
  */
class RqEngineSpec extends SparkSpec {

  private lazy val engine = new RqEngine(spark)
  private def tmp(): String =
    Files.createTempDirectory("rqspec").toString

  private val ndjson =
    """{"id":1,"name":"a","vals":[1,2]}
      |{"id":2,"name":"b","vals":[3]}
      |{"id":3,"name":"c","vals":[]}
      |""".stripMargin

  private def writeInput(): String = {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "in.json"), ndjson)
    dir
  }

  test("identity pipeline json→json (rq default path, §2.3)") {
    val in = writeInput()
    val out = tmp()
    engine.run("json", in, "json", out)
    val got = engine.read("json", out).orderBy("value").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq(
      """{"id":1,"name":"a","vals":[1,2]}""",
      """{"id":2,"name":"b","vals":[3]}""",
      """{"id":3,"name":"c","vals":[]}"""))
  }

  test("format matrix round-trips: json → {msgpack,cbor} → json") {
    for (mid <- Seq("msgpack", "cbor")) {
      val in = writeInput()
      val midDir = tmp()
      val out = tmp()
      engine.run("json", in, mid, midDir)
      engine.run(mid, midDir, "json", out)
      val got = engine.read("json", out).collect()
        .map(_.getString(0)).sorted.toSeq
      assert(got == Seq(
        """{"id":1,"name":"a","vals":[1,2]}""",
        """{"id":2,"name":"b","vals":[3]}""",
        """{"id":3,"name":"c","vals":[]}"""), s"via $mid")
    }
    // yaml: the sink writes one doc per record but the SOURCE reads the
    // whole input as ONE document (reference asymmetry, SURVEY S8) — so
    // round-trip only a single record through yaml.
    val in = tmp()
    Files.writeString(java.nio.file.Paths.get(in, "one.json"),
      """{"id":1,"name":"a","vals":[1,2]}""" + "\n")
    val midDir = tmp()
    val out = tmp()
    engine.run("json", in, "yaml", midDir)
    engine.run("yaml", midDir, "json", out)
    assert(engine.read("json", out).collect().map(_.getString(0)).toSeq ==
      Seq("""{"id":1,"name":"a","vals":[1,2]}"""))
  }

  test("raw source: line → string record; raw sink type guard") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "in.txt"),
      "hello\n\nwörld\n")
    val got = engine.read("raw", dir).collect().map(_.getString(0)).toSeq
    assert(got == Seq("\"hello\"", "\"\"", "\"wörld\""))
    // raw out: strings verbatim
    val out = tmp()
    engine.run("raw", dir, "raw", out)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".txt"))
    val content = files.map(f =>
      Files.readString(f.toPath)).mkString
    assert(content.split("\n", -1).sorted.mkString == Seq("hello", "", "wörld", "").sorted.mkString)
    // non-string record → error (raw.rs:68-71)
    val objIn = writeInput()
    intercept[Exception] {
      engine.run("json", objIn, "raw", tmp())
    }
  }

  test("csv round-trip with reference semantics (all-string cells)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "a,1,true\n\"x,y\",2,false\n")
    val got = engine.read("csv", dir).collect().map(_.getString(0)).toSeq
    assert(got == Seq("""["a","1","true"]""", """["x,y","2","false"]"""))
    val out = tmp()
    engine.run("csv", dir, "csv", out)
    val back = engine.read("csv", out).collect().map(_.getString(0)).toSeq
    assert(back.sorted == got.sorted)
  }

  test("toml/yaml whole-document single-record semantics") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "cfg.toml"),
      "title = \"t\"\n[a]\nb = 1\n")
    val got = engine.read("toml", dir).collect().map(_.getString(0))
    assert(got.toSeq == Seq("""{"title":"t","a":{"b":1}}"""))
  }

  test("avro sink requires writer schema; round-trips with codec") {
    val in = writeInput()
    val avroDir = tmp()
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"},
        |{"name":"vals","type":{"type":"array","items":"long"}}]}"""
        .stripMargin
    intercept[Exception] { engine.run("json", in, "avro", tmp()) }
    engine.write("avro", engine.read("json", in), avroDir,
      Map("avroSchema" -> schema, "codec" -> "deflate"))
    val back = engine.read("avro", avroDir).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(back == Seq(
      """{"id":1,"name":"a","vals":[1,2]}""",
      """{"id":2,"name":"b","vals":[3]}""",
      """{"id":3,"name":"c","vals":[]}"""))
  }

  test("typed read infers schema (ValueVisitor analog)") {
    val in = writeInput()
    val df = engine.readTyped("json", in)
    assert(df.schema.fieldNames.sorted.toSeq == Seq("id", "name", "vals"))
    assert(df.where(col("id") === 2).select("name")
      .collect()(0).getString(0) == "b")
  }

  test("protobuf one-shot source via expression + registry") {
    val proto =
      """syntax = "proto3";
        |package example;
        |message Person { string name = 1; int32 age = 2; }
        |""".stripMargin
    // via expression (schema in plan)
    import spark.implicits._
    val bytes = Array[Byte](0x0a, 3, 'A', 'd', 'a', 0x10, 36)
    val df = Seq(bytes).toDF("payload")
      .select(CodecFns.from_protobuf(col("payload"), proto,
        ".example.Person").as("v"))
    assert(df.collect()(0).getString(0) == """{"name":"Ada","age":36}""")

    // via registry + DSv2 one-shot source
    val regDir = Files.createTempDirectory("registry")
    val protoFile = Files.writeString(
      Files.createTempDirectory("p").resolve("person.proto"), proto)
    val reg = new graft.formats.ProtoRegistry(regDir)
    reg.add(protoFile)
    assert(reg.descriptors().messages.contains("example.Person"))
    // mtime cache: second call hits cache (no recompile observable →
    // just assert stability)
    assert(reg.decodeMessage(bytes, ".example.Person") ==
      graft.formats.Value.obj(
        "name" -> graft.formats.Value.Str("Ada"),
        "age" -> graft.formats.Value.I64(36)))

    val dataDir = tmp()
    Files.write(java.nio.file.Paths.get(dataDir, "person.pb"), bytes)
    val oneShot = engine.read("protobuf", dataDir,
      Map("message" -> ".example.Person", "protoSchema" -> proto))
    assert(oneShot.collect().map(_.getString(0)).toSeq ==
      Seq("""{"name":"Ada","age":36}"""))
  }

  test("codec expressions: msgpack/cbor/toml/yaml round-trip in SQL") {
    CodecFns.registerAll(spark)
    val r = spark.sql(
      """SELECT from_msgpack(to_msgpack(j)) AS mp,
        |       from_cbor(to_cbor(j)) AS cb,
        |       from_yaml(to_yaml(j)) AS ym,
        |       from_toml(to_toml(t)) AS tm
        |FROM (SELECT '{"a":1,"b":[true,null,"x"]}' AS j,
        |             '{"a":1,"b":[true,2.5,"x"]}' AS t)""".stripMargin)
      .collect()(0)
    val expected = """{"a":1,"b":[true,null,"x"]}"""
    assert(r.getString(0) == expected)
    assert(r.getString(1) == expected)
    assert(r.getString(2) == expected)
    // toml has no null → the toml branch uses a null-free record
    assert(r.getString(3) == """{"a":1,"b":[true,2.5,"x"]}""")
  }

  test("variant read carries heterogeneous streams (tutorial input)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "het.json"),
      "null\ntrue\n{\"a\": 2.5}\n")
    val df = engine.readVariant("json", dir)
    assert(df.schema.fields(0).dataType.typeName == "variant")
    // shred the object record; scalar records pass through as variant
    val objs = df.selectExpr(
      "variant_get(value, '$.a', 'double') AS a")
      .where(col("a").isNotNull).collect()
    assert(objs.map(_.getDouble(0)).toSeq == Seq(2.5))
    assert(df.count() == 3)
  }

  test("GraftExtensions registers functions at session build time") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // force-init shared session before detaching it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT from_cbor(to_cbor('{"x":7}')) AS j,
          |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |       size(word_shingles('a b c d')) AS ns
          |FROM (SELECT 1)""".stripMargin).collect()(0)
      assert(r.getString(0) == """{"x":7}""")
      assert(r.getDouble(1) == 11.0)
      assert(r.getInt(2) == 2)
      // aggregate+scalar sketch pair through pure SQL
      val b = s2.sql(
        """WITH bf AS (SELECT graft_bloom(s) AS bf FROM (
          |  SELECT explode(array('x', 'y')) AS s))
          |SELECT bloom_might_contain(bf, 'x') AS hit,
          |       bloom_might_contain(bf, 'zebra') AS miss FROM bf"""
          .stripMargin).collect()(0)
      assert(b.getBoolean(0) && !b.getBoolean(1))
    } finally { // restore the shared session (same SparkContext)
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }

  test("protobuf sink unimplemented (K11 parity)") {
    val in = writeInput()
    val ex = intercept[Exception] {
      engine.run("json", in, "protobuf", tmp())
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[UnsupportedOperationException]))
  }
}

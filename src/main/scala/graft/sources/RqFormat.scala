package graft.sources

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets

import graft.formats._

/** The rq codec matrix as pluggable format handlers (SURVEY §2.1/§2.2):
  * bytes → record stream (Value iterator) and record stream → bytes.
  * Framing rules per format follow the reference:
  *  - json: whitespace-separated values in, NDJSON out (S1/K1)
  *  - csv: headerless, every record a Sequence of Strings (S2/K4)
  *  - msgpack/cbor: back-to-back values, EOF stop (S4/S5/K6/K7)
  *  - toml/yaml: whole input = ONE record (S7/S8); one doc per record
  *    out, `\n` separated (K8/K9)
  *  - raw: line → Str in; Str/Bytes verbatim + `\n` out, other types
  *    error (S9/K10, raw.rs:68-71)
  *  - avro: OCF with embedded reader schema in; writer schema required
  *    out (S3/K5)
  *  - protobuf: single message in (S6); OUT IS UNIMPLEMENTED (K11).
  */
object RqFormat {

  val names: Seq[String] = Seq("json", "csv", "msgpack", "cbor", "toml",
    "yaml", "raw", "avro", "protobuf")

  /** Case-insensitive option lookup (DSv2 lowercases option keys). */
  private def opt(options: Map[String, String], key: String): Option[String] =
    options.get(key).orElse(options.get(key.toLowerCase))

  def readAll(in: InputStream): Array[Byte] = in.readAllBytes()

  /** Decode a whole input into its record stream. Options carry
    * format-specific settings (protobuf: message + schema source).
    */
  def decode(format: String, bytes: Array[Byte],
      options: Map[String, String] = Map.empty): Iterator[Value] =
    format match {
      case "json" =>
        JsonCodec.parseStream(
          new String(bytes, StandardCharsets.UTF_8)).iterator
      case "csv" =>
        // headerless; every cell a string; record = Sequence (csv.rs:41-52)
        CsvCodec.parse(new String(bytes, StandardCharsets.UTF_8)).iterator
      case "msgpack" => MsgPackCodec.decodeStream(bytes).iterator
      case "cbor" => CborCodec.decodeStream(bytes).iterator
      case "toml" =>
        Iterator.single(
          TomlCodec.parse(new String(bytes, StandardCharsets.UTF_8)))
      case "yaml" =>
        Iterator.single(
          YamlCodec.parse(new String(bytes, StandardCharsets.UTF_8)))
      case "raw" =>
        // each line → Str (raw.rs:32-44); trailing newline yields no
        // empty final record
        val s = new String(bytes, StandardCharsets.UTF_8)
        val lines = s.split("\n", -1)
        val trimmed =
          if (lines.nonEmpty && lines.last.isEmpty) lines.dropRight(1)
          else lines
        trimmed.iterator.map(l => Value.Str(l.stripSuffix("\r")))
      case "avro" => AvroCodec.readStream(bytes).iterator
      case "protobuf" =>
        val msg = opt(options, "message").getOrElse(
          throw new IllegalArgumentException(
            "protobuf read requires option 'message' (.pkg.Msg)"))
        val schema = opt(options, "protoSchema") match {
          case Some(src) => ProtoSchema.parse(src)
          case None => new ProtoRegistry().descriptors()
        }
        // one-shot source: at most one record (protobuf.rs:20,26-38)
        Iterator.single(ProtoWire.decode(bytes, msg, schema))
      case other =>
        throw new IllegalArgumentException(s"unknown rq format: $other")
    }

  /** Encode a record stream. */
  def encode(format: String, values: Iterator[Value], out: OutputStream,
      options: Map[String, String] = Map.empty): Unit = format match {
    case "json" =>
      // formatter selection mirrors --format compact/indented/readable
      // (rq.rs:216, 323-329; compact is the pipe default)
      val emit: Value => String = opt(options, "jsonFormat")
        .getOrElse("compact") match {
        case "compact" => JsonCodec.emit
        case "indented" => JsonCodec.emitIndented
        case "readable" => JsonCodec.emitReadable
        case other => throw new IllegalArgumentException(
          s"unknown jsonFormat: $other (compact|indented|readable)")
      }
      values.foreach { v =>
        out.write(emit(v).getBytes(StandardCharsets.UTF_8))
        out.write('\n') // one record per doc + newline (json.rs:110)
      }
    case "csv" =>
      values.foreach { v =>
        out.write(CsvCodec.emitRecord(v).getBytes(StandardCharsets.UTF_8))
        out.write('\n')
      }
    case "msgpack" =>
      values.foreach(v => out.write(MsgPackCodec.encode(v)))
    case "cbor" =>
      values.foreach(v => out.write(CborCodec.encode(v)))
    case "toml" =>
      values.foreach { v =>
        out.write(TomlCodec.emit(v).getBytes(StandardCharsets.UTF_8))
        out.write('\n') // doc + newline (toml.rs:62)
      }
    case "yaml" =>
      values.foreach { v =>
        out.write(YamlCodec.emit(v).getBytes(StandardCharsets.UTF_8))
        out.write('\n') // doc + newline (yaml.rs:54)
      }
    case "raw" =>
      values.foreach {
        // Str/Bytes verbatim + newline; anything else is a hard error
        // (raw.rs:46-73)
        case Value.Str(s) =>
          out.write(s.getBytes(StandardCharsets.UTF_8)); out.write('\n')
        case Value.Bytes(b) => out.write(b); out.write('\n')
        case other => throw new IllegalArgumentException(
          s"rq raw sink: cannot write $other (only strings/bytes)")
      }
    case "avro" =>
      val schemaJson = opt(options, "avroSchema").getOrElse(
        throw new IllegalArgumentException(
          "avro write requires option 'avroSchema' (writer schema JSON, " +
            "reference: -A schema.avsc, rq.rs:241-259)"))
      val codec = opt(options, "codec").getOrElse("null")
      out.write(AvroCodec.writeStream(values.toVector,
        AvroCodec.parseSchema(schemaJson), codec))
    case "protobuf" => ProtoWire.serializeUnsupported() // K11 parity
    case other =>
      throw new IllegalArgumentException(s"unknown rq format: $other")
  }
}

/** CSV record semantics (reference: src/value/csv.rs): headerless,
  * no inference — every cell is a String, a record is a Sequence of
  * Strings (csv.rs:41-52). The sink accepts ONLY Sequence records and
  * only scalar cells (csv.rs:60-110).
  */
object CsvCodec {

  def parse(input: String): Vector[Value] = {
    val records = Vector.newBuilder[Value]
    var cells = Vector.newBuilder[Value]
    val cell = new StringBuilder
    var inQuotes = false
    var i = 0
    var sawAny = false
    def endCell(): Unit = { cells += Value.Str(cell.toString); cell.clear() }
    def endRecord(): Unit = {
      endCell()
      records += Value.Seq(cells.result())
      cells = Vector.newBuilder[Value]
      sawAny = false
    }
    while (i < input.length) {
      val c = input.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < input.length && input.charAt(i + 1) == '"') {
            cell.append('"'); i += 2
          } else { inQuotes = false; i += 1 }
        } else { cell.append(c); i += 1 }
      } else c match {
        case '"' => inQuotes = true; sawAny = true; i += 1
        case ',' => endCell(); sawAny = true; i += 1
        case '\r' => i += 1
        case '\n' =>
          if (sawAny || cell.nonEmpty) endRecord()
          i += 1
        case other => cell.append(other); sawAny = true; i += 1
      }
    }
    if (sawAny || cell.nonEmpty) endRecord()
    records.result()
  }

  /** One CSV line per Sequence record; scalars stringified, nested
    * values and Unit/Bytes are hard errors (value_to_csv,
    * csv.rs:77-110; sequence-only check csv.rs:60-75).
    */
  def emitRecord(v: Value): String = v match {
    case Value.Seq(cells) =>
      cells.map {
        case Value.Bool(b) => quote(b.toString)
        case Value.I64(n) => quote(n.toString)
        case Value.U64(bits) => quote(java.lang.Long.toUnsignedString(bits))
        case Value.F64(d) => quote(formatDouble(d))
        case Value.Str(s) => quote(s)
        case bad => throw new IllegalArgumentException(
          s"rq csv sink: cannot stringify $bad (csv.rs:79-108)")
      }.mkString(",")
    case other => throw new IllegalArgumentException(
      s"rq csv sink: can only output sequences, got $other (csv.rs:70-74)")
  }

  private def formatDouble(d: Double): String =
    if (d == Math.floor(d) && Math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  private def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}

package graft.formats

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro Object Container File codec over org.apache.avro 1.12.1
  * (reference: src/value/avro.rs). Reader schema comes from the OCF
  * header (avro.rs:17-24); writer requires a caller schema + codec
  * null/deflate/snappy (rq.rs:241-259).
  *
  * Coercions mirrored from the reference:
  *  - in: Null→Unit, Int/Long→I64, Float/Double→F64, Bytes/Fixed→Bytes,
  *    String/Enum→Str, Union unwrapped, Record→Map(Str→v), Map→Map
  *    (avro.rs:48-72);
  *  - out: u64 → Long iff it fits, else error (avro.rs:102-113);
  *    non-string map keys → error (avro.rs:138-146).
  */
object AvroCodec {

  // ---- read ----

  def readStream(bytes: Array[Byte]): Vector[Value] = {
    val reader = new DataFileStream[AnyRef](
      new ByteArrayInputStream(bytes), new GenericDatumReader[AnyRef]())
    try reader.iterator.asScala.toVector.map(fromAvro)
    finally reader.close()
  }

  def readFile(path: String): Vector[Value] =
    readStream(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))

  /** Incremental OCF read from an open stream: DataFileStream decodes
    * block-by-block, one record in flight. The caller owns and closes
    * the underlying stream after exhausting the iterator.
    */
  def readIterator(in: java.io.InputStream): Iterator[Value] = {
    val reader = new DataFileStream[AnyRef](
      in, new GenericDatumReader[AnyRef]())
    reader.iterator.asScala.map(fromAvro)
  }

  private def fromAvro(o: AnyRef): Value = o match {
    case null => Value.Unit
    case b: java.lang.Boolean => Value.Bool(b)
    case i: java.lang.Integer => Value.I64(i.longValue)
    case l: java.lang.Long => Value.I64(l)
    case f: java.lang.Float => Value.F64(f.doubleValue)
    case d: java.lang.Double => Value.F64(d)
    case s: CharSequence => Value.Str(s.toString) // Utf8 & String
    case b: ByteBuffer =>
      val arr = new Array[Byte](b.remaining())
      b.duplicate().get(arr)
      Value.Bytes(arr)
    case f: GenericData.Fixed => Value.Bytes(f.bytes.clone)
    case e: GenericData.EnumSymbol => Value.Str(e.toString)
    case r: GenericRecord =>
      Value.Map(r.getSchema.getFields.asScala.toVector.map { f =>
        (Value.Str(f.name): Value, fromAvro(r.get(f.pos)))
      })
    case m: java.util.Map[_, _] =>
      Value.Map(m.asScala.toVector.map { case (k, v) =>
        (Value.Str(k.toString): Value, fromAvro(v.asInstanceOf[AnyRef]))
      })
    case a: java.util.Collection[_] =>
      Value.Seq(a.asScala.toVector.map(x => fromAvro(x.asInstanceOf[AnyRef])))
    case other =>
      throw new IllegalArgumentException(s"avro: unsupported datum $other")
  }

  // ---- write ----

  /** Write records as one OCF byte blob. codec ∈ null/deflate/snappy
    * (rq.rs:245-257; default "null", rq.rs:245-249).
    */
  def writeStream(values: Iterable[Value], schema: Schema,
      codec: String = "null"): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = openWriter(bos, schema, codec)
    try values.foreach(v => writer.append(toAvro(v, schema)))
    finally writer.close()
    bos.toByteArray
  }

  /** Open an OCF writer over a caller-owned stream for incremental
    * appends; flush() (not close()) leaves the stream to the caller.
    */
  def openWriter(out: java.io.OutputStream, schema: Schema,
      codec: String = "null"): DataFileWriter[AnyRef] = {
    val writer = new DataFileWriter[AnyRef](
      new GenericDatumWriter[AnyRef](schema))
    writer.setCodec(codecFor(codec))
    writer.create(schema, out)
    writer
  }

  def codecFor(name: String): CodecFactory = name match {
    case "null" => CodecFactory.nullCodec()
    case "deflate" => CodecFactory.deflateCodec(CodecFactory.DEFAULT_DEFLATE_LEVEL)
    case "snappy" => CodecFactory.snappyCodec()
    case other =>
      throw new IllegalArgumentException(s"avro: unsupported codec $other")
  }

  def parseSchema(json: String): Schema = new Schema.Parser().parse(json)
  def parseSchemaFile(path: String): Schema =
    new Schema.Parser().parse(new File(path))

  /** Value → Avro datum guided by the writer schema, with the
    * reference's guards. widenShallow per node: the schema (not the
    * in-flight tag) dictates avro widths — the reference's avro sink
    * likewise widens its I8..I32 to the schema type (avro.rs:99-113).
    * Shallow (not deep) because this function already recurses
    * node-by-node; a deep widen here would rebuild every subtree once
    * per ancestor level.
    */
  def toAvro(v0: Value, schema: Schema): AnyRef = {
    val v = Value.widenShallow(v0)
    (schema.getType, v) match {
    case (Schema.Type.UNION, _) =>
      val branches = schema.getTypes.asScala
      val branch = v match {
        case Value.Unit =>
          branches.find(_.getType == Schema.Type.NULL)
        case _ =>
          branches.find(b => b.getType != Schema.Type.NULL && fits(v, b))
      }
      branch match {
        case Some(b) => toAvro(v, b)
        case None =>
          throw new IllegalArgumentException(s"avro: no union branch for $v")
      }
    case (Schema.Type.NULL, Value.Unit) => null
    case (Schema.Type.BOOLEAN, Value.Bool(b)) => java.lang.Boolean.valueOf(b)
    case (Schema.Type.INT, Value.I64(n)) =>
      if (n >= Int.MinValue && n <= Int.MaxValue)
        java.lang.Integer.valueOf(n.toInt)
      else throw new IllegalArgumentException(s"avro: $n does not fit int")
    case (Schema.Type.LONG, Value.I64(n)) => java.lang.Long.valueOf(n)
    case (Schema.Type.LONG, Value.U64(bits)) =>
      // u64 → long iff representable, else error (avro.rs:102-113)
      if (bits >= 0) java.lang.Long.valueOf(bits)
      else throw new IllegalArgumentException(
        s"avro: u64 ${java.lang.Long.toUnsignedString(bits)} does not fit long")
    case (Schema.Type.FLOAT, Value.F64(d)) => java.lang.Float.valueOf(d.toFloat)
    case (Schema.Type.DOUBLE, Value.F64(d)) => java.lang.Double.valueOf(d)
    case (Schema.Type.DOUBLE, Value.I64(n)) => java.lang.Double.valueOf(n.toDouble)
    case (Schema.Type.STRING, Value.Str(s)) => s
    case (Schema.Type.BYTES, Value.Bytes(b)) => ByteBuffer.wrap(b)
    case (Schema.Type.FIXED, Value.Bytes(b)) =>
      new GenericData.Fixed(schema, b)
    case (Schema.Type.ENUM, Value.Str(s)) =>
      new GenericData.EnumSymbol(schema, s)
    case (Schema.Type.ARRAY, Value.Seq(vs)) =>
      vs.map(toAvro(_, schema.getElementType)).asJava
    case (Schema.Type.MAP, Value.Map(kvs)) =>
      val m = new java.util.LinkedHashMap[String, AnyRef]()
      kvs.foreach { kv =>
        (Value.widenShallow(kv._1), kv._2) match { // Chr key → Str
          case (Value.Str(k), e) => m.put(k, toAvro(e, schema.getValueType))
          case (k, _) =>
            // non-string map key → error (avro.rs:138-146)
            throw new IllegalArgumentException(s"avro: non-string map key $k")
        }
      }
      m
    case (Schema.Type.RECORD, Value.Map(kvs)) =>
      val rec = new GenericData.Record(schema)
      val byName = kvs.collect {
        case (k, e) if Value.widenShallow(k).isInstanceOf[Value.Str] =>
          Value.widenShallow(k).asInstanceOf[Value.Str].v -> e
      }.toMap
      schema.getFields.asScala.foreach { f =>
        byName.get(f.name) match {
          case Some(e) => rec.put(f.pos, toAvro(e, f.schema))
          case None if f.schema.getType == Schema.Type.UNION &&
            f.schema.getTypes.asScala.exists(_.getType == Schema.Type.NULL) =>
            rec.put(f.pos, null)
          case None =>
            throw new IllegalArgumentException(
              s"avro: missing field ${f.name}")
        }
      }
      rec
    case (t, value) =>
      throw new IllegalArgumentException(s"avro: cannot write $value as $t")
    }
  }

  private def fits(v: Value, s: Schema): Boolean = (s.getType, v) match {
    case (Schema.Type.BOOLEAN, _: Value.Bool) => true
    case (Schema.Type.INT | Schema.Type.LONG, _: Value.I64 | _: Value.U64) =>
      true
    case (Schema.Type.FLOAT | Schema.Type.DOUBLE, _: Value.F64) => true
    case (Schema.Type.STRING | Schema.Type.ENUM, _: Value.Str) => true
    case (Schema.Type.BYTES | Schema.Type.FIXED, _: Value.Bytes) => true
    case (Schema.Type.ARRAY, _: Value.Seq) => true
    case (Schema.Type.MAP | Schema.Type.RECORD, _: Value.Map) => true
    case _ => false
  }
}

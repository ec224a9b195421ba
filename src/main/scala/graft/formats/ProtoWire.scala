package graft.formats

import java.nio.charset.StandardCharsets

import ProtoSchema._

/** Protobuf wire-format decoder (reference: serde_protobuf decode,
  * src/value/protobuf.rs:11-39; wire format per the public protobuf
  * encoding spec). Decodes ONE message of a named type against a
  * PSchemaSet — the reference source yields at most one record
  * (protobuf.rs:20,26-38).
  *
  * Serialization (the K11 sink) is deliberately unimplemented, matching
  * rq.rs:237-240.
  */
object ProtoWire {

  def serializeUnsupported(): Nothing =
    throw new UnsupportedOperationException(
      "protobuf serialization is not implemented (reference parity: " +
        "rq -P returns Error::unimplemented, src/bin/rq.rs:237-240)")

  final private class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        require(pos < end, "proto: truncated varint")
        b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) {
        v |= (buf(pos + i) & 0xffL) << (8 * i)
        i += 1
      }
      pos += 8
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
  }

  private def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  // ---- encode (graft extension) ----
  //
  // The rq K11 protobuf SINK stays unimplemented (serializeUnsupported
  // above — reference parity, rq.rs:237-240). This encoder is an engine
  // extension so protobuf payload columns can be produced and
  // round-tripped in-plan (to_protobuf expression; oracle gate qc6):
  // varint/zigzag/fixed scalars, length-delimited strings/bytes/
  // messages, repeated fields unpacked (one tag per element — always
  // accepted by the decoder above), map fields as {1:key,2:value}
  // entry messages.

  final private class Writer {
    private val bos = new java.io.ByteArrayOutputStream()
    def varint(n0: Long): Unit = {
      var n = n0
      while ((n & ~0x7fL) != 0) {
        bos.write(((n & 0x7f) | 0x80).toInt)
        n >>>= 7
      }
      bos.write(n.toInt)
    }
    def tag(fieldNum: Int, wireType: Int): Unit =
      varint((fieldNum.toLong << 3) | wireType)
    def fixed32(v: Int): Unit = {
      var i = 0
      while (i < 4) { bos.write((v >>> (8 * i)) & 0xff); i += 1 }
    }
    def fixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def raw(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    def delimited(b: Array[Byte]): Unit = { varint(b.length); raw(b) }
    def toBytes: Array[Byte] = bos.toByteArray
  }

  /** Encode one Value.Map as a message of `fqNameWithDot`. Fields
    * absent from the record are omitted (proto3 default semantics);
    * unknown keys error — silent drops would hide schema drift.
    */
  def encode(v: Value, fqNameWithDot: String,
      schema: PSchemaSet): Array[Byte] = {
    val w = new Writer
    // deep-widen typed-mode tags at the entry (the schema dictates
    // wire widths here, as in every width-oblivious sink) so the
    // int()/num()/str() matches below stay total over what reaches them
    encodeMessage(Value.widen(v), schema.message(fqNameWithDot),
      schema, w)
    w.toBytes
  }

  private def encodeMessage(v: Value, msg: PMessage, schema: PSchemaSet,
      w: Writer): Unit = v match {
    case Value.Map(kvs) =>
      val byName = msg.byName
      kvs.foreach {
        case (Value.Str(name), fieldValue) =>
          val f = byName.getOrElse(name, throw new IllegalArgumentException(
            s"proto: no field '$name' in ${msg.fqName}"))
          if (fieldValue != Value.Unit) encodeField(fieldValue, f, schema, w)
        case (k, _) =>
          throw new IllegalArgumentException(s"proto: non-string key $k")
      }
    case other =>
      throw new IllegalArgumentException(
        s"proto: message ${msg.fqName} needs a map record, got $other")
  }

  private def encodeField(v: Value, f: PField, schema: PSchemaSet,
      w: Writer): Unit = {
    import PType._
    f.ptype match {
      case TMap(kt, vt) =>
        val entries = v match {
          case Value.Map(kvs) => kvs
          case other => throw new IllegalArgumentException(
            s"proto: map field ${f.name} needs a map, got $other")
        }
        entries.foreach { case (k, e) =>
          val entry = new Writer
          encodeField(k, PField("key", 1, repeated = false, kt), schema, entry)
          encodeField(e, PField("value", 2, repeated = false, vt), schema, entry)
          w.tag(f.number, 2)
          w.delimited(entry.toBytes)
        }
      case _ if f.repeated =>
        val items = v match {
          case Value.Seq(vs) => vs
          case single => Vector(single)
        }
        items.foreach(e =>
          encodeField(e, f.copy(repeated = false), schema, w))
      case TMessage(fq) =>
        val sub = new Writer
        encodeMessage(v, schema.messages.getOrElse(fq,
          throw new IllegalArgumentException(s"proto: unknown message $fq")),
          schema, sub)
        w.tag(f.number, 2)
        w.delimited(sub.toBytes)
      case TString =>
        w.tag(f.number, 2)
        w.delimited(str(v, f).getBytes(StandardCharsets.UTF_8))
      case TBytes =>
        v match {
          case Value.Bytes(b) => w.tag(f.number, 2); w.delimited(b)
          case other => throw new IllegalArgumentException(
            s"proto: bytes field ${f.name} got $other")
        }
      case TDouble =>
        w.tag(f.number, 1)
        w.fixed64(java.lang.Double.doubleToLongBits(num(v, f)))
      case TFloat =>
        w.tag(f.number, 5)
        w.fixed32(java.lang.Float.floatToIntBits(num(v, f).toFloat))
      case TFixed64 | TSFixed64 =>
        w.tag(f.number, 1); w.fixed64(int(v, f))
      case TFixed32 | TSFixed32 =>
        w.tag(f.number, 5); w.fixed32(int(v, f).toInt)
      case TSInt32 | TSInt64 =>
        w.tag(f.number, 0)
        val n = int(v, f)
        w.varint((n << 1) ^ (n >> 63)) // zigzag
      case TBool =>
        w.tag(f.number, 0)
        v match {
          case Value.Bool(b) => w.varint(if (b) 1 else 0)
          case other => throw new IllegalArgumentException(
            s"proto: bool field ${f.name} got $other")
        }
      case TEnum(fq) =>
        w.tag(f.number, 0)
        val number = v match {
          case Value.Str(sym) =>
            schema.enums.get(fq)
              .flatMap(_.values.collectFirst { case (n, s) if s == sym => n })
              .getOrElse(throw new IllegalArgumentException(
                s"proto: enum $fq has no value '$sym'"))
              .toLong
          case _ => int(v, f)
        }
        w.varint(number)
      case TInt32 | TInt64 | TUInt32 | TUInt64 | TEnumOpaque =>
        w.tag(f.number, 0); w.varint(int(v, f))
    }
  }

  private def int(v: Value, f: PField): Long = v match {
    case Value.I64(n) => n
    case Value.U64(bits) => bits
    case other => throw new IllegalArgumentException(
      s"proto: integer field ${f.name} got $other")
  }
  private def num(v: Value, f: PField): Double = v match {
    case Value.F64(d) => d
    case Value.I64(n) => n.toDouble
    case other => throw new IllegalArgumentException(
      s"proto: float field ${f.name} got $other")
  }
  private def str(v: Value, f: PField): String = v match {
    case Value.Str(s) => s
    case other => throw new IllegalArgumentException(
      s"proto: string field ${f.name} got $other")
  }

  /** Decode one message of `fqNameWithDot` (leading-dot FQN,
    * doc/protobuf.md:36-44) from bytes.
    */
  def decode(bytes: Array[Byte], fqNameWithDot: String,
      schema: PSchemaSet): Value =
    decodeMessage(new Reader(bytes, 0, bytes.length),
      schema.message(fqNameWithDot), schema)

  private def decodeMessage(r: Reader, msg: PMessage,
      schema: PSchemaSet): Value = {
    val byNumber = msg.byNumber
    // insertion-ordered accumulation; repeated fields accumulate Vectors
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Value]]

    while (r.hasRemaining) {
      val tag = r.varint()
      val fieldNum = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      byNumber.get(fieldNum) match {
        case None => skip(r, wireType)
        case Some(f) =>
          val vs = readFieldValues(r, wireType, f, schema)
          if (!acc.contains(f.name)) order += f.name
          acc(f.name) = acc.getOrElse(f.name, Vector.empty) ++ vs
      }
    }

    Value.Map(order.toVector.map { name =>
      val f = msg.fields.find(_.name == name).get
      val vs = acc(name)
      val v: Value = f.ptype match {
        case _: PType.TMap =>
          // entries are (key, value) pairs encoded as messages
          Value.Map(vs.map {
            case Value.Map(kvs) =>
              val m = kvs.toMap
              (m.getOrElse(Value.Str("key"), Value.Unit),
                m.getOrElse(Value.Str("value"), Value.Unit))
            case other => (other, Value.Unit)
          })
        case _ if f.repeated => Value.Seq(vs)
        case _ => vs.last // proto: last value wins for singular fields
      }
      (Value.Str(name): Value, v)
    })
  }

  private def readFieldValues(r: Reader, wireType: Int, f: PField,
      schema: PSchemaSet): Vector[Value] = {
    import PType._
    def scalarFromVarint(t: PType, raw: Long): Value = t match {
      case TInt32 | TInt64 => Value.I64(raw)
      case TUInt32 => Value.I64(raw & 0xffffffffL)
      case TUInt64 => if (raw >= 0) Value.I64(raw) else Value.U64(raw)
      case TSInt32 | TSInt64 => Value.I64(zigzag(raw))
      case TBool => Value.Bool(raw != 0)
      case TEnum(fq) =>
        schema.enums.get(fq).flatMap(_.values.get(raw.toInt))
          .map(Value.Str(_): Value).getOrElse(Value.I64(raw))
      case other =>
        throw new IllegalArgumentException(s"proto: varint for $other")
    }
    f.ptype match {
      case TMap(kt, vt) =>
        // length-delimited entry message {1: key, 2: value}
        val len = r.varint().toInt
        val entryReader = new Reader(r.buf, r.pos, r.pos + len)
        r.pos += len
        var key: Value = Value.Unit
        var value: Value = Value.Unit
        while (entryReader.hasRemaining) {
          val tag = entryReader.varint()
          val num = (tag >>> 3).toInt
          val wt = (tag & 7).toInt
          val field = PField(if (num == 1) "key" else "value", num,
            repeated = false, if (num == 1) kt else vt)
          val vs = readFieldValues(entryReader, wt, field, schema)
          if (num == 1) key = vs.last else value = vs.last
        }
        Vector(Value.obj("key" -> key, "value" -> value))
      case TMessage(fq) =>
        val len = r.varint().toInt
        val sub = new Reader(r.buf, r.pos, r.pos + len)
        r.pos += len
        Vector(decodeMessage(sub, schema.messages.getOrElse(fq,
          throw new IllegalArgumentException(s"proto: unknown message $fq")),
          schema))
      case TString =>
        val len = r.varint().toInt
        Vector(Value.Str(new String(r.bytes(len), StandardCharsets.UTF_8)))
      case TBytes =>
        val len = r.varint().toInt
        Vector(Value.Bytes(r.bytes(len)))
      case TDouble =>
        if (wireType == 2) packed(r)(rr =>
          Value.F64(java.lang.Double.longBitsToDouble(rr.fixed64())))
        else Vector(Value.F64(java.lang.Double.longBitsToDouble(r.fixed64())))
      case TFloat =>
        if (wireType == 2) packed(r)(rr =>
          Value.F64(java.lang.Float.intBitsToFloat(rr.fixed32()).toDouble))
        else Vector(Value.F64(java.lang.Float.intBitsToFloat(r.fixed32()).toDouble))
      case TFixed64 =>
        if (wireType == 2) packed(r)(rr => u64(rr.fixed64()))
        else Vector(u64(r.fixed64()))
      case TSFixed64 =>
        if (wireType == 2) packed(r)(rr => Value.I64(rr.fixed64()))
        else Vector(Value.I64(r.fixed64()))
      case TFixed32 =>
        if (wireType == 2) packed(r)(rr => Value.I64(rr.fixed32() & 0xffffffffL))
        else Vector(Value.I64(r.fixed32() & 0xffffffffL))
      case TSFixed32 =>
        if (wireType == 2) packed(r)(rr => Value.I64(rr.fixed32().toLong))
        else Vector(Value.I64(r.fixed32().toLong))
      case varintType =>
        if (wireType == 2) packed(r)(rr =>
          scalarFromVarint(varintType, rr.varint()))
        else Vector(scalarFromVarint(varintType, r.varint()))
    }
  }

  private def u64(bits: Long): Value =
    if (bits >= 0) Value.I64(bits) else Value.U64(bits)

  private def packed(r: Reader)(one: Reader => Value): Vector[Value] = {
    val len = r.varint().toInt
    val sub = new Reader(r.buf, r.pos, r.pos + len)
    r.pos += len
    var out = Vector.empty[Value]
    while (sub.hasRemaining) out :+= one(sub)
    out
  }

  private def skip(r: Reader, wireType: Int): Unit = wireType match {
    case 0 => r.varint()
    case 1 => r.fixed64()
    case 2 => val len = r.varint().toInt; r.bytes(len)
    case 5 => r.fixed32()
    case other =>
      throw new IllegalArgumentException(s"proto: bad wire type $other")
  }
}

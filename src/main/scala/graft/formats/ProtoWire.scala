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

  /** Decode one message of `fqNameWithDot` (leading-dot FQN,
    * doc/protobuf.md:36-44) from bytes.
    */
  def decode(bytes: Array[Byte], fqNameWithDot: String,
      schema: PSchemaSet): Value =
    decodeMessage(new Reader(bytes, 0, bytes.length),
      schema.message(fqNameWithDot), schema)

  private def decodeMessage(r: Reader, msg: PMessage,
      schema: PSchemaSet): Value = {
    val byNumber = msg.fields.map(f => f.number -> f).toMap
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

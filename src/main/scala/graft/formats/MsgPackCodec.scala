package graft.formats

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** MessagePack codec (reference: src/value/messagepack.rs; format per
  * the public msgpack spec). Semantics mirrored:
  *  - decode prefers the unsigned reading and widens to I64/U64
  *    (messagepack.rs:68-70; graft canonicalizes non-negative to I64,
  *    U64 only above Long.MaxValue — print-identical to the reference);
  *  - Ext and Binary both decode to Bytes, ext type tag dropped
  *    (messagepack.rs:82);
  *  - encode writes minimal-width markers (rmp behavior).
  * Stream framing: back-to-back values, EOF-classified stop
  * (messagepack.rs:35-51).
  */
object MsgPackCodec {

  // ---- encode ----

  def encode(v: Value): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(v, new DataOutputStream(bos))
    bos.toByteArray
  }

  def encodeStream(vs: Iterable[Value]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    vs.foreach(write(_, out))
    bos.toByteArray
  }

  private def write(v: Value, out: DataOutputStream): Unit = v match {
    case Value.Unit => out.writeByte(0xc0)
    case Value.Bool(b) => out.writeByte(if (b) 0xc3 else 0xc2)
    case Value.I64(n) =>
      if (n >= 0) writeUnsigned(n, out)
      else if (n >= -32) out.writeByte((n & 0xff).toInt)
      else if (n >= Byte.MinValue) { out.writeByte(0xd0); out.writeByte(n.toInt) }
      else if (n >= Short.MinValue) { out.writeByte(0xd1); out.writeShort(n.toInt) }
      else if (n >= Int.MinValue) { out.writeByte(0xd2); out.writeInt(n.toInt) }
      else { out.writeByte(0xd3); out.writeLong(n) }
    case Value.U64(bits) =>
      if (bits >= 0) writeUnsigned(bits, out) // fits in signed range
      else { out.writeByte(0xcf); out.writeLong(bits) }
    case Value.F64(d) => out.writeByte(0xcb); out.writeDouble(d)
    case Value.Str(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) out.writeByte(0xa0 | b.length)
      else if (b.length < 256) { out.writeByte(0xd9); out.writeByte(b.length) }
      else if (b.length < 65536) { out.writeByte(0xda); out.writeShort(b.length) }
      else { out.writeByte(0xdb); out.writeInt(b.length) }
      out.write(b)
    case Value.Bytes(b) =>
      if (b.length < 256) { out.writeByte(0xc4); out.writeByte(b.length) }
      else if (b.length < 65536) { out.writeByte(0xc5); out.writeShort(b.length) }
      else { out.writeByte(0xc6); out.writeInt(b.length) }
      out.write(b)
    case Value.Seq(vs) =>
      if (vs.length < 16) out.writeByte(0x90 | vs.length)
      else if (vs.length < 65536) { out.writeByte(0xdc); out.writeShort(vs.length) }
      else { out.writeByte(0xdd); out.writeInt(vs.length) }
      vs.foreach(write(_, out))
    case Value.Map(kvs) =>
      if (kvs.length < 16) out.writeByte(0x80 | kvs.length)
      else if (kvs.length < 65536) { out.writeByte(0xde); out.writeShort(kvs.length) }
      else { out.writeByte(0xdf); out.writeInt(kvs.length) }
      kvs.foreach { case (k, e) => write(k, out); write(e, out) }
  }

  private def writeUnsigned(n: Long, out: DataOutputStream): Unit = {
    if (n < 128) out.writeByte(n.toInt)
    else if (n < 256) { out.writeByte(0xcc); out.writeByte(n.toInt) }
    else if (n < 65536) { out.writeByte(0xcd); out.writeShort(n.toInt) }
    else if (n < 4294967296L) { out.writeByte(0xce); out.writeInt(n.toInt) }
    else { out.writeByte(0xcf); out.writeLong(n) }
  }

  // ---- decode ----

  /** Decode one value from buf; ByteBuffer position advances. */
  def decode(buf: ByteBuffer): Value = {
    val m = buf.get() & 0xff
    m match {
      case 0xc0 => Value.Unit
      case 0xc2 => Value.Bool(false)
      case 0xc3 => Value.Bool(true)
      case b if b < 0x80 => Value.I64(b) // positive fixint
      case b if b >= 0xe0 => Value.I64((b - 256).toLong) // negative fixint
      case 0xcc => Value.I64(buf.get() & 0xffL)
      case 0xcd => Value.I64(buf.getShort() & 0xffffL)
      case 0xce => Value.I64(buf.getInt() & 0xffffffffL)
      case 0xcf =>
        val bits = buf.getLong()
        if (bits >= 0) Value.I64(bits) else Value.U64(bits)
      case 0xd0 => Value.I64(buf.get().toLong)
      case 0xd1 => Value.I64(buf.getShort().toLong)
      case 0xd2 => Value.I64(buf.getInt().toLong)
      case 0xd3 => Value.I64(buf.getLong())
      case 0xca => Value.F64(buf.getFloat().toDouble)
      case 0xcb => Value.F64(buf.getDouble())
      case b if b >= 0xa0 && b < 0xc0 => str(buf, b & 0x1f)
      case 0xd9 => str(buf, buf.get() & 0xff)
      case 0xda => str(buf, buf.getShort() & 0xffff)
      case 0xdb => str(buf, buf.getInt())
      case 0xc4 => bin(buf, buf.get() & 0xff)
      case 0xc5 => bin(buf, buf.getShort() & 0xffff)
      case 0xc6 => bin(buf, buf.getInt())
      case b if b >= 0x90 && b < 0xa0 => arr(buf, b & 0x0f)
      case 0xdc => arr(buf, buf.getShort() & 0xffff)
      case 0xdd => arr(buf, buf.getInt())
      case b if b >= 0x80 && b < 0x90 => map(buf, b & 0x0f)
      case 0xde => map(buf, buf.getShort() & 0xffff)
      case 0xdf => map(buf, buf.getInt())
      // ext → Bytes, type tag dropped (messagepack.rs:82)
      case 0xd4 => extBytes(buf, 1)
      case 0xd5 => extBytes(buf, 2)
      case 0xd6 => extBytes(buf, 4)
      case 0xd7 => extBytes(buf, 8)
      case 0xd8 => extBytes(buf, 16)
      case 0xc7 => extBytes(buf, buf.get() & 0xff)
      case 0xc8 => extBytes(buf, buf.getShort() & 0xffff)
      case 0xc9 => extBytes(buf, buf.getInt())
      case other =>
        throw new IllegalArgumentException(
          f"msgpack: invalid marker 0x$other%02x")
    }
  }

  /** Back-to-back value stream; stops cleanly at end of buffer
    * (reference EOF classification, messagepack.rs:45-47).
    */
  def decodeStream(bytes: Array[Byte]): Vector[Value] = {
    val buf = ByteBuffer.wrap(bytes)
    var out = Vector.empty[Value]
    while (buf.hasRemaining) out :+= decode(buf)
    out
  }

  private def str(buf: ByteBuffer, n: Int): Value = {
    val b = new Array[Byte](n)
    buf.get(b)
    Value.Str(new String(b, StandardCharsets.UTF_8))
  }
  private def bin(buf: ByteBuffer, n: Int): Value = {
    val b = new Array[Byte](n)
    buf.get(b)
    Value.Bytes(b)
  }
  private def extBytes(buf: ByteBuffer, n: Int): Value = {
    buf.get() // ext type tag, dropped
    bin(buf, n)
  }
  private def arr(buf: ByteBuffer, n: Int): Value =
    Value.Seq(Vector.fill(n)(decode(buf)))
  private def map(buf: ByteBuffer, n: Int): Value =
    Value.Map(Vector.fill(n)((decode(buf), decode(buf))))
}

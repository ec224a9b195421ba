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

  /** Append one encoded value to an open stream (incremental sink). */
  def encodeTo(v: Value, out: DataOutputStream): Unit = write(v, out)

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
  def decode(buf: ByteBuffer): Value = decode(ByteIn(buf))

  private[formats] def decode(in: ByteIn): Value = {
    val m = in.u8()
    m match {
      case 0xc0 => Value.Unit
      case 0xc2 => Value.Bool(false)
      case 0xc3 => Value.Bool(true)
      case b if b < 0x80 => Value.I64(b) // positive fixint
      case b if b >= 0xe0 => Value.I64((b - 256).toLong) // negative fixint
      case 0xcc => Value.I64(in.u8() & 0xffL)
      case 0xcd => Value.I64(in.s16() & 0xffffL)
      case 0xce => Value.I64(in.i32() & 0xffffffffL)
      case 0xcf =>
        val bits = in.i64()
        if (bits >= 0) Value.I64(bits) else Value.U64(bits)
      case 0xd0 => Value.I64(in.s8().toLong)
      case 0xd1 => Value.I64(in.s16().toLong)
      case 0xd2 => Value.I64(in.i32().toLong)
      case 0xd3 => Value.I64(in.i64())
      case 0xca => Value.F64(in.f32().toDouble)
      case 0xcb => Value.F64(in.f64())
      case b if b >= 0xa0 && b < 0xc0 => str(in, b & 0x1f)
      case 0xd9 => str(in, in.u8())
      case 0xda => str(in, in.s16() & 0xffff)
      case 0xdb => str(in, in.i32())
      case 0xc4 => bin(in, in.u8())
      case 0xc5 => bin(in, in.s16() & 0xffff)
      case 0xc6 => bin(in, in.i32())
      case b if b >= 0x90 && b < 0xa0 => arr(in, b & 0x0f)
      case 0xdc => arr(in, in.s16() & 0xffff)
      case 0xdd => arr(in, in.i32())
      case b if b >= 0x80 && b < 0x90 => map(in, b & 0x0f)
      case 0xde => map(in, in.s16() & 0xffff)
      case 0xdf => map(in, in.i32())
      // ext → Bytes, type tag dropped (messagepack.rs:82)
      case 0xd4 => extBytes(in, 1)
      case 0xd5 => extBytes(in, 2)
      case 0xd6 => extBytes(in, 4)
      case 0xd7 => extBytes(in, 8)
      case 0xd8 => extBytes(in, 16)
      case 0xc7 => extBytes(in, in.u8())
      case 0xc8 => extBytes(in, in.s16() & 0xffff)
      case 0xc9 => extBytes(in, in.i32())
      case other =>
        throw new IllegalArgumentException(
          f"msgpack: invalid marker 0x$other%02x")
    }
  }

  /** Back-to-back value stream; stops cleanly at end of buffer
    * (reference EOF classification, messagepack.rs:45-47).
    */
  def decodeStream(bytes: Array[Byte]): Vector[Value] =
    decodeIterator(ByteIn(ByteBuffer.wrap(bytes))).toVector

  /** Incremental decode from an open stream: one record in flight,
    * constant memory regardless of input size (messagepack.rs:40-51).
    */
  def decodeIterator(in: java.io.InputStream): Iterator[Value] =
    decodeIterator(ByteIn(in))

  private def decodeIterator(bi: ByteIn): Iterator[Value] =
    new Iterator[Value] {
      def hasNext: Boolean = !bi.atEnd()
      def next(): Value = decode(bi)
    }

  private def str(in: ByteIn, n: Int): Value =
    Value.Str(new String(in.bytes(n), StandardCharsets.UTF_8))
  private def bin(in: ByteIn, n: Int): Value = Value.Bytes(in.bytes(n))
  private def extBytes(in: ByteIn, n: Int): Value = {
    in.u8() // ext type tag, dropped
    bin(in, n)
  }
  private def arr(in: ByteIn, n: Int): Value =
    Value.Seq(Vector.fill(n)(decode(in)))
  private def map(in: ByteIn, n: Int): Value =
    Value.Map(Vector.fill(n)((decode(in), decode(in))))
}

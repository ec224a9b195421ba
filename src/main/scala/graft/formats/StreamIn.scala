package graft.formats

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.ByteBuffer

/** Sequential byte cursor abstracting an in-memory slice vs an open
  * stream, so the binary codecs (msgpack/cbor) decode identically from
  * either — the constant-memory streaming property of the reference
  * decoders (messagepack.rs:40-51, cbor.rs:18-25): one record in
  * flight, never the whole file.
  */
private[formats] trait ByteIn {
  /** Next byte as 0..255; throws EOFException mid-value. */
  def u8(): Int
  /** Next byte, signed. */
  def s8(): Byte
  def s16(): Short
  def i32(): Int
  def i64(): Long
  def f32(): Float
  def f64(): Double
  def bytes(n: Int): Array[Byte]
  /** Next byte as 0..255 without consuming, or -1 at end of input. */
  def peek(): Int
  /** True iff positioned at a clean end-of-input (record boundary). */
  def atEnd(): Boolean = peek() < 0
}

private[formats] object ByteIn {

  def apply(buf: ByteBuffer): ByteIn = new OfBuffer(buf)
  def apply(in: InputStream): ByteIn = new OfStream(in)

  private final class OfBuffer(buf: ByteBuffer) extends ByteIn {
    def u8(): Int = buf.get() & 0xff
    def s8(): Byte = buf.get()
    def s16(): Short = buf.getShort()
    def i32(): Int = buf.getInt()
    def i64(): Long = buf.getLong()
    def f32(): Float = buf.getFloat()
    def f64(): Double = buf.getDouble()
    def bytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); buf.get(a); a
    }
    def peek(): Int =
      if (buf.hasRemaining) buf.get(buf.position()) & 0xff else -1
  }

  private final class OfStream(in0: InputStream) extends ByteIn {
    private val pb =
      new PushbackInputStream(new BufferedInputStream(in0, 1 << 16), 1)
    private val d = new DataInputStream(pb)
    def u8(): Int = {
      val b = pb.read()
      if (b < 0) throw new EOFException("unexpected end of input")
      b
    }
    def s8(): Byte = u8().toByte
    def s16(): Short = d.readShort()
    def i32(): Int = d.readInt()
    def i64(): Long = d.readLong()
    def f32(): Float = d.readFloat()
    def f64(): Double = d.readDouble()
    def bytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); d.readFully(a); a
    }
    def peek(): Int = {
      val b = pb.read()
      if (b >= 0) pb.unread(b)
      b
    }
  }
}

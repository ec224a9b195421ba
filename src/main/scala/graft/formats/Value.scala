package graft.formats

/** The rq record data model (reference: src/value/mod.rs:19-46): a
  * dynamically-typed, self-describing record. This AST is the codec
  * interchange inside graft — every format codec maps bytes ⇄ Value;
  * the engine surfaces records to Spark as JSON text / typed columns.
  *
  * Width-preservation notes (SURVEY §1.2): all signed ints collapse to
  * I64 and unsigned to U64 here — the reference itself only
  * distinguishes widths to re-emit them, and every sink it ships
  * widens (avro.rs:99-113, messagepack.rs:96-128). U64 keeps full
  * 64-bit unsigned range (reference: msgpack prefers unsigned,
  * messagepack.rs:68-70).
  */
sealed trait Value

object Value {
  case object Unit extends Value
  final case class Bool(v: Boolean) extends Value
  final case class I64(v: Long) extends Value
  /** Unsigned 64-bit, stored in a Long bit pattern. */
  final case class U64(bits: Long) extends Value
  final case class F64(v: Double) extends Value
  final case class Str(v: String) extends Value
  final case class Bytes(v: Array[Byte]) extends Value {
    override def equals(o: Any): Boolean = o match {
      case Bytes(w) => java.util.Arrays.equals(v, w)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(v)
  }
  /** Ordered heterogeneous list (mod.rs:41). */
  final case class Seq(v: Vector[Value]) extends Value
  /** Ordered key→value pairs, duplicate keys allowed, order preserved
    * (mod.rs:43-45 states both properties are deliberate).
    */
  final case class Map(v: Vector[(Value, Value)]) extends Value

  def obj(kvs: (String, Value)*): Map =
    Map(kvs.toVector.map { case (k, v) => (Str(k): Value, v) })
  def seq(vs: Value*): Seq = Seq(vs.toVector)
}

/** JSON parse/emit for Value — the engine's canonical text form
  * (reference: JSON is the default source and sink, rq.rs:196-207,216).
  *
  * Emit matches serde_json compact formatting (json.rs:60-66): no
  * whitespace, `Bytes` as array of numbers (serde serializes Vec<u8>
  * that way), Unit as null. Parse accepts any standard JSON; numbers
  * become I64 when integral and in range, U64 for (2^63, 2^64), F64
  * otherwise (ValueVisitor precedence, mod.rs:185-372).
  */
object JsonCodec {

  def emit(v: Value): String = {
    val sb = new StringBuilder
    emitTo(v, sb)
    sb.toString
  }

  private def emitTo(v: Value, sb: StringBuilder): scala.Unit = v match {
    case Value.Unit => sb.append("null")
    case Value.Bool(b) => sb.append(if (b) "true" else "false")
    case Value.I64(n) => sb.append(n)
    case Value.U64(bits) => sb.append(java.lang.Long.toUnsignedString(bits))
    case Value.F64(d) =>
      if (d.isNaN || d.isInfinite) sb.append("null") // serde_json behavior
      else if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15)
        sb.append(d.toLong).append(".0")
      else sb.append(d)
    case Value.Str(s) => emitString(s, sb)
    case Value.Bytes(b) =>
      sb.append('[')
      var i = 0
      while (i < b.length) {
        if (i > 0) sb.append(',')
        sb.append(b(i) & 0xff)
        i += 1
      }
      sb.append(']')
    case Value.Seq(vs) =>
      sb.append('[')
      var first = true
      vs.foreach { e =>
        if (!first) sb.append(',')
        first = false
        emitTo(e, sb)
      }
      sb.append(']')
    case Value.Map(kvs) =>
      sb.append('{')
      var first = true
      kvs.foreach { case (k, e) =>
        if (!first) sb.append(',')
        first = false
        k match {
          case Value.Str(s) => emitString(s, sb)
          case other => emitString(emit(other), sb) // non-string key → stringify
        }
        sb.append(':')
        emitTo(e, sb)
      }
      sb.append('}')
  }

  private def emitString(s: String, sb: StringBuilder): scala.Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** 2-space-indented pretty form (reference K3, `--format indented`:
    * serde_json PrettyFormatter, json.rs:76-82).
    */
  def emitIndented(v: Value): String = {
    val sb = new StringBuilder
    emitPretty(v, sb, 0, color = false)
    sb.toString
  }

  /** ANSI-colored indented form (reference K2, `--format readable`:
    * the custom colorizing formatter, json.rs:115-520 — keys cyan,
    * strings green, numbers yellow, bool/null magenta).
    */
  def emitReadable(v: Value): String = {
    val sb = new StringBuilder
    emitPretty(v, sb, 0, color = true)
    sb.toString
  }

  private def colored(s: String, code: String, on: Boolean): String =
    if (on) s"\u001b[${code}m$s\u001b[0m" else s

  private def emitPretty(v: Value, sb: StringBuilder, indent: Int,
      color: Boolean): scala.Unit = {
    val pad = "  " * indent
    val padIn = "  " * (indent + 1)
    v match {
      case Value.Seq(vs) if vs.nonEmpty =>
        sb.append("[\n")
        vs.zipWithIndex.foreach { case (e, i) =>
          sb.append(padIn)
          emitPretty(e, sb, indent + 1, color)
          if (i < vs.length - 1) sb.append(',')
          sb.append('\n')
        }
        sb.append(pad).append(']')
      case Value.Map(kvs) if kvs.nonEmpty =>
        sb.append("{\n")
        kvs.zipWithIndex.foreach { case ((k, e), i) =>
          val keyJson = {
            val ksb = new StringBuilder
            k match {
              case Value.Str(s) => emitString(s, ksb)
              case other => emitString(emit(other), ksb)
            }
            ksb.toString
          }
          sb.append(padIn).append(colored(keyJson, "36", color)).append(": ")
          emitPretty(e, sb, indent + 1, color)
          if (i < kvs.length - 1) sb.append(',')
          sb.append('\n')
        }
        sb.append(pad).append('}')
      case scalar =>
        val plain = emit(scalar)
        val code = scalar match {
          case _: Value.Str => "32"
          case _: Value.I64 | _: Value.U64 | _: Value.F64 => "33"
          case _ => "35"
        }
        sb.append(colored(plain, code, color))
    }
  }

  /** Parse one JSON value from s starting at offset; returns (value,
    * next offset). Throws IllegalArgumentException on malformed input.
    */
  def parseOne(s: String, from: Int): (Value, Int) = {
    var i = skipWs(s, from)
    if (i >= s.length) throw err("unexpected end of input", i)
    s.charAt(i) match {
      case 'n' => expect(s, i, "null"); (Value.Unit, i + 4)
      case 't' => expect(s, i, "true"); (Value.Bool(true), i + 4)
      case 'f' => expect(s, i, "false"); (Value.Bool(false), i + 5)
      case '"' =>
        val (str, j) = parseString(s, i)
        (Value.Str(str), j)
      case '[' =>
        i += 1
        var items = Vector.empty[Value]
        i = skipWs(s, i)
        if (i < s.length && s.charAt(i) == ']') (Value.Seq(items), i + 1)
        else {
          var done = false
          while (!done) {
            val (v, j) = parseOne(s, i)
            items :+= v
            i = skipWs(s, j)
            if (i >= s.length) throw err("unterminated array", i)
            s.charAt(i) match {
              case ',' => i += 1
              case ']' => i += 1; done = true
              case c => throw err(s"expected , or ] got $c", i)
            }
          }
          (Value.Seq(items), i)
        }
      case '{' =>
        i += 1
        var items = Vector.empty[(Value, Value)]
        i = skipWs(s, i)
        if (i < s.length && s.charAt(i) == '}') (Value.Map(items), i + 1)
        else {
          var done = false
          while (!done) {
            i = skipWs(s, i)
            val (k, j1) = parseString(s, i)
            i = skipWs(s, j1)
            if (i >= s.length || s.charAt(i) != ':')
              throw err("expected :", i)
            val (v, j2) = parseOne(s, i + 1)
            items :+= ((Value.Str(k): Value, v))
            i = skipWs(s, j2)
            if (i >= s.length) throw err("unterminated object", i)
            s.charAt(i) match {
              case ',' => i += 1
              case '}' => i += 1; done = true
              case c => throw err(s"expected , or } got $c", i)
            }
          }
          (Value.Map(items), i)
        }
      case c if c == '-' || (c >= '0' && c <= '9') => parseNumber(s, i)
      case c => throw err(s"unexpected char $c", i)
    }
  }

  def parse(s: String): Value = {
    val (v, end) = parseOne(s, 0)
    val rest = skipWs(s, end)
    if (rest != s.length) throw err("trailing content", rest)
    v
  }

  /** Whitespace-separated stream of JSON values (the reference's S1
    * framing: serde_json StreamDeserializer, json.rs:53-58).
    */
  def parseStream(s: String): Vector[Value] = {
    var out = Vector.empty[Value]
    var i = skipWs(s, 0)
    while (i < s.length) {
      val (v, j) = parseOne(s, i)
      out :+= v
      i = skipWs(s, j)
    }
    out
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' ||
      s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
    i
  }

  private def expect(s: String, i: Int, lit: String): scala.Unit =
    if (!s.regionMatches(i, lit, 0, lit.length))
      throw err(s"expected $lit", i)

  private def parseString(s: String, from: Int): (String, Int) = {
    if (s.charAt(from) != '"') throw err("expected string", from)
    val sb = new StringBuilder
    var i = from + 1
    while (i < s.length && s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= s.length) throw err("bad escape", i)
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' =>
            if (i + 6 > s.length) throw err("bad \\u escape", i)
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c2 => throw err(s"bad escape \\$c2", i)
        }
      } else { sb.append(c); i += 1 }
    }
    if (i >= s.length) throw err("unterminated string", i)
    (sb.toString, i + 1)
  }

  private def parseNumber(s: String, from: Int): (Value, Int) = {
    var i = from
    if (i < s.length && s.charAt(i) == '-') i += 1
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    var isFloat = false
    if (i < s.length && s.charAt(i) == '.') {
      isFloat = true
      i += 1
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    }
    if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      isFloat = true
      i += 1
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    }
    val text = s.substring(from, i)
    if (isFloat) (Value.F64(text.toDouble), i)
    else {
      try (Value.I64(text.toLong), i)
      catch {
        case _: NumberFormatException =>
          if (!text.startsWith("-")) {
            try (Value.U64(java.lang.Long.parseUnsignedLong(text)), i)
            catch { case _: NumberFormatException =>
              (Value.F64(text.toDouble), i) }
          } else (Value.F64(text.toDouble), i)
      }
    }
  }

  private def err(msg: String, at: Int) =
    new IllegalArgumentException(s"json: $msg at offset $at")
}

package graft.formats

/** Minimal TOML codec (reference: src/value/toml.rs — whole-input
  * single document in, one document per record out; top level must be
  * a table, matching the toml crate's serialize constraint).
  *
  * Parser subset: comments, bare/quoted/dotted keys, [table] and
  * [[array-of-tables]] headers, basic & literal strings, integers,
  * floats, booleans, arrays, inline tables; datetimes are kept as
  * strings (graft's Value has no temporal type — SURVEY §1.2).
  */
object TomlCodec {

  // ---- parse ----

  private final class Ctx {
    /** Mutable nested map under construction (insertion-ordered). */
    val root = new java.util.LinkedHashMap[String, AnyRef]()
  }

  def parse(input: String): Value = {
    val ctx = new Ctx
    var current = ctx.root
    val lines = input.split("\n", -1).iterator
    val buffer = new StringBuilder
    var pending: String = null

    def fullLines: Iterator[String] = new Iterator[String] {
      def hasNext = lines.hasNext
      def next() = lines.next()
    }

    val it = fullLines
    while (it.hasNext || pending != null) {
      var line = if (pending != null) { val p = pending; pending = null; p }
        else it.next()
      val trimmed = stripComment(line).trim
      if (trimmed.isEmpty) ()
      else if (trimmed.startsWith("[[")) {
        val name = trimmed.stripPrefix("[[").stripSuffix("]]").trim
        current = descendArray(ctx.root, parseKeyPath(name))
      } else if (trimmed.startsWith("[")) {
        val name = trimmed.stripPrefix("[").stripSuffix("]").trim
        current = descendTable(ctx.root, parseKeyPath(name))
      } else {
        // key = value (value may span lines for arrays/strings)
        val eq = indexOfUnquoted(trimmed, '=')
        if (eq < 0) throw err(s"expected key = value: $trimmed")
        val keyPath = parseKeyPath(trimmed.substring(0, eq).trim)
        buffer.clear()
        buffer.append(trimmed.substring(eq + 1).trim)
        // keep consuming lines while brackets are unbalanced
        while (unbalanced(buffer.toString) && it.hasNext)
          buffer.append("\n").append(stripComment(it.next()))
        val (v, rest) = parseValue(buffer.toString.trim)
        if (rest.trim.nonEmpty) throw err(s"trailing content: $rest")
        val target =
          if (keyPath.length == 1) current
          else descendTable2(current, keyPath.dropRight(1))
        target.put(keyPath.last, toJava(v))
      }
    }
    fromJava(ctx.root)
  }

  private def stripComment(line: String): String = {
    var inB = false; var inL = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && !inL && (i == 0 || line.charAt(i - 1) != '\\'))
        inB = !inB
      else if (c == '\'' && !inB) inL = !inL
      else if (c == '#' && !inB && !inL) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def unbalanced(s: String): Boolean = {
    var depth = 0; var inB = false; var inL = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && !inL && (i == 0 || s.charAt(i - 1) != '\\')) inB = !inB
      else if (c == '\'' && !inB) inL = !inL
      else if (!inB && !inL) {
        if (c == '[' || c == '{') depth += 1
        else if (c == ']' || c == '}') depth -= 1
      }
      i += 1
    }
    depth > 0 || inB || inL
  }

  private def indexOfUnquoted(s: String, ch: Char): Int = {
    var inB = false; var inL = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && !inL) inB = !inB
      else if (c == '\'' && !inB) inL = !inL
      else if (c == ch && !inB && !inL) return i
      i += 1
    }
    -1
  }

  private def parseKeyPath(s: String): Vector[String] = {
    var out = Vector.empty[String]
    var i = 0
    val sb = new StringBuilder
    var inB = false; var inL = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && !inL) inB = !inB
      else if (c == '\'' && !inB) inL = !inL
      else if (c == '.' && !inB && !inL) { out :+= sb.toString.trim; sb.clear() }
      else sb.append(c)
      i += 1
    }
    out :+= sb.toString.trim
    out
  }

  @annotation.nowarn("msg=unchecked")
  private def descendTable(root: java.util.LinkedHashMap[String, AnyRef],
      path: Vector[String]): java.util.LinkedHashMap[String, AnyRef] = {
    var cur = root
    path.foreach { k =>
      cur.get(k) match {
        case m: java.util.LinkedHashMap[_, _] =>
          cur = m.asInstanceOf[java.util.LinkedHashMap[String, AnyRef]]
        case l: java.util.ArrayList[_] => // descend into last array table
          cur = l.asInstanceOf[java.util.ArrayList[AnyRef]]
            .get(l.size - 1).asInstanceOf[java.util.LinkedHashMap[String, AnyRef]]
        case null =>
          val m = new java.util.LinkedHashMap[String, AnyRef]()
          cur.put(k, m)
          cur = m
        case _ => throw err(s"key $k is not a table")
      }
    }
    cur
  }

  private def descendTable2(cur: java.util.LinkedHashMap[String, AnyRef],
      path: Vector[String]): java.util.LinkedHashMap[String, AnyRef] =
    descendTable(cur, path)

  @annotation.nowarn("msg=unchecked")
  private def descendArray(root: java.util.LinkedHashMap[String, AnyRef],
      path: Vector[String]): java.util.LinkedHashMap[String, AnyRef] = {
    val parent = descendTable(root, path.dropRight(1))
    val k = path.last
    val list = parent.get(k) match {
      case l: java.util.ArrayList[_] => l.asInstanceOf[java.util.ArrayList[AnyRef]]
      case null =>
        val l = new java.util.ArrayList[AnyRef]()
        parent.put(k, l)
        l
      case _ => throw err(s"key $k is not an array of tables")
    }
    val m = new java.util.LinkedHashMap[String, AnyRef]()
    list.add(m)
    m
  }

  /** Parse one TOML value; returns (value, rest). */
  private def parseValue(s: String): (Value, String) = {
    val t = s.trim
    if (t.isEmpty) throw err("empty value")
    t.charAt(0) match {
      case '"' =>
        val (str, rest) = parseBasicString(t)
        (Value.Str(str), rest)
      case '\'' =>
        val end = t.indexOf('\'', 1)
        if (end < 0) throw err("unterminated literal string")
        (Value.Str(t.substring(1, end)), t.substring(end + 1))
      case '[' =>
        var rest = t.substring(1).trim
        var items = Vector.empty[Value]
        while (!rest.startsWith("]")) {
          val (v, r) = parseValue(rest)
          items :+= v
          rest = r.trim.stripPrefix(",").trim
          rest = rest.dropWhile(c => c == '\n' || c == ' ')
        }
        (Value.Seq(items), rest.substring(1))
      case '{' =>
        var rest = t.substring(1).trim
        var items = Vector.empty[(Value, Value)]
        while (!rest.startsWith("}")) {
          val eq = indexOfUnquoted(rest, '=')
          val key = parseKeyPath(rest.substring(0, eq).trim).last
          val (v, r) = parseValue(rest.substring(eq + 1).trim)
          items :+= ((Value.Str(key): Value, v))
          rest = r.trim.stripPrefix(",").trim
        }
        (Value.Map(items), rest.substring(1))
      case _ =>
        val end = {
          val i = t.indexWhere(c => c == ',' || c == ']' || c == '}')
          if (i < 0) t.length else i
        }
        val tok = t.substring(0, end).trim
        val rest = t.substring(end)
        val v = tok match {
          case "true" => Value.Bool(true)
          case "false" => Value.Bool(false)
          case "inf" | "+inf" => Value.F64(Double.PositiveInfinity)
          case "-inf" => Value.F64(Double.NegativeInfinity)
          case "nan" | "+nan" | "-nan" => Value.F64(Double.NaN)
          case n if n.matches("[-+]?[0-9_]+") =>
            Value.I64(n.replace("_", "").toLong)
          case n if n.matches(
            "[-+]?[0-9_]*\\.?[0-9_]+([eE][-+]?[0-9]+)?") =>
            Value.F64(n.replace("_", "").toDouble)
          case d => Value.Str(d) // datetimes and anything else → string
        }
        (v, rest)
    }
  }

  private def parseBasicString(t: String): (String, String) = {
    val sb = new StringBuilder
    var i = 1
    while (i < t.length && t.charAt(i) != '"') {
      val c = t.charAt(i)
      if (c == '\\' && i + 1 < t.length) {
        t.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(t.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    if (i >= t.length) throw err("unterminated string")
    (sb.toString, t.substring(i + 1))
  }

  @annotation.nowarn("msg=unchecked")
  private def toJava(v: Value): AnyRef = v match {
    case Value.Map(kvs) =>
      val m = new java.util.LinkedHashMap[String, AnyRef]()
      kvs.foreach {
        case (Value.Str(k), e) => m.put(k, toJava(e))
        case (k, _) => throw err(s"non-string table key: $k")
      }
      m
    case Value.Seq(vs) =>
      val l = new java.util.ArrayList[AnyRef]()
      vs.foreach(e => l.add(toJava(e)))
      l
    case other => other
  }

  @annotation.nowarn("msg=unchecked")
  private def fromJava(o: AnyRef): Value = o match {
    case m: java.util.LinkedHashMap[_, _] =>
      var kvs = Vector.empty[(Value, Value)]
      m.asInstanceOf[java.util.LinkedHashMap[String, AnyRef]].forEach {
        (k, v) => kvs :+= ((Value.Str(k): Value, fromJava(v)))
      }
      Value.Map(kvs)
    case l: java.util.ArrayList[_] =>
      Value.Seq(l.asInstanceOf[java.util.ArrayList[AnyRef]]
        .toArray.toVector.map(x => fromJava(x.asInstanceOf[AnyRef])))
    case v: Value => v
    case other => throw err(s"unexpected $other")
  }

  // ---- emit ----

  /** One TOML document per record; top level must be a Map with
    * string keys (toml crate constraint, documented-lossy edge).
    */
  def emit(v: Value): String = Value.widen(v) match {
    // widen: width-tagged scalars (typed mode) print as their values —
    // TOML has no width syntax, mirroring the reference's toml sink
    case m: Value.Map =>
      val sb = new StringBuilder
      emitTable(m, Vector.empty, sb)
      sb.toString
    case other =>
      throw err(s"toml top level must be a table, got $other")
  }

  private def emitTable(m: Value.Map, path: Vector[String],
      sb: StringBuilder): Unit = {
    val (scalars, nested) = m.v.partition {
      case (_, _: Value.Map) => false
      case (_, Value.Seq(vs))
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Value.Map]) => false
      case _ => true
    }
    scalars.foreach { case (k, e) =>
      sb.append(bareKey(keyStr(k))).append(" = ")
      emitInline(e, sb)
      sb.append('\n')
    }
    nested.foreach {
      case (k, sub: Value.Map) =>
        val p = path :+ keyStr(k)
        sb.append('[').append(p.map(bareKey).mkString(".")).append("]\n")
        emitTable(sub, p, sb)
      case (k, Value.Seq(vs)) =>
        val p = path :+ keyStr(k)
        vs.foreach { e =>
          sb.append("[[").append(p.map(bareKey).mkString(".")).append("]]\n")
          emitTable(e.asInstanceOf[Value.Map], p, sb)
        }
      case _ => ()
    }
  }

  private def emitInline(v: Value, sb: StringBuilder): Unit = v match {
    case Value.Unit => sb.append("\"\"") // toml has no null; empty string
    case Value.Bool(b) => sb.append(b)
    case Value.I64(n) => sb.append(n)
    case Value.U64(bits) => sb.append(java.lang.Long.toUnsignedString(bits))
    case Value.F64(d) =>
      if (d.isNaN) sb.append("nan")
      else if (d == Double.PositiveInfinity) sb.append("inf")
      else if (d == Double.NegativeInfinity) sb.append("-inf")
      else if (d == Math.floor(d) && Math.abs(d) < 1e15)
        sb.append(d.toLong).append(".0")
      else sb.append(d)
    case Value.Str(s) =>
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\t' => sb.append("\\t")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      sb.append('"')
    case Value.Bytes(b) =>
      sb.append('[').append(b.map(x => (x & 0xff).toString).mkString(", "))
        .append(']')
    case Value.Seq(vs) =>
      sb.append('[')
      vs.zipWithIndex.foreach { case (e, i) =>
        if (i > 0) sb.append(", ")
        emitInline(e, sb)
      }
      sb.append(']')
    case m: Value.Map =>
      sb.append('{')
      m.v.zipWithIndex.foreach { case ((k, e), i) =>
        if (i > 0) sb.append(", ")
        sb.append(bareKey(keyStr(k))).append(" = ")
        emitInline(e, sb)
      }
      sb.append('}')
    // unreachable from emit() (deep-widened at entry); total for safety
    case tagged => emitInline(Value.widen(tagged), sb)
  }

  private def keyStr(k: Value): String = k match {
    case Value.Str(s) => s
    case other => throw err(s"non-string table key: $other")
  }

  private def bareKey(k: String): String =
    if (k.matches("[A-Za-z0-9_-]+")) k else "\"" + k + "\""

  private def err(msg: String) = new IllegalArgumentException(s"toml: $msg")
}

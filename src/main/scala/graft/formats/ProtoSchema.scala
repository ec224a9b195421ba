package graft.formats

/** Protobuf schema model + .proto source parser (reference: the
  * registry compiles .proto via protoc into descriptors,
  * src/proto_index.rs:30-73; graft parses .proto directly — no protoc
  * on a cluster). Subset matching what serde-protobuf consumed
  * (SURVEY §7.6): messages (nested), scalar fields, repeated, enums,
  * packages, oneof members as plain fields, map fields.
  */
object ProtoSchema {

  sealed trait PType
  object PType {
    case object TInt32 extends PType
    case object TInt64 extends PType
    case object TUInt32 extends PType
    case object TUInt64 extends PType
    case object TSInt32 extends PType
    case object TSInt64 extends PType
    case object TBool extends PType
    case object TEnumOpaque extends PType // unresolved enum fallback
    case object TFixed64 extends PType
    case object TSFixed64 extends PType
    case object TDouble extends PType
    case object TFixed32 extends PType
    case object TSFixed32 extends PType
    case object TFloat extends PType
    case object TString extends PType
    case object TBytes extends PType
    final case class TMessage(fqName: String) extends PType
    final case class TEnum(fqName: String) extends PType
    /** map<k,v> — wire-encoded as repeated entry messages. */
    final case class TMap(key: PType, value: PType) extends PType
  }

  final case class PField(name: String, number: Int, repeated: Boolean,
      ptype: PType)
  final case class PMessage(fqName: String, fields: Vector[PField]) {
    // per-descriptor lookup caches — the wire codec runs per RECORD,
    // and rebuilding these maps per record dominated qc6's profile
    @transient lazy val byNumber: Map[Int, PField] =
      fields.map(f => f.number -> f).toMap
    @transient lazy val byName: Map[String, PField] =
      fields.map(f => f.name -> f).toMap
  }
  final case class PEnum(fqName: String, values: Map[Int, String])

  /** A compiled schema set: fully-qualified name → descriptor. Message
    * names are addressed with a leading dot (doc/protobuf.md:36-44).
    */
  final case class PSchemaSet(messages: Map[String, PMessage],
      enums: Map[String, PEnum]) extends Serializable {
    def message(fqNameWithDot: String): PMessage = {
      require(fqNameWithDot.startsWith("."),
        s"message name must be fully qualified with leading dot: " +
          s"$fqNameWithDot")
      messages.getOrElse(fqNameWithDot.stripPrefix("."),
        throw new IllegalArgumentException(
          s"unknown message $fqNameWithDot; known: ${messages.keys.toSeq.sorted}"))
    }
    def merge(other: PSchemaSet): PSchemaSet =
      PSchemaSet(messages ++ other.messages, enums ++ other.enums)
  }

  object PSchemaSet {
    val empty: PSchemaSet = PSchemaSet(Map.empty, Map.empty)
  }

  private val scalarTypes: Map[String, PType] = {
    import PType._
    Map("int32" -> TInt32, "int64" -> TInt64, "uint32" -> TUInt32,
      "uint64" -> TUInt64, "sint32" -> TSInt32, "sint64" -> TSInt64,
      "bool" -> TBool, "fixed64" -> TFixed64, "sfixed64" -> TSFixed64,
      "double" -> TDouble, "fixed32" -> TFixed32, "sfixed32" -> TSFixed32,
      "float" -> TFloat, "string" -> TString, "bytes" -> TBytes)
  }

  /** Parse one .proto source. Unresolved type names become
    * TMessage/TEnum refs resolved lazily against the merged set.
    */
  def parse(source: String): PSchemaSet = {
    val tokens = tokenize(source)
    val it = tokens.iterator.buffered
    var pkg = ""
    var messages = Map.empty[String, PMessage]
    var enums = Map.empty[String, PEnum]

    def fq(scope: Vector[String], name: String): String =
      (if (pkg.isEmpty) scope :+ name else pkg +: (scope :+ name))
        .mkString(".")

    def skipStatement(): Unit = {
      var depth = 0
      var done = false
      while (it.hasNext && !done) {
        val t = it.next()
        if (t == "{") depth += 1
        else if (t == "}") { depth -= 1; if (depth <= 0) done = true }
        else if (t == ";" && depth == 0) done = true
      }
    }

    def parseEnum(scope: Vector[String]): Unit = {
      val name = it.next()
      val fqName = fq(scope, name)
      expect("{")
      var values = Map.empty[Int, String]
      while (it.head != "}") {
        it.head match {
          case "option" | "reserved" => skipStatement()
          case vname =>
            it.next()
            expect("=")
            val num = it.next().toInt
            // value options like [deprecated = true]
            if (it.head == "[") skipBrackets()
            expect(";")
            values += num -> vname
        }
      }
      it.next() // }
      enums += fqName -> PEnum(fqName, values)
    }

    def skipBrackets(): Unit = {
      var depth = 0
      var done = false
      while (it.hasNext && !done) {
        val t = it.next()
        if (t == "[") depth += 1
        else if (t == "]") { depth -= 1; if (depth == 0) done = true }
      }
    }

    def expect(tok: String): Unit = {
      val t = it.next()
      require(t == tok, s"proto parse: expected '$tok' got '$t'")
    }

    def parseFieldInto(scope: Vector[String],
        fields: scala.collection.mutable.ArrayBuffer[PField]): Unit = {
      var repeated = false
      var t = it.next()
      if (t == "repeated") { repeated = true; t = it.next() }
      else if (t == "optional" || t == "required") t = it.next()
      if (t == "map" && it.head == "<") {
        it.next() // <
        val kt = typeOf(it.next())
        expect(",")
        val vt = typeOf(it.next())
        expect(">")
        val name = it.next()
        expect("=")
        val num = it.next().toInt
        if (it.head == "[") skipBrackets()
        expect(";")
        fields += PField(name, num, repeated = true, PType.TMap(kt, vt))
      } else {
        val ptype = typeOf(t)
        val name = it.next()
        expect("=")
        val num = it.next().toInt
        if (it.head == "[") skipBrackets()
        expect(";")
        fields += PField(name, num, repeated, ptype)
      }
    }

    def typeOf(t: String): PType =
      scalarTypes.getOrElse(t, PType.TMessage(t)) // resolved later

    def parseMessage(scope: Vector[String]): Unit = {
      val name = it.next()
      val fqName = fq(scope, name)
      expect("{")
      val fields = scala.collection.mutable.ArrayBuffer.empty[PField]
      while (it.head != "}") {
        it.head match {
          case "message" => it.next(); parseMessage(scope :+ name)
          case "enum" => it.next(); parseEnum(scope :+ name)
          case "option" | "reserved" | "extensions" => skipStatement()
          case "oneof" =>
            it.next(); it.next() // 'oneof' name
            expect("{")
            while (it.head != "}") parseFieldInto(scope :+ name, fields)
            it.next() // }
          case _ => parseFieldInto(scope :+ name, fields)
        }
      }
      it.next() // }
      messages += fqName -> PMessage(fqName, fields.toVector)
    }

    while (it.hasNext) {
      it.next() match {
        case "syntax" | "option" | "import" => skipStatement()
        case "package" =>
          pkg = it.next()
          expect(";")
        case "message" => parseMessage(Vector.empty)
        case "enum" => parseEnum(Vector.empty)
        case ";" => ()
        case other => // tolerate stray tokens at top level
          ()
      }
    }

    // resolve relative type names to fully-qualified ones
    val known = messages.keySet ++ enums.keySet
    def resolve(ref: String, scopeFq: String): String = {
      if (ref.startsWith(".")) return ref.stripPrefix(".")
      // try innermost scope outward (protobuf name resolution)
      val scopeParts = scopeFq.split("\\.").toVector
      (scopeParts.indices.reverse.map(i =>
        (scopeParts.take(i) :+ ref).mkString(".")) :+ ref)
        .find(known.contains)
        .getOrElse(ref)
    }
    val resolved = messages.map { case (fqName, m) =>
      fqName -> m.copy(fields = m.fields.map { f =>
        def fix(t: PType): PType = t match {
          case PType.TMessage(ref) =>
            val r = resolve(ref, fqName)
            if (enums.contains(r)) PType.TEnum(r) else PType.TMessage(r)
          case PType.TMap(k, v) => PType.TMap(fix(k), fix(v))
          case other => other
        }
        f.copy(ptype = fix(f.ptype))
      })
    }
    PSchemaSet(resolved, enums)
  }

  private def tokenize(src: String): Vector[String] = {
    // strip // and /* */ comments
    val noComments = src
      .replaceAll("(?s)/\\*.*?\\*/", " ")
      .replaceAll("//[^\n]*", " ")
    val out = Vector.newBuilder[String]
    var i = 0
    val s = noComments
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("{}[]<>=;,".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        out += s.substring(i, end + 1)
        i = end + 1
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace &&
          "{}[]<>=;,\"".indexOf(s.charAt(j)) < 0) j += 1
        out += s.substring(i, j)
        i = j
      }
    }
    out.result()
  }
}

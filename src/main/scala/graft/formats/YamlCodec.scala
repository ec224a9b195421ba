package graft.formats

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{DumperOptions, Yaml}

/** YAML codec over snakeyaml (present in /opt/spark/jars). Reference
  * semantics (src/value/yaml.rs): the WHOLE input is one document
  * (yaml.rs:35-45 — despite the multi-doc flag help, SURVEY S8), and
  * each output record is one document + newline (yaml.rs:47-57).
  */
object YamlCodec {

  // SnakeYAML is not thread-safe, but construction is expensive —
  // cache one instance per executor thread instead of per call.
  private val yamlTL: ThreadLocal[Yaml] = ThreadLocal.withInitial { () =>
    val opts = new DumperOptions()
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    new Yaml(opts)
  }

  private def yaml: Yaml = yamlTL.get()

  /** Whole input → exactly one Value (single-document semantics). */
  def parse(input: String): Value = fromJava(yaml.load[AnyRef](input))

  // widen: YAML has no width tags; typed-mode scalars emit as values
  def emit(v: Value): String = yaml.dump(toJava(Value.widen(v)))

  private def fromJava(o: AnyRef): Value = o match {
    case null => Value.Unit
    case b: java.lang.Boolean => Value.Bool(b)
    case i: java.lang.Integer => Value.I64(i.longValue)
    case l: java.lang.Long => Value.I64(l)
    case b: java.math.BigInteger =>
      if (b.bitLength < 64) Value.I64(b.longValue)
      else if (b.signum > 0 && b.bitLength == 64) Value.U64(b.longValue)
      else Value.F64(b.doubleValue)
    case d: java.lang.Double => Value.F64(d)
    case f: java.lang.Float => Value.F64(f.doubleValue)
    case s: String => Value.Str(s)
    case b: Array[Byte] => Value.Bytes(b)
    case d: java.util.Date => Value.Str(d.toInstant.toString)
    case l: java.util.List[_] =>
      Value.Seq(l.asScala.toVector.map(x => fromJava(x.asInstanceOf[AnyRef])))
    case m: java.util.Map[_, _] =>
      Value.Map(m.asScala.toVector.map { case (k, v) =>
        (fromJava(k.asInstanceOf[AnyRef]), fromJava(v.asInstanceOf[AnyRef]))
      })
    case other => Value.Str(other.toString)
  }

  private def toJava(v: Value): AnyRef = v match {
    case Value.Unit => null
    case Value.Bool(b) => java.lang.Boolean.valueOf(b)
    case Value.I64(n) => java.lang.Long.valueOf(n)
    case Value.U64(bits) =>
      if (bits >= 0) java.lang.Long.valueOf(bits)
      else new java.math.BigInteger(java.lang.Long.toUnsignedString(bits))
    case Value.F64(d) => java.lang.Double.valueOf(d)
    case Value.Str(s) => s
    case Value.Bytes(b) => b
    case Value.Seq(vs) => vs.map(toJava).asJava
    case Value.Map(kvs) =>
      val m = new java.util.LinkedHashMap[AnyRef, AnyRef]()
      kvs.foreach { case (k, e) => m.put(toJava(k), toJava(e)) }
      m
    // unreachable from emit() (deep-widened at entry); total for safety
    case tagged => toJava(Value.widen(tagged))
  }
}

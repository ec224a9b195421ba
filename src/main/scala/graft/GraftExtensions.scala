package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CodecFns
import graft.operators._

/** Standard Spark integration point: register graft's codec and
  * hash/text expressions at session build time —
  *
  *   `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *   `--conf spark.sql.extensions=graft.GraftExtensions`
  *
  * (SURVEY §3.4: analyzer-level function resolution is the only
  * extension hook the engine needs; planning stays stock Catalyst.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    def fn(name: String,
        builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
          => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))

    fn("from_msgpack", xs => CodecFns.FromMsgPack(xs.head))
    fn("from_msgpack_stream", xs => CodecFns.FromMsgPackStream(xs.head))
    fn("to_msgpack", xs => CodecFns.ToMsgPack(xs.head))
    fn("from_cbor", xs => CodecFns.FromCbor(xs.head))
    fn("from_cbor_stream", xs => CodecFns.FromCborStream(xs.head))
    fn("to_cbor", xs => CodecFns.ToCbor(xs.head))
    fn("from_toml", xs => CodecFns.FromToml(xs.head))
    fn("to_toml", xs => CodecFns.ToToml(xs.head))
    fn("from_yaml", xs => CodecFns.FromYaml(xs.head))
    fn("to_yaml", xs => CodecFns.ToYaml(xs.head))
    fn("minhash_signature", xs => MinHashSignature(xs.head))
    fn("simhash60", xs => SimHash60(xs.head))
    fn("winnow_fingerprint", xs => WinnowFingerprint(xs.head))
    fn("word_shingles", xs => WordShingles(xs.head, 3))
    fn("dot_product", xs => DotProduct(xs(0), xs(1)))
    // the sketch pair: SELECT graft_bloom(col) builds the bitset
    // (aggregate), bloom_might_contain probes it — defaults match
    // Sketches.bloomAgg/bloomMightContain
    fn("graft_bloom", xs =>
      BloomBuildAgg(xs.head, 1 << 23, 5).toAggregateExpression())
    fn("bloom_might_contain", xs => BloomMightContain(xs(0), xs(1), 5))
  }
}

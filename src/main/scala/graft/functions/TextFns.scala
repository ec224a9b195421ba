package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text primitives for the dedup / text-analysis layer
  * (SURVEY §2.11). All pure `org.apache.spark.sql.functions` composition
  * — codegen-friendly, no UDFs — and each formula is replicable in
  * DuckDB SQL for the oracle gate.
  */
object TextFns {

  /** Whitespace tokens of lowercased text, empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Distinct whitespace tokens (set semantics, for SimHash/Jaccard). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Distinct word n-gram shingles ("a b c") of lowercased text.
    * Documents shorter than n tokens get an empty shingle set (guarded:
    * sequence(0, negative) would throw in Spark).
    */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ",
        (1 to n).map(o => element_at(toks, i + o)): _*))
    array_distinct(
      when(size(toks) >= n, grams)
        .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Exact Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val ix = size(array_intersect(a, b)).cast(DoubleType)
    ix / (size(a) + size(b) - ix)
  }

  /** Dot product of two double arrays — left-to-right accumulation, so
    * the result is the bit-exact IEEE sequence DuckDB's list_inner_product
    * computes over the same values.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two float/double array columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast(DoubleType))
    val bd = transform(b, _.cast(DoubleType))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Count of BPE-ish tokens: letter runs, digit runs, single other
    * non-space chars. Same regex semantics in java.util.regex and RE2.
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
}

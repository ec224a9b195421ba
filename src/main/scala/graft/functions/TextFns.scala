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

  /** Distinct word n-gram shingles ("a b c") of lowercased text —
    * single-pass custom Expression (the functions-composition form
    * re-splits the text per element access; see WordShingles docs).
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    graft.operators.HashFns.wordShingles(text, n)

  /** Ordered NON-distinct word bigrams "a b" of lowercased text —
    * counting semantics (every occurrence kept), unlike
    * [[wordShingles]]' set semantics. The qs33 update-mode gate keys
    * on these: the bigram vocabulary is sparse across document slices
    * (unigrams all co-occur everywhere in the synthetic corpus, which
    * would make update- and append-mode sinks indistinguishable).
    */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Sign-bit Hamming distance of two numeric arrays: the number of
    * dimensions whose signs (> 0) disagree — the xs13 BQ comparison
    * without the packing, as exact integers (codegen'd HOF chain, no
    * IEEE ambiguity). Used by the xs16 Hamming-guided traversal.
    */
  def signHamming(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => (x > 0) =!= (y > 0)),
      p => p)).cast(LongType)

  /** Exact Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val ix = size(array_intersect(a, b)).cast(DoubleType)
    ix / (size(a) + size(b) - ix)
  }

  /** Dot product of two float/double arrays — left-to-right double
    * accumulation (bit-exact vs DuckDB's list_inner_product over the
    * same values), as a tight single-pass Expression.
    */
  def dot(a: Column, b: Column): Column =
    graft.operators.HashFns.dotProduct(a, b)

  /** Cosine similarity of two float/double array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2 norm — precompute per row before pair joins: computing norms
    * inside an n² pair loop triples the work (SURVEY bench note).
    */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Sliding-window document chunking (training-data prep): split a
    * document into overlapping token windows of `maxTokens` every
    * `stride` tokens — the op that turns a 100TB document corpus into
    * model-context-sized samples. Tokens materialize ONCE per row in a
    * projection; the Generate then explodes precomputed start offsets,
    * so the text is never re-split per chunk (the no-CSE-in-lambda
    * pitfall, PLANS.md). Output: (idCol, start, n_tok, chunk).
    */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxTokens: Int = 64, stride: Int = 32)
      : org.apache.spark.sql.DataFrame = {
    require(stride > 0 && maxTokens > 0, "chunkDocs: positive sizes")
    df.select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as("start"))
      .select(col(idCol), col("start"),
        size(slice(col("__toks"), col("start") + 1, lit(maxTokens)))
          .as("n_tok"),
        array_join(slice(col("__toks"), col("start") + 1, lit(maxTokens)),
          " ").as("chunk"))
  }

  /** One-pass chunk statistics (n_docs, n_chunks, n_tok) for the
    * stride/`maxTokens` slicing of [[chunkDocs]] — shared by the xp1
    * and xp2 pipeline entries, IN LOCKSTEP with chunkDocs (xt5) and
    * the DuckDB oracle replicas. explode_outer keeps zero-chunk docs
    * (one null-start row) so a single aggregation also yields the doc
    * count — aggregating docs and chunks as separate branches would
    * execute the (typically expensive) upstream lineage twice.
    */
  def chunkStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxTokens: Int = 64, stride: Int = 32)
      : org.apache.spark.sql.DataFrame = {
    require(stride > 0 && maxTokens > 0, "chunkStats: positive sizes")
    df.select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
      .select(col(idCol), col("__toks"),
        explode_outer(when(size(col("__toks")) > 0,
          sequence(lit(0), size(col("__toks")) - 1, lit(stride))))
          .as("start"))
      .agg(
        sum(when(col("start") === 0 || col("start").isNull, 1)
          .otherwise(0)).cast("long").as("n_docs"),
        count(col("start")).as("n_chunks"),
        sum(when(col("start").isNotNull,
          size(slice(col("__toks"), col("start") + 1, lit(maxTokens)))))
          .cast("long").as("n_tok"))
  }

  /** Count of BPE-ish tokens: letter runs, digit runs, single other
    * non-space chars. Same regex semantics in java.util.regex and RE2
    * — the whitespace class is pinned explicitly (Java's `\s` includes
    * U+000B, RE2's does not; see [[graft.operators.Bpe.PreTokenRegex]]).
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit(graft.operators.Bpe.PreTokenRegex), lit(0)))

  /** Fraction of word n-grams that are duplicates of an earlier one in
    * the same doc (Gopher-style repetition signal). Entirely per-row —
    * a narrow map over the corpus, no shuffle: distinct count from the
    * single-pass [[wordShingles]] set, total from the token count.
    */
  def dupShingleFrac(text: Column, n: Int = 3): Column = {
    val total = greatest(size(tokens(text)) - (n - 1), lit(0))
    when(total > 0,
      lit(1.0) - size(wordShingles(text, n)).cast(DoubleType) / total)
      .otherwise(0.0)
  }

  /** Polynomial rolling hash of a string into [0, buckets) — the
    * hashed-feature function of the DSIR importance weights (xt14).
    * Same recurrence as the winnowing gram hash
    * ([[graft.operators.WinnowFingerprint]]): acc·257 + codepoint,
    * mod 2^31−1, so the DuckDB oracle replays it with the identical
    * LIST_REDUCE the winnowing oracles already use. Pure per-row
    * column arithmetic — a narrow map at any corpus size.
    */
  def polyBucket(w: Column, buckets: Int): Column =
    // empty-string guard: sequence(1, 0) is Spark's DESCENDING range
    // [1, 0], which would silently fold two bogus positions (while
    // the DuckDB replay errors on the empty list) — pin '' to bucket 0
    // explicitly in both engines' reachable space
    when(length(w) > 0,
      pmod(
        aggregate(sequence(lit(1), length(w)), lit(0L),
          (acc, i) => (acc * 257 + ascii(w.substr(i, lit(1)))) %
            lit(2147483647L)),
        lit(buckets.toLong))).otherwise(lit(0L))

  /** Adjacent token pairs as "w1 w2" strings (the bigram features of
    * xt14). Equal-length slices keep `zip_with` away from its
    * null-padding behavior on ragged inputs.
    */
  def wordBigrams(toks: Column): Column = {
    val n1 = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Fraction of tokens taken by the single most frequent token —
    * computed per row with a sort + one `aggregate` pass over the
    * array (longest equal-run), no explode/groupBy shuffle.
    */
  def topWordFrac(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      topWordRun(text).cast(DoubleType) / size(toks)).otherwise(0.0)
  }

  /** Repeated-occurrence stats over an arbitrary string array: a
    * struct of (dupn, dupch) where dupn counts every occurrence of a
    * value BEYOND its first and dupch the characters those repeats
    * carry — the numerators of the Gopher duplicate-line fractions
    * (xt16). One sort + one `aggregate` pass per row (each sorted
    * element equal to its predecessor is a beyond-first occurrence);
    * no explode/groupBy shuffle, and the count form is independent of
    * the sort's tie order.
    */
  def dupRunStats(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast(StringType).as("prev"),
        lit(0L).as("dupn"), lit(0L).as("dupch")),
      (acc, x) => {
        val rep = x === acc.getField("prev")
        struct(x.as("prev"),
          (acc.getField("dupn") + when(rep, 1L).otherwise(0L)).as("dupn"),
          (acc.getField("dupch") +
            when(rep, length(x).cast(LongType)).otherwise(0L)).as("dupch"))
      },
      acc => struct(acc.getField("dupn").as("dupn"),
        acc.getField("dupch").as("dupch")))

  /** Most frequent element of a string array with its count, ties
    * broken to the lexicographically SMALLEST value (the sorted pass
    * only replaces the champion on a strictly longer run, so the
    * first — smallest — max run wins; same tie DuckDB's
    * `ORDER BY c DESC, g` picks). Struct (gram, cnt); cnt=0 on empty.
    */
  def topElem(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"),
        lit(0L).as("bestrun"), lit(null).cast(StringType).as("bestgram")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(1L)
        val better = run > acc.getField("bestrun")
        struct(x.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("bestrun"))
            .as("bestrun"),
          when(better, x).otherwise(acc.getField("bestgram"))
            .as("bestgram"))
      },
      acc => struct(acc.getField("bestgram").as("gram"),
        acc.getField("bestrun").as("cnt")))

  /** Occurrence count of the single most frequent token, as the exact
    * integer (the longest equal-run of the sorted token array) — the
    * numerator of [[topWordFrac]], exposed so ratio thresholds (xt15)
    * can divide the true integer instead of reconstituting it from a
    * double.
    */
  def topWordRun(text: Column): Column =
    aggregate(array_sort(tokens(text)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
}

package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.FusedUnary

/** Deterministic byte-pair-encoding tokenizer (VERDICT r8 #1): the
  * public BPE algorithm (Sennrich et al. 2016, arXiv:1508.07909; the
  * GPT-2 encoder uses the same greedy rank-min merge loop) as a
  * corpus-trained merges TABLE plus a fused per-row encode expression
  * — replacing the "BPE-ish regex" token-count proxy wherever token
  * counts are load-bearing (packing budgets, xk11b).
  *
  * Exactness discipline: every step is replayed independently by the
  * DuckDB oracle ([[BpeSql]]) —
  *
  *  - pre-tokenization: `lower(text)` + the xt3 pre-token regex
  *    (`[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]`, whitespace pinned —
  *    identical in java.util.regex and RE2, proven by the xt3 hash
  *    gate since round 2);
  *  - training: word histogram capped at the top `maxWords` words by
  *    (count DESC, word ASC in UTF-8 byte order), then `numMerges`
  *    iterations of count-adjacent-pairs → argmax by (count DESC,
  *    pair ASC) → merge-all-occurrences-left-to-right. The histogram
  *    cap is what makes training 100 TB-safe: one vocabulary-bounded
  *    shuffle + a TakeOrdered collect of `maxWords` rows; the driver
  *    merge loop touches only that bounded table (real tokenizers
  *    train on a sample for the same reason);
  *  - encoding: per word, repeatedly find the LOWEST-rank adjacent
  *    pair present in the merges table and merge all its occurrences
  *    left-to-right (each rank can fire at most once per word, so the
  *    loop runs ≤ numMerges steps — the bound the oracle's unrolled
  *    SQL relies on). Encoding is a narrow per-row map (fused
  *    expression, per-thread word memo): zero shuffle at any corpus
  *    size, merges shipped as a plan literal (broadcast-class; a few
  *    KB for the oracle-gated config, a few MB for a production
  *    50k-merge vocabulary).
  *
  * Left-to-right non-overlap semantics: merging pair (a,a) over
  * "aaa" yields [aa, a] — the same fold the oracle's LIST_REDUCE
  * replays. After a full pass no occurrence of the merged pair
  * remains (symbols never split), which is what guarantees each rank
  * fires once.
  */
object Bpe {

  /** xt3's pre-token pattern (letter runs / digit runs / single
    * non-space symbol over lowercased text). The whitespace class is
    * PINNED explicitly (ADVICE r10): Java's `\s` includes U+000B
    * (vertical tab) while RE2's does not, so `\s` would pre-tokenize a
    * \x0B-bearing document differently on the two engines. The
    * explicit class `[ \t\n\x0B\f\r]` is identical in java.util.regex
    * and RE2 ([[BpeSql.ReLit]] carries the same class).
    */
  val PreTokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"

  /** GPT-2-STYLE pre-token pattern for the byte-level tokenizer
    * (VERDICT r9 #2): contraction suffixes, space-prefixed letter /
    * digit / symbol runs (the leading space belongs to the following
    * word — the GPT-2 signature), and whitespace runs. The reference
    * GPT-2 pattern ends `\s+(?!\S)|\s+`; RE2 (DuckDB's engine) has no
    * lookahead, so this is the documented lookahead-free variant: a
    * whitespace run NOT directly followed by a word keeps ALL its
    * spaces (GPT-2 would donate the last one to the next token).
    * Ordered alternation + leftmost match are identical in
    * java.util.regex and RE2 (the xt3 discipline). Case is preserved —
    * byte-level BPE has no OOV symbol, so no lowercasing.
    *
    * The whitespace class is PINNED explicitly (ADVICE r10): Java's
    * `\s` includes U+000B, RE2's does not, so a \x0B would join a
    * whitespace run on the JVM but a symbol run under RE2 and diverge
    * the xt24b/qs18 hash gate. `[ \t\n\x0B\f\r]` means the same set
    * on both engines ([[BpeSql.GptReLit]] carries the same class).
    */
  val GptPreRegex =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+|" +
      " ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  private val pat = java.util.regex.Pattern.compile(PreTokenRegex)
  private val gptPat = java.util.regex.Pattern.compile(GptPreRegex)

  /** Pre-tokens of ALREADY-LOWERCASED text, in order. */
  def preTokens(lowered: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]
    val m = pat.matcher(lowered)
    while (m.find()) out += m.group()
    out
  }

  /** GPT-2-style pre-tokens of RAW (case-preserved) text, in order. */
  def preTokensGpt(text: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]
    val m = gptPat.matcher(text)
    while (m.find()) out += m.group()
    out
  }

  /** GPT-2 byte→unicode visible-symbol map (the published
    * `bytes_to_unicode` construction, gpt-2/src/encoder.py): the 188
    * "printable" bytes (33..126, 161..172, 174..255) map to their own
    * codepoint; the other 68 map to 256+k in byte order. Bijective, so
    * byte sequences concatenate as plain strings — [[mergeApply]] and
    * the oracle's mergeFold work unchanged. NOTE the mapped-symbol
    * codepoint order is NOT byte order (byte 0x20 maps to U+0120,
    * which sorts above 0x61→'a'); the invariant tie-breaks actually
    * rely on is weaker and sufficient: BOTH engines compare the SAME
    * mapped strings ([[cpCompare]] here, binary collation in DuckDB —
    * identical orderings of identical symbols), so training argmax
    * tie-breaks agree even where mapped order diverges from byte
    * order.
    */
  val ByteChar: Array[String] = {
    val out = new Array[String](256)
    var k = 0
    for (b <- 0 until 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + k)); k += 1 }
    }
    out
  }

  /** Initial symbol sequence for byte-level BPE: one mapped symbol per
    * UTF-8 BYTE of the word. Every string tokenizes — there is no OOV
    * symbol (a multi-byte codepoint just starts as 2-4 byte symbols).
    */
  def byteSymbols(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteChar(bytes(i) & 0xff); i += 1 }
    out
  }

  /** Initial symbol sequence: one symbol per CODEPOINT (matching the
    * oracle's codepoint-indexed `w[i]`), not per UTF-16 unit.
    */
  def codepointSymbols(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0; var k = 0
    while (i < word.length) {
      val c = word.codePointAt(i)
      val w = Character.charCount(c)
      out(k) = word.substring(i, i + w)
      k += 1; i += w
    }
    out
  }

  /** UTF-8 byte order == codepoint order — the comparator DuckDB's
    * default binary collation sorts strings with. Java's
    * String.compareTo is UTF-16 code-unit order, which differs for
    * astral codepoints vs BMP ones ≥ U+E000; compare by codepoint so
    * training tie-breaks agree on any corpus.
    */
  def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Merge all occurrences of (p1, p2), left to right, non-overlap. */
  def mergeApply(syms: Array[String], p1: String,
      p2: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
        out += p1 + p2; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The BPE training loop over a (word, freq) histogram. Stops early
    * when no adjacent pair remains (the oracle's extra iterations are
    * then no-ops on empty best-pair tables — same merges list).
    */
  def train(hist: Seq[(String, Long)], numMerges: Int,
      symsOf: String => Array[String] = codepointSymbols _)
      : List[(String, String)] = {
    var words = hist.map { case (w, c) => (symsOf(w), c) }
    val merges = mutable.ListBuffer.empty[(String, String)]
    var k = 0
    while (k < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) return merges.toList
      // argmax by (count DESC, p1 ASC, p2 ASC) in UTF-8 byte order —
      // exactly the oracle's ORDER BY c DESC, a, b LIMIT 1
      var best: (String, String) = null
      var bestC = -1L
      for ((p, c) <- counts) {
        val better = c > bestC || (c == bestC && {
          val c1 = cpCompare(p._1, best._1)
          c1 < 0 || (c1 == 0 && cpCompare(p._2, best._2) < 0)
        })
        if (better) { best = p; bestC = c }
      }
      merges += best
      words = words.map { case (s, c) =>
        (mergeApply(s, best._1, best._2), c)
      }
      k += 1
    }
    merges.toList
  }

  /** Rank table for encoding; serializable plan literal.
    * `numMerges` is the K the ORACLE's encode chain was unrolled to —
    * the [[encodeSyms]] round cap. It defaults to `merges.length`
    * (the common case: training ran all K rounds), but when training
    * terminated early (pair table ran dry) the caller must pass the
    * requested K so the JVM still runs the same number of encode
    * rounds as the oracle's K CTE steps (on an adversarial merge
    * table a rank can re-fire after a later merge recreates one of
    * its constituents, so extra rounds are not always no-ops).
    * `rankMap` is a lazily-rebuilt executor-side cache: @volatile so a
    * thread never observes another thread's partially constructed map
    * (built into a local, published by a single assignment; a benign
    * race rebuilds the identical map at worst).
    */
  final class Ranks(val merges: IndexedSeq[(String, String)],
      numMergesOpt: Int = -1)
      extends Serializable {
    val numMerges: Int =
      if (numMergesOpt < 0) merges.length else numMergesOpt
    @transient @volatile private var rankMap: java.util.HashMap[String, Integer] = _
    def rank: java.util.HashMap[String, Integer] = {
      var r = rankMap
      if (r == null) {
        val m = new java.util.HashMap[String, Integer](merges.size * 2)
        merges.zipWithIndex.foreach { case ((a, b), i) =>
          m.put(a + " " + b, i)
        }
        rankMap = m
        r = m
      }
      r
    }
  }

  /** Greedy rank-min encode of one pre-token. Hard-capped at
    * [[Ranks.numMerges]] rounds — the same K steps the oracle's
    * unrolled encode CTEs run (K = the requested merge count, which
    * exceeds `merges.length` when training terminated early). On
    * merge tables [[train]] produces, each rank fires at most once
    * per word so the cap never binds; on an adversarial hand-built
    * table where a later merge recreates a constituent of an
    * earlier-rank pair, the cap keeps JVM and SQL in exact lockstep —
    * neither fewer rounds (early-stopped training) nor extra rounds
    * the oracle never sees.
    */
  def encodeWord(word: String, ranks: Ranks): Array[String] =
    encodeSyms(codepointSymbols(word), ranks)

  /** [[encodeWord]] body over a pre-built initial symbol sequence
    * (codepoint- or byte-level — the merge loop is alphabet-blind).
    */
  def encodeSyms(syms0: Array[String], ranks: Ranks): Array[String] = {
    var syms = syms0
    var round = 0
    while (syms.length >= 2 && round < ranks.numMerges) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) return syms
      val (p1, p2) = ranks.merges(bestRank)
      syms = mergeApply(syms, p1, p2)
      round += 1
    }
    syms
  }

  /** Corpus word histogram: top `maxWords` pre-tokens by (count DESC,
    * word ASC). One vocabulary-bounded shuffle + a TakeOrdered —
    * the collect is `maxWords` rows, never corpus-sized.
    */
  def wordHistogram(docs: DataFrame, textCol: String,
      maxWords: Int): Seq[(String, Long)] =
    docs.where(col(textCol).isNotNull)
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit(PreTokenRegex), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Byte-level corpus word histogram: GPT-2-style pre-tokens of RAW
    * text (no lowercasing), same bounded shuffle + TakeOrdered shape.
    */
  def wordHistogramBytes(docs: DataFrame, textCol: String,
      maxWords: Int): Seq[(String, Long)] =
    docs.where(col(textCol).isNotNull)
      .select(explode(regexp_extract_all(col(textCol),
        lit(GptPreRegex), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train merges from a corpus: bounded histogram + driver loop. */
  def trainOn(docs: DataFrame, textCol: String, maxWords: Int = 256,
      numMerges: Int = 16): List[(String, String)] =
    train(wordHistogram(docs, textCol, maxWords), numMerges)

  /** Byte-level training: GPT-2-style pre-tokens, byte-symbol
    * alphabet. Tie-breaks compare MAPPED symbol strings (codepoint
    * order), same as the oracle's string sort over the mapped chars.
    */
  def trainBytesOn(docs: DataFrame, textCol: String, maxWords: Int = 256,
      numMerges: Int = 16): List[(String, String)] =
    train(wordHistogramBytes(docs, textCol, maxWords), numMerges,
      byteSymbols _)

  /** Per-doc byte-level tokenization frame shared by the xt24b query
    * shape and the qs18 stream runner: total token count + '|'-joined
    * segmentation of the 48-char prefix. Narrow join-free map — the
    * merges ship as a plan literal, zero shuffle at any corpus size.
    */
  def tokenizeDocsBytes(docs: DataFrame,
      merges: Seq[(String, String)], numMerges: Int = -1): DataFrame =
    docs.select(col("doc_id"),
      bpeCountBytes(col("text"), merges, numMerges).as("n_bpe"),
      array_join(
        bpeTokensBytes(substring(col("text"), 1, 48), merges,
          numMerges), "|")
        .as("seg"))

  // ---- column API ----

  def bpeCount(text: Column, merges: Seq[(String, String)],
      numMerges: Int = -1): Column =
    Bridge.column(BpeCount(Bridge.expression(text), merges,
      numMerges = numMerges))

  def bpeTokens(text: Column, merges: Seq[(String, String)],
      numMerges: Int = -1): Column =
    Bridge.column(BpeTokens(Bridge.expression(text), merges,
      numMerges = numMerges))

  def bpeCountBytes(text: Column, merges: Seq[(String, String)],
      numMerges: Int = -1): Column =
    Bridge.column(BpeCount(Bridge.expression(text), merges,
      byteLevel = true, numMerges = numMerges))

  def bpeTokensBytes(text: Column,
      merges: Seq[(String, String)], numMerges: Int = -1): Column =
    Bridge.column(BpeTokens(Bridge.expression(text), merges,
      byteLevel = true, numMerges = numMerges))
}

/** Shared eval body for the two BPE expressions: lowercase via
  * UTF8String (identical to Spark's `lower`), pre-tokenize, encode
  * each word with a per-thread memo (words repeat heavily; the memo
  * is capped so a pathological vocabulary can't grow it unbounded).
  */
sealed trait BpeExpr extends UnaryExpression with FusedUnary {
  def merges: Seq[(String, String)]

  /** Byte-level mode: GPT-2-style pre-tokens over raw case-preserved
    * text, UTF-8-byte initial symbols (no OOV). Default (false) is the
    * codepoint-level xt24 tokenizer over lowercased text.
    */
  def byteLevel: Boolean

  /** Encode-round cap K matching the oracle's unrolled CTE count;
    * -1 (default) = merges.length. Pass the trained-for K explicitly
    * when training may terminate early (see [[Bpe.Ranks]]).
    */
  def numMerges: Int

  @transient protected lazy val ranks =
    new Bpe.Ranks(merges.toIndexedSeq, numMerges)
  @transient private lazy val memo =
    ThreadLocal.withInitial[java.util.HashMap[String, Array[String]]](
      () => new java.util.HashMap[String, Array[String]])

  protected def encodeMemo(word: String): Array[String] = {
    val m = memo.get()
    var r = m.get(word)
    if (r == null) {
      r = Bpe.encodeSyms(
        if (byteLevel) Bpe.byteSymbols(word)
        else Bpe.codepointSymbols(word), ranks)
      if (m.size >= 65536) m.clear()
      m.put(word, r)
    }
    r
  }

  protected def loweredWords(input: Any): mutable.ArrayBuffer[String] =
    if (byteLevel)
      Bpe.preTokensGpt(input.asInstanceOf[UTF8String].toString)
    else Bpe.preTokens(
      input.asInstanceOf[UTF8String].toLowerCase.toString)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType}")
}

/** Total BPE token count of a document (sum over pre-tokens). */
case class BpeCount(child: Expression,
    merges: Seq[(String, String)],
    byteLevel: Boolean = false,
    numMerges: Int = -1) extends BpeExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any = {
    val ws = loweredWords(input)
    var n = 0; var i = 0
    while (i < ws.length) { n += encodeMemo(ws(i)).length; i += 1 }
    n
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Ordered BPE token sequence of a document. */
case class BpeTokens(child: Expression,
    merges: Seq[(String, String)],
    byteLevel: Boolean = false,
    numMerges: Int = -1) extends BpeExpr {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any = {
    val ws = loweredWords(input)
    val out = new mutable.ArrayBuffer[AnyRef]
    var i = 0
    while (i < ws.length) {
      val toks = encodeMemo(ws(i))
      var j = 0
      while (j < toks.length) {
        out += UTF8String.fromString(toks(j)); j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** DuckDB replay of [[Bpe]]: training and encoding as UNROLLED CTE
  * chains (the xs6 "model re-derived in SQL" discipline). A `g`
  * regexp/list pass never rescans replaced text, and recursive CTEs
  * cannot aggregate over their own working table, so each training
  * iteration and each encode step is its own generated CTE — K of
  * each for a K-merge table (an encode needs ≤ K steps because each
  * rank fires at most once per word; see [[Bpe]] docs).
  */
object BpeSql {

  /** Pre-token regex as a DuckDB string literal (RE2 semantics are
    * identical for this pattern — the xt3 gate; whitespace class
    * pinned explicitly, see [[Bpe.PreTokenRegex]]).
    */
  val ReLit = """'[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]'"""

  /** [[Bpe.GptPreRegex]] as a DuckDB literal (single quotes doubled).
    * RE2 and java.util.regex agree on every construct used: ordered
    * alternation, `\p{L}`/`\p{N}` Unicode categories, greedy `+`, and
    * the explicitly pinned whitespace class `[ \t\n\x0B\f\r]` (RE2's
    * `\s` excludes \x0B, Java's includes it — pinned on both sides).
    */
  val GptReLit =
    """'''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+|""" +
      """ ?[^ \t\n\x0B\f\r\p{L}\p{N}]+|[ \t\n\x0B\f\r]+'"""

  /** Codepoint symbols of a string expression. */
  def chars(e: String): String =
    s"LIST_TRANSFORM(RANGE(1, LENGTH($e)+1), __i -> $e[__i])"

  /** UTF-8 bytes of a codepoint expression, as an INT list — the
    * standard 1-4 byte encoding arithmetic (RFC 3629), integer-exact.
    */
  private def utf8Bytes(cp: String): String =
    s"""CASE WHEN $cp < 128 THEN [$cp]
       |  WHEN $cp < 2048 THEN [192 + $cp // 64, 128 + $cp % 64]
       |  WHEN $cp < 65536 THEN [224 + $cp // 4096,
       |    128 + ($cp // 64) % 64, 128 + $cp % 64]
       |  ELSE [240 + $cp // 262144, 128 + ($cp // 4096) % 64,
       |    128 + ($cp // 64) % 64, 128 + $cp % 64] END""".stripMargin

  /** GPT-2 byte→unicode map of an INT byte expression (the closed-form
    * version of [[Bpe.ByteChar]]): printable bytes keep their
    * codepoint; bytes 0..32 shift to 256+b, 127..160 to 256+33+(b-127),
    * 173 to 256+67 — the k-th non-printable byte in order.
    */
  private def mapByte(b: String): String =
    s"""CHR(CASE
       |  WHEN ($b BETWEEN 33 AND 126) OR ($b BETWEEN 161 AND 172)
       |    OR $b >= 174 THEN $b
       |  WHEN $b <= 32 THEN 256 + $b
       |  WHEN $b BETWEEN 127 AND 160 THEN 289 + ($b - 127)
       |  ELSE 323 END)""".stripMargin

  /** Byte-level symbols of a string expression: per codepoint, expand
    * to UTF-8 bytes, map each through the GPT-2 byte table, flatten.
    * Exactly [[Bpe.byteSymbols]].
    */
  def byteChars(e: String): String =
    s"""FLATTEN(LIST_TRANSFORM(${chars(e)}, __c ->
       |  LIST_TRANSFORM(${utf8Bytes("UNICODE(__c)")},
       |    __b -> ${mapByte("__b")})))""".stripMargin

  /** Left-to-right non-overlap merge of pair (aE, bE) over a symbol
    * list, null pair → unchanged. Exactly [[Bpe.mergeApply]].
    */
  def mergeFold(symsE: String, aE: String, bE: String): String =
    s"""CASE WHEN $aE IS NULL THEN $symsE ELSE
       |  LIST_REDUCE(LIST_TRANSFORM($symsE, __s -> [__s]),
       |    (__acc, __x) -> CASE
       |      WHEN __acc[-1] = $aE AND __x[1] = $bE
       |      THEN __acc[1:LEN(__acc)-1] || [$aE || $bE]
       |      ELSE __acc || __x END) END""".stripMargin

  /** Training CTEs over `table`(text): emits __w0..__wK, one
    * __pK/__bK pair per iteration, and the ranked merges table
    * __m(r, a, b).
    */
  def trainCtes(table: String, maxWords: Int, k: Int): String =
    trainCtesFrom(
      s"""__w0 AS MATERIALIZED (
         |  SELECT w, cnt, ${chars("w")} AS syms FROM (
         |    SELECT w, COUNT(*) AS cnt FROM (
         |      SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), $ReLit)) AS w
         |      FROM $table WHERE text IS NOT NULL)
         |    GROUP BY w ORDER BY cnt DESC, w LIMIT $maxWords))""".stripMargin,
      k)

  /** Byte-level training CTEs: GPT-2-style pre-tokens of RAW text,
    * byte-symbol alphabet; same iteration chain as [[trainCtes]].
    */
  def trainCtesBytes(table: String, maxWords: Int, k: Int): String =
    trainCtesFrom(
      s"""__w0 AS MATERIALIZED (
         |  SELECT w, cnt, ${byteChars("w")} AS syms FROM (
         |    SELECT w, COUNT(*) AS cnt FROM (
         |      SELECT UNNEST(REGEXP_EXTRACT_ALL(text, $GptReLit)) AS w
         |      FROM $table WHERE text IS NOT NULL)
         |    GROUP BY w ORDER BY cnt DESC, w LIMIT $maxWords))""".stripMargin,
      k)

  private def trainCtesFrom(w0: String, k: Int): String = {
    val b = new StringBuilder
    b ++= w0
    for (i <- 0 until k) {
      b ++=
        s""",
           |__p$i AS MATERIALIZED (SELECT a, b, SUM(cnt) AS c FROM (
           |    SELECT cnt, syms[__t.i] AS a, syms[__t.i+1] AS b
           |    FROM __w$i, LATERAL UNNEST(RANGE(1, LEN(syms))) __t(i))
           |  GROUP BY a, b),
           |__b$i AS MATERIALIZED (SELECT a, b FROM __p$i ORDER BY c DESC, a, b LIMIT 1),
           |__w${i + 1} AS MATERIALIZED (SELECT w, cnt,
           |    ${mergeFold("syms", "__bb.a", "__bb.b")} AS syms
           |  FROM __w$i LEFT JOIN __b$i __bb ON TRUE)""".stripMargin
    }
    b ++= ",\n__m AS MATERIALIZED (" + (0 until k)
      .map(i => s"SELECT $i AS r, a, b FROM __b$i")
      .mkString(" UNION ALL ") + ")"
    b.toString
  }

  /** Encode CTEs over `wtab`(word): __e0..__eK; final symbols in
    * __e<k>.syms. Requires __m from [[trainCtes]] in scope.
    */
  def encodeCtes(wtab: String, k: Int,
      byteLevel: Boolean = false): String = {
    val syms0 = if (byteLevel) byteChars("word") else chars("word")
    val b = new StringBuilder
    b ++= s"__e0 AS MATERIALIZED (SELECT word, $syms0 AS syms FROM $wtab)"
    for (i <- 0 until k) {
      b ++=
        s""",
           |__r$i AS MATERIALIZED (SELECT pp.word, MIN(__m.r) AS r FROM (
           |    SELECT word, syms[__t.i] AS a, syms[__t.i+1] AS b
           |    FROM __e$i, LATERAL UNNEST(RANGE(1, LEN(syms))) __t(i)) pp
           |  JOIN __m ON __m.a = pp.a AND __m.b = pp.b GROUP BY pp.word),
           |__e${i + 1} AS MATERIALIZED (SELECT __ee.word,
           |    ${mergeFold("__ee.syms", "__mm.a", "__mm.b")} AS syms
           |  FROM __e$i __ee LEFT JOIN __r$i __rr ON __rr.word = __ee.word
           |  LEFT JOIN __m __mm ON __mm.r = __rr.r)""".stripMargin
    }
    b.toString
  }
}

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

/** WordPiece-style greedy longest-match-first (MaxMatch) subword
  * tokenization (xt28) — the BERT-family INFERENCE algorithm (Devlin
  * et al. 2019; Song et al. EMNLP'21 "Fast WordPiece Tokenization"
  * describes exactly this forward-maximum-matching loop): at each
  * position take the LONGEST vocabulary piece that prefixes the rest
  * of the word; if no piece matches (or the word exceeds
  * `max_input_chars_per_word`), the WHOLE word becomes `[UNK]`.
  *
  * This is a genuinely different segmentation algorithm from the
  * merge-order BPE encode ([[Bpe.encodeSyms]]): over the SAME
  * vocabulary, greedy longest-match picks `ab|c` where merge ranks
  * `[(b,c)]` force `a|bc` (spec-gated). Real stacks mix the two the
  * same way — a BPE-trained vocabulary served by a WordPiece-style
  * greedy matcher — so the vocabulary here is [[Bpe.train]]'s output:
  * the single-codepoint alphabet of the bounded word histogram plus
  * the merge products. Declared adaptation: no `##` continuation-piece
  * distinction (one flat vocabulary; the greedy loop is otherwise the
  * published algorithm, and `[UNK]` semantics — whole-word, not
  * per-gap — follow BERT's tokenizer).
  *
  * Exactness: pieces are exact substrings and the per-step argmax is
  * by piece LENGTH alone (two same-length pieces matching at one
  * position are the same string), so segmentation is deterministic
  * and the oracle replays it with unrolled per-step CTEs
  * ([[WordPieceSql.maxMatchCtes]]) — two independent implementations
  * of the same loop, the xt24 discipline. `[UNK]` cannot collide with
  * a real piece: pieces are substrings of lowercased pre-tokens
  * (letter runs / digit runs / single symbols) and `[UNK]` contains
  * uppercase.
  *
  * 100 TB story: identical to xt24 — training is one
  * vocabulary-bounded shuffle + a `maxWords`-row TakeOrdered;
  * encoding is a narrow join-free per-row map (fused expression,
  * per-thread memo) with the vocabulary shipped as a plan literal
  * (KBs here; a production 30k-piece vocab is still broadcast-class).
  * Zero shuffle at any corpus size.
  */
object WordPiece {

  /** BERT's whole-word fallback token. */
  val Unk = "[UNK]"

  /** `max_input_chars_per_word`: words longer than this many
    * codepoints are `[UNK]` without matching (BERT ships 100; 24 keeps
    * the oracle's unrolled step chain short — each MaxMatch step
    * consumes ≥1 codepoint, so 24 steps always terminate).
    */
  val MaxWordLen = 24

  /** Vocabulary from a word histogram + trained merges: the
    * single-codepoint alphabet of the histogram words ∪ the merge
    * products, deduped, in codepoint order (deterministic — the
    * order itself is not load-bearing, membership is).
    */
  def vocab(hist: Seq[(String, Long)],
      merges: Seq[(String, String)]): Seq[String] = {
    val set = mutable.HashSet.empty[String]
    for ((w, _) <- hist) set ++= Bpe.codepointSymbols(w)
    for ((a, b) <- merges) set += (a + b)
    set.toSeq.sortWith((x, y) => Bpe.cpCompare(x, y) < 0)
  }

  /** Corpus-trained vocabulary: xt24's bounded histogram + BPE
    * training, then [[vocab]].
    */
  def vocabOn(docs: DataFrame, textCol: String, maxWords: Int = 256,
      numMerges: Int = 16): Seq[String] = {
    val hist = Bpe.wordHistogram(docs, textCol, maxWords)
    vocab(hist, Bpe.train(hist, numMerges))
  }

  /** Greedy forward maximum-match over one pre-token. Codepoint-
    * indexed throughout (the oracle's `SUBSTR`/`LENGTH` space).
    */
  def maxMatch(word: String, vset: java.util.HashSet[String],
      maxPieceLen: Int): Array[String] = {
    val cps = Bpe.codepointSymbols(word)
    if (cps.length > MaxWordLen) return Array(Unk)
    val out = new mutable.ArrayBuffer[String](4)
    var pos = 0
    while (pos < cps.length) {
      var len = math.min(maxPieceLen, cps.length - pos)
      var found: String = null
      while (len >= 1 && found == null) {
        val cand = {
          val sb = new java.lang.StringBuilder
          var i = pos
          while (i < pos + len) { sb.append(cps(i)); i += 1 }
          sb.toString
        }
        if (vset.contains(cand)) found = cand else len -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      pos += len
    }
    out.toArray
  }

  // ---- column API ----

  def wpCount(text: Column, vocab: Seq[String]): Column =
    Bridge.column(WpCount(Bridge.expression(text), vocab))

  def wpTokens(text: Column, vocab: Seq[String]): Column =
    Bridge.column(WpTokens(Bridge.expression(text), vocab))
}

/** Shared eval body: lowercase, xt3 pre-tokenize (the [[Bpe]] word
  * boundary contract), MaxMatch each word with a capped per-thread
  * memo.
  */
sealed trait WpExpr extends UnaryExpression with FusedUnary {
  def vocab: Seq[String]

  @transient protected lazy val vset = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient protected lazy val maxPieceLen =
    vocab.foldLeft(1)((m, v) => math.max(m, v.codePointCount(0, v.length)))
  @transient private lazy val memo =
    ThreadLocal.withInitial[java.util.HashMap[String, Array[String]]](
      () => new java.util.HashMap[String, Array[String]])

  protected def matchMemo(word: String): Array[String] = {
    val m = memo.get()
    var r = m.get(word)
    if (r == null) {
      r = WordPiece.maxMatch(word, vset, maxPieceLen)
      if (m.size >= 65536) m.clear()
      m.put(word, r)
    }
    r
  }

  protected def words(input: Any): mutable.ArrayBuffer[String] =
    Bpe.preTokens(input.asInstanceOf[UTF8String].toLowerCase.toString)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType}")
}

/** Total WordPiece token count of a document (`[UNK]` counts 1). */
case class WpCount(child: Expression, vocab: Seq[String])
    extends WpExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "wp_count"

  override def nullSafeEval(input: Any): Any = {
    val ws = words(input)
    var n = 0; var i = 0
    while (i < ws.length) { n += matchMemo(ws(i)).length; i += 1 }
    n
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Ordered WordPiece token sequence of a document. */
case class WpTokens(child: Expression, vocab: Seq[String])
    extends WpExpr {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wp_tokens"

  override def nullSafeEval(input: Any): Any = {
    val ws = words(input)
    val out = new mutable.ArrayBuffer[AnyRef]
    var i = 0
    while (i < ws.length) {
      val toks = matchMemo(ws(i))
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

/** DuckDB replay of [[WordPiece]]: vocabulary from [[BpeSql]]'s
  * training tables, MaxMatch as an unrolled per-step CTE chain (one
  * step per consumed piece; [[WordPiece.MaxWordLen]] steps always
  * terminate because each live step consumes ≥1 codepoint and longer
  * words are `[UNK]` at step 0).
  */
object WordPieceSql {

  /** Vocabulary CTE `__v(p, l)` — requires `__w0`/`__m` from
    * [[BpeSql.trainCtes]] in scope: alphabet codepoints of the
    * histogram words ∪ merge products.
    */
  val vocabCte: String =
    """__v AS MATERIALIZED (SELECT p, LENGTH(p) AS l FROM (
      |  SELECT DISTINCT p FROM (
      |    SELECT a || b AS p FROM __m
      |    UNION SELECT UNNEST(syms) AS p FROM __w0)))""".stripMargin

  /** MaxMatch CTEs over `wtab`(word): `__x0..__x<steps>`, then
    * `__wp(word, syms)` with the whole-word `[UNK]` fallback applied.
    * Per step: LEFT JOIN the live states against `__v` on
    * prefix-match, keep the longest piece (same-length matches at one
    * position are the same string — deterministic), advance `pos`;
    * a live position with NO match marks the word `[UNK]`.
    */
  def maxMatchCtes(wtab: String,
      steps: Int = WordPiece.MaxWordLen): String = {
    val b = new StringBuilder
    b ++=
      s"""__x0 AS MATERIALIZED (SELECT word, 1 AS pos,
         |  CAST([] AS VARCHAR[]) AS toks,
         |  LENGTH(word) > ${WordPiece.MaxWordLen} AS unk FROM $wtab)""".stripMargin
    for (i <- 0 until steps) {
      b ++=
        s""",
           |__x${i + 1} AS MATERIALIZED (SELECT word,
           |    CASE WHEN NOT unk AND pos <= LENGTH(word) AND p IS NOT NULL
           |      THEN pos + l ELSE pos END AS pos,
           |    CASE WHEN NOT unk AND pos <= LENGTH(word) AND p IS NOT NULL
           |      THEN toks || [p] ELSE toks END AS toks,
           |    unk OR (pos <= LENGTH(word) AND p IS NULL) AS unk
           |  FROM (SELECT s.word, s.pos, s.toks, s.unk, v.p, v.l,
           |      ROW_NUMBER() OVER (PARTITION BY s.word
           |        ORDER BY v.l DESC NULLS LAST) AS rn
           |    FROM __x$i s LEFT JOIN __v v
           |      ON NOT s.unk AND s.pos <= LENGTH(s.word)
           |        AND SUBSTR(s.word, s.pos, v.l) = v.p)
           |  WHERE rn = 1)""".stripMargin
    }
    b ++=
      s""",
         |__wp AS MATERIALIZED (SELECT word,
         |  CASE WHEN unk THEN ['${WordPiece.Unk}'] ELSE toks END AS syms
         |  FROM __x$steps)""".stripMargin
    b.toString
  }
}

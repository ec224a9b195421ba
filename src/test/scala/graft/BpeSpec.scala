package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Unit contract for the BPE tokenizer (xt24/xk11b): training
  * argmax + tie-breaks, multi-level merge composition, left-to-right
  * non-overlap, encode rank-min loop, and expression/driver parity.
  * The cross-engine guarantee (Scala vs DuckDB-unrolled training AND
  * encoding) is the xt24/xk11b hash gate; these tests pin the
  * algorithm itself to hand-computed cases.
  */
class BpeSpec extends SparkSpec {

  test("training learns multi-level merges with weighted counts") {
    val merges = Bpe.train(Seq("aaab" -> 10L, "ab" -> 5L), 8)
    // iter0: (a,a)=20 beats (a,b)=15; iter1: (a,b)=15 beats (aa,a)=10;
    // iter2: only (aa,ab)=10 remains; then no pairs -> early stop
    assert(merges == List(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("training tie-break is (count DESC, pair ASC)") {
    val merges = Bpe.train(Seq("ba" -> 1L, "ab" -> 1L), 1)
    assert(merges == List(("a", "b")))
  }

  test("merge applies left-to-right without overlap: aaaaa -> aa aa a") {
    val ranks = new Bpe.Ranks(Vector(("a", "a")))
    assert(Bpe.encodeWord("aaaaa", ranks).toSeq == Seq("aa", "aa", "a"))
    assert(Bpe.encodeWord("aaa", ranks).toSeq == Seq("aa", "a"))
  }

  test("encode follows rank order, composing merged symbols") {
    val ranks = new Bpe.Ranks(
      Vector(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aaab"))
    assert(Bpe.encodeWord("abab", ranks).toSeq == Seq("ab", "ab"))
    assert(Bpe.encodeWord("ba", ranks).toSeq == Seq("b", "a"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x"))
  }

  test("encode is hard-capped at K rounds on adversarial merge tables") {
    // (x,y)->xy then (xy,z) and (w,xy): rank 0 can be recreated? No —
    // build a genuinely pathological table where a later merge's
    // product re-exposes an earlier-rank pair: merges (a,b)->ab,
    // (c,a)->ca. On "cab": round1 fires rank0? pairs (c,a)=r1,(a,b)=r0
    // -> "c"+"ab"; (c,ab) unranked -> stop at 2 symbols. Now a table
    // where firing CAN cascade more than K times total is impossible
    // to build with K=1, so use a direct loop-count witness: a merge
    // table whose single rank matches repeatedly is fine (one pass
    // merges all occurrences), but a 2-rank table on a long alternating
    // string must terminate within 2 rounds regardless of length.
    val ranks = new Bpe.Ranks(Vector(("a", "b"), ("ab", "ab")))
    val word = "ab" * 64
    val out = Bpe.encodeWord(word, ranks)
    assert(out.toSeq == Seq.fill(32)("abab"))
    // adversarial: product of rank1 equals left constituent of rank0 —
    // rank0 could fire again after rank1 recreates "a". The K-cap (2
    // rounds here) guarantees termination in lockstep with the K
    // unrolled oracle CTEs rather than running extra JVM-only rounds.
    val adv = new Bpe.Ranks(Vector(("a", "b"), ("x", "y")))
    assert(Bpe.encodeWord("xyab", adv).toSeq == Seq("xy", "ab"))
  }

  test("\\x0B segments as whitespace in BOTH pre-tokenizers, and the " +
      "DuckDB literals are the JVM patterns verbatim") {
    // ADVICE r11 #1: the r10 fix pinned the whitespace class to
    // [ \t\n\x0B\f\r] because Java's \s includes U+000B and RE2's
    // does not; this is the regression witness. \x0B must act as a
    // SEPARATOR (never matched into a symbol run) under PreTokenRegex,
    // and as a WHITESPACE RUN under GptPreRegex.
    assert(Bpe.preTokens("ab").toSeq == Seq("a", "b"))
    assert(Bpe.preTokens("x..y").toSeq == Seq("x", ".", ".", "y"))
    assert(Bpe.preTokensGpt("ab").toSeq ==
      Seq("a", "", "b"))
    assert(Bpe.preTokensGpt("a \tb").toSeq ==
      Seq("a", " \t", "b"))
    // a regression to \s (or any one-sided edit) breaks these ties:
    // the oracle literals ARE the JVM patterns, single-quoted (with
    // DuckDB '' escaping), so the two engines cannot drift apart
    // without failing this spec (ADVICE r10 #1 / r11 #2).
    import graft.operators.BpeSql
    assert(BpeSql.ReLit == "'" + Bpe.PreTokenRegex + "'")
    assert(BpeSql.GptReLit ==
      "'" + Bpe.GptPreRegex.replace("'", "''") + "'")
  }

  test("numMerges threads the oracle's unrolled K through encode: " +
      "early-stopped training still runs K rounds") {
    // ADVICE r10: encodeSyms used to cap at merges.length; when
    // training terminates early (pair table dry) the oracle's encode
    // chain still runs K CTE steps, and on a merge table where a
    // later merge recreates an earlier-rank pair the extra rounds
    // are NOT no-ops. Witness: m0=(ab,cd), m1=(c,d) over symbols
    // [ab, cd, ab, c, d] — R1 fires r0, R2 fires r1 (recreating an
    // (ab,cd) adjacency), R3 fires r0 AGAIN. 3 rounds from a 2-entry
    // merge table: the K=2 cap stops one round short of the K=3
    // oracle.
    val merges = Vector(("ab", "cd"), ("c", "d"))
    val syms0 = Array("ab", "cd", "ab", "c", "d")
    val k2 = new Bpe.Ranks(merges) // numMerges defaults to 2
    assert(k2.numMerges == 2)
    assert(Bpe.encodeSyms(syms0, k2).toSeq == Seq("abcd", "ab", "cd"))
    val k3 = new Bpe.Ranks(merges, 3)
    assert(Bpe.encodeSyms(syms0, k3).toSeq == Seq("abcd", "abcd"))
    // training CAN terminate early: requesting 5 merges of a corpus
    // that exhausts after 1 returns a short list — the case where the
    // query sites' explicit numMerges keeps JVM and oracle in lockstep
    val trained = Bpe.train(Seq("ab" -> 1L), 5)
    assert(trained == List(("a", "b")))
    assert(new Bpe.Ranks(trained.toIndexedSeq, 5).numMerges == 5)
  }

  test("cpCompare orders astral codepoints like UTF-8 bytes, not " +
      "UTF-16 units") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji.compareTo("�") < 0)       // UTF-16 unit order
    assert(Bpe.cpCompare(emoji, "�") > 0)  // codepoint order
    assert(Bpe.cpCompare("a", "aa") < 0)
    assert(Bpe.cpCompare("aa", "aa") == 0)
  }

  test("bpeCount / bpeTokens expressions match the driver loop, " +
      "propagate null, and count empty as 0") {
    import spark.implicits._
    val merges = List(("t", "h"), ("th", "e"), ("1", "2"))
    val ranks = new Bpe.Ranks(merges.toIndexedSeq)
    val texts = Seq("The theme: 123 theses!", "  ", "", "the TH th",
      "no merges here at all xyz")
    val df = texts.toDF("text")
      .select(Bpe.bpeCount(col("text"), merges).as("n"),
        Bpe.bpeTokens(col("text"), merges).as("tk"))
      .collect()
    texts.zip(df).foreach { case (txt, row) =>
      val expected = Bpe.preTokens(txt.toLowerCase(java.util.Locale.ROOT))
        .flatMap(w => Bpe.encodeWord(w, ranks))
      assert(row.getInt(0) == expected.length, s"count for '$txt'")
      assert(row.getSeq[String](1) == expected.toSeq, s"tokens for '$txt'")
    }
    val nulls = Seq[String](null).toDF("text")
      .select(Bpe.bpeCount(col("text"), merges).as("n")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("expression plan is a narrow join-free map (no shuffle at any " +
      "corpus size)") {
    val docs = graft.queries.T.t(spark, sf0001, "documents")
    val plan = docs.select(Bpe.bpeCount(col("text"), List(("e", "s"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("byte map is the GPT-2 bytes_to_unicode bijection") {
    assert(Bpe.ByteChar.length == 256)
    assert(Bpe.ByteChar.distinct.length == 256)
    // printable bytes map to themselves
    assert(Bpe.ByteChar('A'.toInt) == "A")
    assert(Bpe.ByteChar(0xE9) == "é")
    // non-printables shift to 256+k in byte order: space (0x20, the
    // 33rd non-printable, k=32) -> U+0120 'Ġ' — the GPT-2 hallmark
    assert(Bpe.ByteChar(0) == "Ā")
    assert(Bpe.ByteChar(' '.toInt) == "Ġ")
    assert(Bpe.ByteChar(127) == "ġ")
    assert(Bpe.ByteChar(160) == "ł")
    assert(Bpe.ByteChar(173) == "Ń")
  }

  test("byteSymbols splits multi-byte UTF-8 into per-byte symbols") {
    // é = C3 A9 (both printable bytes: map to themselves)
    assert(Bpe.byteSymbols("é").toSeq == Seq("Ã", "©"))
    // 😀 U+1F600 = F0 9F 98 80: F0/9F printable-range? F0=240 yes,
    // 9F=159 -> non-printable (127..160, k=33+32=65 -> U+0141),
    // 98=152 -> k=33+25=58 -> U+013A, 80=128 -> k=34 -> U+0122
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.byteSymbols(emoji).toSeq ==
      Seq("ð", "Ł", "ĺ", "Ģ"))
    assert(Bpe.byteSymbols("ab ").toSeq == Seq("a", "b", "Ġ"))
  }

  test("GPT-2-style pre-tokenizer: leading space attaches, " +
      "contractions split, case preserved, whitespace runs kept") {
    assert(Bpe.preTokensGpt("I can't do 2 things").toSeq ==
      Seq("I", " can", "'t", " do", " 2", " things"))
    assert(Bpe.preTokensGpt("Hello,  World!").toSeq ==
      Seq("Hello", ",", "  ", "World", "!"))
    assert(Bpe.preTokensGpt("a\n\nb").toSeq == Seq("a", "\n\n", "b"))
    // lookahead-free variant: a whitespace run before a word is eaten
    // by ' ?\p{L}+' only when it is a SINGLE space; longer runs
    // tokenize whole (GPT-2 proper would donate the last space)
    assert(Bpe.preTokensGpt(" x").toSeq == Seq(" x"))
    assert(Bpe.preTokensGpt("  x").toSeq == Seq("  ", "x"))
  }

  test("byte-level expressions: multi-byte text tokenizes with no " +
      "OOV and matches the driver loop") {
    import spark.implicits._
    val texts = Seq("Café society", "I can't", "ééé",
      new String(Character.toChars(0x1F600)) + " hi")
    val hist = texts.map(t => (t, 1L))
      .flatMap { case (t, c) => Bpe.preTokensGpt(t).map((_, c)) }
      .groupBy(_._1).map { case (w, l) => (w, l.map(_._2).sum) }.toSeq
      .sortBy { case (w, c) => (-c, w) }
    val merges = Bpe.train(hist, 8, Bpe.byteSymbols _)
    assert(merges.nonEmpty)
    val ranks = new Bpe.Ranks(merges.toIndexedSeq)
    val rows = texts.toDF("text")
      .select(Bpe.bpeCountBytes(col("text"), merges).as("n"),
        Bpe.bpeTokensBytes(col("text"), merges).as("tk"))
      .collect()
    texts.zip(rows).foreach { case (txt, row) =>
      val expected = Bpe.preTokensGpt(txt)
        .flatMap(w => Bpe.encodeSyms(Bpe.byteSymbols(w), ranks))
      assert(row.getInt(0) == expected.length, s"count for '$txt'")
      assert(row.getSeq[String](1) == expected.toSeq, s"tokens '$txt'")
      // tokens concatenate back to the byte-mapped pre-token stream
      assert(row.getSeq[String](1).mkString ==
        Bpe.preTokensGpt(txt).flatMap(Bpe.byteSymbols(_)).mkString)
    }
  }

  test("trained encode on real corpus: count == tokens length and " +
      "tokens concatenate back to the pre-token stream") {
    val docs = graft.queries.T.t(spark, sf0001, "documents").limit(50)
    val merges = Bpe.trainOn(docs, "text", maxWords = 128, numMerges = 12)
    assert(merges.nonEmpty && merges.size <= 12)
    val rows = docs.where(col("text").isNotNull)
      .select(col("text"), Bpe.bpeCount(col("text"), merges).as("n"),
        Bpe.bpeTokens(col("text"), merges).as("tk"))
      .collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](2)
      assert(r.getInt(1) == toks.length)
      // merges only concatenate: joined tokens == joined pre-tokens
      val pre = Bpe.preTokens(
        r.getString(0).toLowerCase(java.util.Locale.ROOT))
      assert(toks.mkString == pre.mkString)
    }
  }

  // ---- WordPiece / MaxMatch (xt28) ----

  private def vs(pieces: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    pieces.foreach(s.add)
    s
  }

  test("wordpiece MaxMatch diverges from merge-order BPE on the " +
      "same vocabulary: greedy ab|c vs ranked a|bc") {
    import graft.operators.WordPiece
    // vocab {a,b,c,ab,bc}: greedy longest-match takes ab first
    assert(WordPiece.maxMatch("abc", vs("a", "b", "c", "ab", "bc"), 2)
      .toSeq == Seq("ab", "c"))
    // the SAME pieces as a rank table [(b,c)] merge the other way
    val ranks = new Bpe.Ranks(Vector(("b", "c")))
    assert(Bpe.encodeWord("abc", ranks).toSeq == Seq("a", "bc"))
  }

  test("wordpiece whole-word [UNK]: OOV character and over-length " +
      "words fall back as a unit, never partially") {
    import graft.operators.WordPiece
    // 'q' unseen: even though a and b match, the WHOLE word is UNK
    assert(WordPiece.maxMatch("aqb", vs("a", "b", "ab"), 2).toSeq ==
      Seq(WordPiece.Unk))
    // over max_input_chars_per_word: UNK without matching
    val long = "a" * (WordPiece.MaxWordLen + 1)
    assert(WordPiece.maxMatch(long, vs("a"), 1).toSeq ==
      Seq(WordPiece.Unk))
    // exactly at the cap still segments
    val atCap = "a" * WordPiece.MaxWordLen
    assert(WordPiece.maxMatch(atCap, vs("a"), 1).length ==
      WordPiece.MaxWordLen)
  }

  test("wordpiece vocabulary = histogram alphabet + merge products; " +
      "non-UNK segmentations concatenate back to the word") {
    import graft.operators.WordPiece
    val hist = Seq("aaab" -> 10L, "ab" -> 5L)
    val voc = WordPiece.vocab(hist, Bpe.train(hist, 8))
    assert(voc.toSet == Set("a", "b", "aa", "ab", "aaab"))
    val set = vs(voc: _*)
    for (w <- Seq("aaab", "ab", "ba", "aabab", "aaaa")) {
      val toks = WordPiece.maxMatch(w, set, 4)
      assert(toks.mkString == w, s"round-trip for '$w': $toks")
    }
    // greedy is longest-first: aaab whole, aab -> aa|b
    assert(WordPiece.maxMatch("aaab", set, 4).toSeq == Seq("aaab"))
    assert(WordPiece.maxMatch("aab", set, 4).toSeq == Seq("aa", "b"))
  }

  test("wordpiece expressions: count == tokens length, driver parity " +
      "on the real corpus incl. null text") {
    import graft.operators.WordPiece
    val docs = graft.queries.T.t(spark, sf0001, "documents").limit(50)
    val voc = WordPiece.vocabOn(docs, "text", maxWords = 128,
      numMerges = 12)
    val set = vs(voc: _*)
    val maxLen = voc.map(v => v.codePointCount(0, v.length)).max
    val rows = docs
      .select(col("text"), WordPiece.wpCount(col("text"), voc).as("n"),
        WordPiece.wpTokens(col("text"), voc).as("tk"))
      .collect()
    var sawUnkOrMulti = false
    rows.foreach { r =>
      if (r.isNullAt(0)) {
        assert(r.isNullAt(1) && r.isNullAt(2))
      } else {
        val toks = r.getSeq[String](2)
        assert(r.getInt(1) == toks.length)
        val expected = Bpe.preTokens(
            r.getString(0).toLowerCase(java.util.Locale.ROOT))
          .flatMap(w => WordPiece.maxMatch(w, set, maxLen))
        assert(toks == expected.toSeq)
        if (toks.exists(t => t == WordPiece.Unk || t.length > 1))
          sawUnkOrMulti = true
      }
    }
    assert(sawUnkOrMulti, "corpus never exercised a multi-cp piece")
  }
}

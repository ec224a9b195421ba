package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Scale
import T._

/** Skew-technique entries: the salted/two-phase plans must reproduce
  * the direct aggregation bit-for-bit (the oracle computes the direct
  * form) — proving the skew mitigation changes only the shuffle shape,
  * never the answer. events.user_id is the hot-key column in this
  * testdata (~67 events per user per SF step).
  */
object ScaleQueries {

  /** xt2's "en" stopword list — xk10 reuses the same quality lexicon
    * so a formula change lands in both entries at once.
    */
  private val stopwordList = TextAnalysisQueries.stopwords(1)._2

  val all: Seq[Q] = Seq(
    Q("xk1_salted_sum",
      s"""SELECT event_type, ${dsumSql("value")} AS s
         |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin) { (s, d) =>
      Scale.saltedDecimalSum(t(s, d, "events"), Seq("event_type"),
          "value", "s")
        .orderBy("event_type")
    },

    Q("xk2_skewsafe_distinct",
      """SELECT event_type, COUNT(DISTINCT user_id) AS du
        |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin) { (s, d) =>
      Scale.skewSafeCountDistinct(t(s, d, "events"), Seq("event_type"),
          "user_id", "du")
        .orderBy("event_type")
    },

    // Deterministic train/val/test split + stable sample: bucket =
    // value of the first two md5 hex chars of the doc id — identical
    // in any engine, so membership survives reruns/re-partitioning
    // (the property rand()-sampling lacks). Oracle replays the nibble
    // math with STRPOS.
    Q("xk3_hash_split",
      """WITH b AS (
        |  SELECT doc_id,
        |    (STRPOS('0123456789abcdef',
        |            SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |    + STRPOS('0123456789abcdef',
        |             SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
        |      AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 205 THEN 'train'
        |            WHEN bucket < 230 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS idsum
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Scale.splitLabel(col("doc_id").cast("string")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("idsum"))
        .orderBy("split")
    },

    // Stratified sample: exactly 20 docs per language, membership
    // decided by md5-of-id order (stable across engines/reruns/
    // partitionings — rand() sampling has none of those). One shuffle
    // on the stratum key; oracle replays the same window.
    Q("xk4_stratified_sample",
      """SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (
        |    PARTITION BY lang
        |    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin) { (s, d) =>
      Scale.stratifiedSample(t(s, d, "documents"), Seq("lang"),
          col("doc_id"), 20)
        .select(col("lang"), col("doc_id"), col("rn").cast("int").as("rn"))
        .orderBy("lang", "rn")
    },

    // Fixed-size global sample (deterministic reservoir): the 100
    // smallest docs in md5-of-id order. Plans as TakeOrderedAndProject
    // — per-partition top-k, k-row driver merge, no global sort.
    Q("xk5_reservoir_sample", reservoirOracleSql) { (s, d) =>
      Scale.fixedSample(t(s, d, "documents"), col("doc_id"), 100)
        .select("doc_id", "lang")
    },

    // Token-budget shard packing (pack docs into ~4096-token training
    // shards in doc_id order): the oracle is the NAIVE partition-less
    // running sum — the scale-safe two-level scan in Scale.packShards
    // must land every doc in the identical shard. Per-shard rollup
    // keeps the gate row count at n_tokens/4096.
    Q("xk6_pack_shards",
      """WITH d AS (
        |  SELECT doc_id, LEN(LIST_FILTER(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> ''))
        |    AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS c0
        |  FROM d
        |)
        |SELECT CAST(c0 // 4096 AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          size(graft.functions.TextFns.tokens(col("text"))).as("n_tok"))
      Scale.packShards(docs, "doc_id", "n_tok", budget = 4096)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard")
    },

    // Mixture resampling to a TARGET language distribution (uniform
    // token share here — the Pile/ROOTS reweighting op): per-lang
    // factor = total_tokens / (n_langs · lang_tokens), per-doc repeat
    // count = floor(factor) + a deterministic md5 fractional draw
    // (16-bit bucket vs floor(frac·65536) — engine-independent, unlike
    // rand()). Scale shape: two tiny aggs broadcast back, then a pure
    // narrow map — the corpus never shuffles except the final per-lang
    // rollup. The factor arithmetic is integer-derived double division,
    // so both engines compute bit-identical factors and draws.
    Q("xk7_mixture_resample",
      s"""WITH d AS (
         |  SELECT doc_id, lang, LEN(LIST_FILTER(
         |    STRING_SPLIT_REGEX(LOWER(text), '\\s+'), t -> t <> ''))
         |    AS n_tok
         |  FROM documents
         |), bl AS (
         |  SELECT lang, SUM(n_tok) AS tokl FROM d GROUP BY lang
         |), t AS (
         |  SELECT COUNT(*) AS nl, SUM(tokl) AS tot FROM bl
         |), f AS (
         |  SELECT lang, CAST(tot AS DOUBLE) / (nl * tokl) AS factor
         |  FROM bl CROSS JOIN t
         |), r AS (
         |  SELECT d.doc_id, d.lang, d.n_tok, f.factor,
         |    CAST(FLOOR(f.factor) AS BIGINT) +
         |    CASE WHEN ${hb16Sql("CAST(doc_id AS VARCHAR)")} <
         |      CAST(FLOOR((f.factor - FLOOR(f.factor)) * 65536) AS INT)
         |    THEN 1 ELSE 0 END AS reps
         |  FROM d JOIN f USING (lang)
         |)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT)
         |    AS tok,
         |  ${r4Sql("MAX(factor)")} AS factor,
         |  CAST(SUM(reps) AS BIGINT) AS reps_docs,
         |  CAST(SUM(reps * n_tok) AS BIGINT) AS reps_tok
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.{DoubleType, IntegerType,
        LongType, StringType}
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).as("n_tok"))
      val byLang = docs.groupBy("lang").agg(sum("n_tok").as("tokl"))
      val tot = byLang.agg(count(lit(1)).as("nl"), sum("tokl").as("tot"))
      val f = byLang.crossJoin(broadcast(tot))
        .select(col("lang"), (col("tot").cast(DoubleType) /
          (col("nl") * col("tokl"))).as("factor"))
      val cut = floor((col("factor") - floor(col("factor"))) * 65536)
        .cast(IntegerType)
      val r = docs.join(broadcast(f), "lang")
        .withColumn("reps", floor(col("factor")).cast(LongType) +
          when(Scale.hashBucket16(col("doc_id").cast(StringType)) < cut,
            1L).otherwise(0L))
      r.groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("tok"), r4(max(col("factor"))).as("factor"),
        sum("reps").as("reps_docs"),
        sum(col("reps") * col("n_tok")).as("reps_tok"))
        .orderBy("lang")
    },

    // xk15: TEMPERATURE-based mixture resampling (the mT5/UniMax
    // multilingual reweighting): target language share ∝ W_l^α with
    // α = 0.5 — between proportional (α=1, no resampling) and xk7's
    // uniform target (α=0), so low-resource languages are boosted
    // WITHOUT the flat-target distortion that lets a tiny language
    // dominate repeats. α=0.5 makes the exponent a SQRT, the one
    // "transcendental" that is IEEE-correctly-rounded — so unlike an
    // exp(α·ln W) formulation the target shares carry zero
    // cross-engine risk (per-lang √W quantizes by the house
    // FLOOR(x·1e12+0.5) BIGINT idiom — not a double→DECIMAL cast,
    // whose tie rounding is engine-specific — for the order-free
    // exact-integer denominator sum). factor_l =
    // (√W_l / Σ√W) · W / W_l; per-doc repeats reuse xk7's exact
    // 16-bit md5 fractional draw. Same scale shape as xk7: two tiny
    // aggs broadcast back + a narrow map; the corpus shuffles only on
    // the final rollup.
    Q("xk15_temperature_resample",
      s"""WITH d AS (
         |  SELECT doc_id, lang, LEN(LIST_FILTER(
         |    STRING_SPLIT_REGEX(LOWER(text), '\\s+'), t -> t <> ''))
         |    AS n_tok
         |  FROM documents
         |), bl AS (
         |  SELECT lang, SUM(n_tok) AS tokl,
         |    CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS DOUBLE)) * 1.0e12
         |      + 0.5) AS BIGINT) AS sq
         |  FROM d GROUP BY lang
         |), t AS (
         |  SELECT SUM(tokl) AS tot, SUM(CAST(sq AS HUGEINT)) AS ssq
         |  FROM bl
         |), f AS (
         |  SELECT lang,
         |    CAST(sq AS DOUBLE) / CAST(ssq AS DOUBLE)
         |      * CAST(tot AS DOUBLE) / tokl AS factor,
         |    CAST(sq AS DOUBLE) / CAST(ssq AS DOUBLE) AS share
         |  FROM bl CROSS JOIN t
         |), r AS (
         |  SELECT d.doc_id, d.lang, d.n_tok, f.factor, f.share,
         |    CAST(FLOOR(f.factor) AS BIGINT) +
         |    CASE WHEN ${hb16Sql("CAST(doc_id AS VARCHAR)")} <
         |      CAST(FLOOR((f.factor - FLOOR(f.factor)) * 65536) AS INT)
         |    THEN 1 ELSE 0 END AS reps
         |  FROM d JOIN f USING (lang)
         |)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT)
         |    AS tok,
         |  ${r4Sql("MAX(factor)")} AS factor,
         |  ${r4Sql("MAX(share)")} AS tgt_share,
         |  CAST(SUM(reps) AS BIGINT) AS reps_docs,
         |  CAST(SUM(reps * n_tok) AS BIGINT) AS reps_tok
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.{DecimalType, DoubleType,
        IntegerType, LongType, StringType}
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).as("n_tok"))
      // √W quantized by the house FLOOR(x·1e12 + 0.5) BIGINT idiom —
      // a raw double→DECIMAL cast rounds ties via BigDecimal.valueOf
      // (shortest decimal string, HALF_UP) in Spark but scaled-binary
      // in DuckDB, an engine-specific last-digit hazard; FLOOR of the
      // identical IEEE product is the same integer in both. Fits Long
      // up to √W ≤ 9.2e6 tokens² (W ≤ 8.5e13 — beyond 100 TB of text);
      // the Σ√W accumulates in DECIMAL(38,0) (HUGEINT in the oracle).
      val byLang = docs.groupBy("lang").agg(sum("n_tok").as("tokl"),
        floor(sqrt(sum("n_tok").cast(DoubleType)) * lit(1.0e12)
          + lit(0.5)).as("sq"))
      val tot = byLang.agg(sum("tokl").as("tot"),
        sum(col("sq").cast(DecimalType(38, 0))).as("ssq"))
      val f = byLang.crossJoin(broadcast(tot))
        .select(col("lang"),
          (col("sq").cast(DoubleType) / col("ssq").cast(DoubleType)
            * col("tot").cast(DoubleType) / col("tokl")).as("factor"),
          (col("sq").cast(DoubleType) / col("ssq").cast(DoubleType))
            .as("share"))
      val cut = floor((col("factor") - floor(col("factor"))) * 65536)
        .cast(IntegerType)
      val r = docs.join(broadcast(f), "lang")
        .withColumn("reps", floor(col("factor")).cast(LongType) +
          when(Scale.hashBucket16(col("doc_id").cast(StringType)) < cut,
            1L).otherwise(0L))
      r.groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("tok"), r4(max(col("factor"))).as("factor"),
        r4(max(col("share"))).as("tgt_share"),
        sum("reps").as("reps_docs"),
        sum(col("reps") * col("n_tok")).as("reps_tok"))
        .orderBy("lang")
    },

    // PPS systematic sampling (draw k=100 docs with probability ∝
    // token count): corpus on a [0, W) token axis in md5-of-id order,
    // k evenly spaced points, one draw per point inside each doc's
    // interval — Σ sel_count == k exactly. The oracle replays with the
    // NAIVE partition-less window; the engine's two-level prefix sum
    // must land every interval boundary identically (the xk6 contract,
    // reused), and the ceil-division point counts are exact integer
    // arithmetic in both engines (HUGEINT / DECIMAL(38,0)).
    Q("xk8_pps_sample",
      """WITH d AS (
        |  SELECT doc_id, LEN(LIST_FILTER(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> ''))
        |    AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    SUM(n_tok) OVER (ORDER BY MD5(CAST(doc_id AS VARCHAR)),
        |      doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |), w AS (SELECT SUM(n_tok) AS tw FROM d),
        |s AS (
        |  SELECT doc_id, n_tok,
        |    CAST(((CAST(cum AS HUGEINT) * 100 + tw - 1) // tw)
        |      - ((CAST(cum - n_tok AS HUGEINT) * 100 + tw - 1) // tw)
        |      AS BIGINT) AS sel_count
        |  FROM c, w
        |)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, sel_count
        |FROM s WHERE sel_count >= 1 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text")))
          .cast("long").as("n_tok"))
      Scale.ppsSample(docs, "doc_id", "n_tok", k = 100)
        .select("doc_id", "n_tok", "sel_count")
        .orderBy("doc_id")
    },

    // Weighted-fair source interleaving (training-order mixing): per-
    // source md5-rank, WFQ virtual time v = rn/w (one IEEE double
    // division — identical in both engines), global position by the
    // distributed prefix sum where the oracle replays the naive
    // partition-less ROW_NUMBER. Every output prefix carries each
    // source ~proportionally (spec-gated).
    Q("xk9_interleave",
      """WITH r AS (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (
        |    PARTITION BY source
        |    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |), w AS (SELECT source, COUNT(*) AS nw FROM documents GROUP BY 1)
        |SELECT doc_id, source, CAST(ROW_NUMBER() OVER (
        |    ORDER BY CAST(rn AS DOUBLE) / nw, source, doc_id)
        |  AS BIGINT) AS pos
        |FROM r JOIN w USING (source)
        |ORDER BY pos""".stripMargin) { (s, d) =>
      Scale.interleaveBySource(
          t(s, d, "documents").select("doc_id", "source"),
          "doc_id", "source")
        .select("doc_id", "source", "pos")
        .orderBy("pos")
    },

    // Per-domain cap (RefinedWeb "at most k docs per domain"): keep
    // the 15 best docs per source by the xt2 quality score (r4-rounded
    // BEFORE ordering so the sort key is cross-engine identical),
    // ties to the smaller doc_id.
    Q("xk10_domain_cap",
      s"""WITH q0 AS (
        |  SELECT doc_id, source,
        |    CAST(LEN(fw) AS INT) AS n_tok,
        |    ${TextAnalysisQueries.hitsSql(stopwordList)} AS sw,
        |    LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]')) AS al,
        |    text
        |  FROM (SELECT doc_id, source, text,
        |          LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'),
        |                      t -> t <> '') AS fw
        |        FROM documents)
        |), q1 AS (
        |  SELECT doc_id, source, ${r4Sql(
             """0.4 * (CASE WHEN n_tok = 0 THEN 0.0
               |              ELSE CAST(sw AS DOUBLE) / n_tok END)
               |  + 0.3 * (CAST(al AS DOUBLE) / LENGTH(text))
               |  + 0.3 * LEAST(CAST(n_tok AS DOUBLE) / 100.0, 1.0)""")} AS q
        |  FROM q0
        |)
        |SELECT source, doc_id, q FROM (
        |  SELECT source, doc_id, q, ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY q DESC, doc_id) AS rn
        |  FROM q1)
        |WHERE rn <= 15 ORDER BY source, q DESC, doc_id""".stripMargin) {
      (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val toks = graft.functions.TextFns.tokens(col("text"))
      val scored = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          size(toks).as("n_tok"),
          TextAnalysisQueries.hits(toks, stopwordList)
            .as("sw"),
          size(regexp_extract_all(lower(col("text")), lit("[a-z]"),
            lit(0))).as("al"))
        .select(col("doc_id"), col("source"),
          r4(
            lit(0.4) * when(col("n_tok") === 0, 0.0)
              .otherwise(col("sw").cast(DoubleType) / col("n_tok")) +
            lit(0.3) * (col("al").cast(DoubleType) / length(col("text"))) +
            lit(0.3) * least(col("n_tok").cast(DoubleType) / 100.0,
              lit(1.0))
          ).as("q"))
      Scale.groupCap(scored, Seq("source"),
          Seq(col("q").desc, col("doc_id").asc), k = 15)
        .select("source", "doc_id", "q")
        .orderBy(col("source"), col("q").desc, col("doc_id"))
    },

    // Fixed-length causal-LM sample packing (the GPT pretraining prep
    // shape): the whole corpus token stream, concatenated in doc_id
    // order, cut into consecutive 64-token samples — docs SPLIT across
    // sample boundaries (xk6 keeps docs whole in shards; xt5 windows
    // within one doc). Spark runs the two-level distributed prefix
    // sum + a narrow piece explode (Scale.packSequences); the oracle
    // replays with the naive partition-less window — the same
    // safe==naive contract xk6 proves. Every sample except the global
    // last reassembles to exactly 64 tokens; text pieces string_agg
    // in doc_id order in both engines.
    Q("xk11_pack_sequences",
      """WITH tw AS (
        |  SELECT doc_id, fw, LEN(fw) AS w FROM (
        |    SELECT doc_id, LIST_FILTER(
        |      STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> '') AS fw
        |    FROM documents)
        |  WHERE LEN(fw) > 0
        |), cum AS (
        |  SELECT doc_id, fw, w,
        |    SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM tw
        |), pieces AS (
        |  SELECT doc_id, fw, s.sample,
        |    GREATEST(s.sample * 64 - (ct - w), 0) + 1 AS frm,
        |    LEAST((s.sample + 1) * 64, ct)
        |      - GREATEST(s.sample * 64, ct - w) AS len
        |  FROM cum, LATERAL UNNEST(RANGE(
        |    CAST((ct - w) // 64 AS BIGINT),
        |    CAST((ct - 1) // 64 + 1 AS BIGINT))) s(sample)
        |)
        |SELECT CAST(sample AS BIGINT) AS sample,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len) AS BIGINT) AS n_tok,
        |  STRING_AGG(ARRAY_TO_STRING(
        |    fw[CAST(frm AS INT) : CAST(frm + len - 1 AS INT)], ' '),
        |    ' ' ORDER BY doc_id) AS text
        |FROM pieces GROUP BY sample ORDER BY sample""".stripMargin) {
      (s, d) =>
      val tok = t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.TextFns.tokens(col("text")).as("fw"))
        .withColumn("w", size(col("fw")).cast("long"))
      val pieces = Scale.packSequences(tok, "doc_id", "w", seqLen = 64)
        .select(col("sample"), col("doc_id"),
          array_join(slice(col("fw"), col("piece_from").cast("int"),
            col("piece_len").cast("int")), " ").as("piece"),
          col("piece_len"))
      pieces.groupBy("sample")
        .agg(count(lit(1)).as("n_docs"),
          sum("piece_len").as("n_tok"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("piece")))),
            x => x.getField("piece")), " ").as("text"))
        .orderBy("sample")
    },

    // xk11 on REAL tokenizer output (VERDICT r8 #1 "wire real token
    // counts into packing"): identical fixed-length packing, but the
    // per-doc token stream is the corpus-trained BPE segmentation
    // (graft.operators.Bpe) instead of whitespace words — the counts
    // a trainer's data loader would actually see. Same two-level
    // prefix-sum plan; the oracle replays BPE training + encoding
    // with unrolled CTEs and then the xk11 packing SQL verbatim.
    Q("xk11b_pack_sequences_bpe",
      s"""WITH ${graft.operators.BpeSql.trainCtes("documents", 256, 16)},
        |__dtok AS (SELECT doc_id, __t.i AS wpos, ws[__t.i] AS word FROM (
        |    SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text),
        |      ${graft.operators.BpeSql.ReLit}) AS ws
        |    FROM documents WHERE text IS NOT NULL),
        |  LATERAL UNNEST(RANGE(1, LEN(ws)+1)) __t(i)),
        |__dwords AS (SELECT DISTINCT word FROM __dtok),
        |${graft.operators.BpeSql.encodeCtes("__dwords", 16)},
        |__flat AS (SELECT dd.doc_id, dd.wpos, __t.i AS ti,
        |    ee.syms[__t.i] AS tok
        |  FROM __dtok dd JOIN __e16 ee ON ee.word = dd.word,
        |  LATERAL UNNEST(RANGE(1, LEN(ee.syms)+1)) __t(i)),
        |tw AS (
        |  SELECT doc_id, LIST(tok ORDER BY wpos, ti) AS fw,
        |    COUNT(*) AS w
        |  FROM __flat GROUP BY doc_id
        |), cum AS (
        |  SELECT doc_id, fw, w,
        |    SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM tw
        |), pieces AS (
        |  SELECT doc_id, fw, s.sample,
        |    GREATEST(s.sample * 64 - (ct - w), 0) + 1 AS frm,
        |    LEAST((s.sample + 1) * 64, ct)
        |      - GREATEST(s.sample * 64, ct - w) AS len
        |  FROM cum, LATERAL UNNEST(RANGE(
        |    CAST((ct - w) // 64 AS BIGINT),
        |    CAST((ct - 1) // 64 + 1 AS BIGINT))) s(sample)
        |)
        |SELECT CAST(sample AS BIGINT) AS sample,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len) AS BIGINT) AS n_tok,
        |  STRING_AGG(ARRAY_TO_STRING(
        |    fw[CAST(frm AS INT) : CAST(frm + len - 1 AS INT)], ' '),
        |    ' ' ORDER BY doc_id) AS text
        |FROM pieces GROUP BY sample ORDER BY sample""".stripMargin) {
      (s, d) =>
      val docs = t(s, d, "documents")
      val merges = graft.operators.Bpe.trainOn(docs, "text",
        maxWords = 256, numMerges = 16)
      val tok = docs
        .select(col("doc_id"),
          graft.operators.Bpe.bpeTokens(col("text"), merges,
            numMerges = 16).as("fw"))
        .where(size(col("fw")) > 0)
        .withColumn("w", size(col("fw")).cast("long"))
      val pieces = Scale.packSequences(tok, "doc_id", "w", seqLen = 64)
        .select(col("sample"), col("doc_id"),
          array_join(slice(col("fw"), col("piece_from").cast("int"),
            col("piece_len").cast("int")), " ").as("piece"),
          col("piece_len"))
      pieces.groupBy("sample")
        .agg(count(lit(1)).as("n_docs"),
          sum("piece_len").as("n_tok"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("piece")))),
            x => x.getField("piece")), " ").as("text"))
        .orderBy("sample")
    },

    // Exact heavy hitters (φ = 1/1000 of the token stream) via the
    // two-pass Misra-Gries plan: pass 1 shuffles ONE ≤4096-counter
    // summary per partition (never the item domain — a naive
    // groupBy-count shuffles the full vocabulary, which for n-gram
    // domains at 100 TB is corpus-sized); pass 2 recounts only the
    // broadcast candidates exactly. capacity+1 > 1/φ makes the
    // thresholded output EXACT on any partitioning (MG no-miss
    // guarantee, proven on a Zipf stream in OperatorsSpec); the
    // oracle computes the direct count-everything form.
    Q("xk12_heavy_hitters",
      """WITH tok AS (
        |  SELECT LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
        |                     t -> t <> '') AS fw
        |  FROM documents
        |), w AS (SELECT UNNEST(fw) AS g FROM tok),
        |tot AS (SELECT COUNT(*) AS total FROM w),
        |c AS (SELECT g, COUNT(*) AS n FROM w GROUP BY 1)
        |SELECT g, n FROM c CROSS JOIN tot WHERE n * 1000 >= total
        |ORDER BY n DESC, g""".stripMargin) { (s, d) =>
      val words = t(s, d, "documents").select(
        explode(graft.functions.TextFns.tokens(col("text"))).as("g"))
      graft.operators.Sketches.heavyHitters(words, "g",
        denom = 1000L, capacity = 4096)
    },

    // Exact grouped percentiles THROUGH a mergeable quantile sketch
    // (xk13) — the xk12 two-pass pattern applied to quantiles, giving
    // q32/q40 a 100 TB path that never full-sorts: pass 1 aggregates
    // one <=512-mark rank-bounded summary per group (marks cross the
    // shuffle, never the group's rows); the summary's explicit
    // [rmin,rmax] bounds give a GUARANTEED bracket around each target
    // order statistic; pass 2 recounts below the bracket and
    // rank-orders only the ~4n/s in-bracket candidates. Output is
    // EXACT — the oracle is q32's full-sort QUANTILE_CONT replay, and
    // sketch degradation can only widen brackets (more candidate
    // work), never change a value.
    Q("xk13_quantile_sketch",
      """SELECT l_returnflag,
        |ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
        |ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90,
        |ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      quantileWide(graft.operators.Quantiles.exactQuantiles(
        t(s, d, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5, 0.9, 0.99), s = 512))
    },

    // Domain cap keyed on the CANONICAL host (xk14) — xk10's
    // RefinedWeb cap run the way a real crawl runs it: the xt21 URL
    // front-end first (raw crawl URLs scatter one site across WWW./
    // case/port variants — capping on the raw string under-caps),
    // then at most 10 docs per canonical host (smallest doc_id), each
    // kept row carrying the per-host rollup (docs + chars on the FULL
    // host, pre-cap). One shuffle on the host for the window+rollup;
    // the URL work is the xt21 narrow map.
    Q("xk14_host_cap",
      s"""WITH u AS (
         |  SELECT doc_id, n_chars,
         |    ${graft.operators.Urls.syntheticUrlSql("doc_id", "source")}
         |      AS url
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, n_chars,
         |    ${graft.operators.Urls.canonicalHostSql("url")} AS host
         |  FROM u
         |), r AS (
         |  SELECT host, doc_id, n_chars,
         |    COUNT(*) OVER (PARTITION BY host) AS host_docs,
         |    SUM(n_chars) OVER (PARTITION BY host) AS host_chars,
         |    ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rn
         |  FROM h
         |)
         |SELECT host, doc_id, CAST(host_docs AS BIGINT) AS host_docs,
         |  CAST(host_chars AS BIGINT) AS host_chars
         |FROM r WHERE rn <= 10 ORDER BY host, doc_id""".stripMargin) {
      (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.operators.{Scale, Urls}
      val w = Window.partitionBy("host")
      val hosts = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          Urls.canonicalHost(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("host"))
        .withColumn("host_docs", count(lit(1)).over(w))
        .withColumn("host_chars", sum("n_chars").over(w))
      Scale.groupCap(hosts, Seq("host"), Seq(col("doc_id").asc), k = 10)
        .select("host", "doc_id", "host_docs", "host_chars")
        .orderBy("host", "doc_id")
    },

    // xk16: deterministic HyperLogLog distinct estimate, HASH-GATED —
    // unlike approx_count_distinct's opaque binary sketch (q10b,
    // rows-only), every register and the estimator arithmetic are
    // SQL-replayable: md5-prefix hash, rho from LENGTH(BIN(rem)) (no
    // FP log), MAX-merged registers, the harmonic denominator as an
    // EXACT scaled-integer sum of powers of two (a raw double Σ2^-Mj
    // spans 41 binary orders and is add-order-dependent), one pinned
    // IEEE estimator with the linear-counting branch. n_exact rides
    // along so the sketch error is visible, not hidden. See
    // Sketches.hllDistinct for the mergeable-summary scale shape.
    Q("xk16_hll_distinct", hllOracleSql(withExact = true)) { (s, d) =>
      val docs = t(s, d, "documents")
      val exact = docs.groupBy(col("source").as("g"))
        .agg(countDistinct(col("text")).as("n_exact"))
      graft.operators.Sketches.hllDistinct(docs, "source", col("text"))
        .join(exact, "g")
        .select(col("g").as("source"), col("v_zero"), col("s_sum"),
          col("est"), col("n_exact"))
        .orderBy("source")
    }
  )

  /** Pivot the (group, qidx, p, q) long output of the exact-quantile
    * pass to q32's wide (l_returnflag, p50, p90, p99) shape — shared
    * by xk13 and its qs15 stream face.
    */
  def quantileWide(long: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    long.groupBy("l_returnflag")
      .agg(max(when(col("qidx") === 0, col("q"))).as("p50"),
        max(when(col("qidx") === 1, col("q"))).as("p90"),
        max(when(col("qidx") === 2, col("q"))).as("p99"))
      .orderBy("l_returnflag")

  /** 16-bit md5 bucket in DuckDB SQL — the 4-nibble STRPOS expansion
    * of [[Scale.hashBucket16]] (DuckDB has no base-conversion
    * builtin; the 2-nibble form of this pattern is xk3's oracle).
    */
  private def hb16Sql(x: String): String = {
    def nib(i: Int) =
      s"(STRPOS('0123456789abcdef', SUBSTR(MD5($x), $i, 1)) - 1)"
    s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
  }

  /** The xk5 fixed-sample replay — k smallest (md5(doc_id), doc_id)
    * rows. Shared verbatim by the qs22 stream face (the sample of a
    * row set is independent of how the set arrived).
    */
  def reservoirOracleSql: String =
    """SELECT doc_id, lang FROM documents
      |ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
      |LIMIT 100""".stripMargin

  /** The xk16 HLL replay — registers, exact-integer harmonic sums,
    * the pinned estimator with its LC branch — optionally with the
    * exact-distinct rider column. Shared verbatim by the qs21 stream
    * face WITHOUT the rider (exact streaming distinct would carry the
    * whole value set — the sketch is the point), the
    * contracts-cannot-drift discipline.
    */
  def hllOracleSql(withExact: Boolean): String = {
    val exCte = if (withExact)
      """, ex AS (
        |  SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT)
        |    AS n_exact
        |  FROM documents GROUP BY source
        |)""".stripMargin
    else ""
    val exCol = if (withExact) ",\n  n_exact" else ""
    val exJoin = if (withExact) " JOIN ex USING (source)" else ""
    s"""WITH h AS (
       |  SELECT source, ${hex48Sql("text")} AS h FROM documents
       |), reg AS (
       |  SELECT source, h // 1099511627776 AS j,
       |    h % 1099511627776 AS rem
       |  FROM h
       |), rho AS (
       |  SELECT source, j, CASE WHEN rem = 0 THEN 41
       |    ELSE 41 - LENGTH(BIN(rem)) END AS rho
       |  FROM reg
       |), regs AS (
       |  SELECT source, j, MAX(rho) AS mj FROM rho GROUP BY source, j
       |), st AS (
       |  SELECT source, CAST(256 - COUNT(*) AS BIGINT) AS v_zero,
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST(41 - mj AS INT))
       |      + (256 - COUNT(*)) * 2199023255552 AS BIGINT) AS s_sum
       |  FROM regs GROUP BY source
       |)$exCte
       |SELECT st.source, v_zero, s_sum,
       |  CAST(FLOOR(CASE WHEN
       |      (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE)
       |        / 256.0) * 65536.0 * 2199023255552.0)
       |        / CAST(s_sum AS DOUBLE) <= 640.0 AND v_zero > 0
       |    THEN 256.0 * LN(256.0 / CAST(v_zero AS DOUBLE))
       |    ELSE (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE)
       |        / 256.0) * 65536.0 * 2199023255552.0)
       |        / CAST(s_sum AS DOUBLE) END + 0.5) AS BIGINT) AS est$exCol
       |FROM st$exJoin ORDER BY source""".stripMargin
  }

  /** 48-bit md5-prefix integer in DuckDB SQL (12 nibbles) — the Spark
    * side's `conv(substring(md5(x), 1, 12), 16, 10)` (xk16's HLL
    * hash; the DedupQueries gear44Sql fold at one more nibble).
    */
  private def hex48Sql(x: String): String = {
    def nib(i: Int) =
      s"(STRPOS('0123456789abcdef', SUBSTR(MD5($x), $i, 1)) - 1)"
    (2 to 12).foldLeft(s"CAST(${nib(1)} AS BIGINT)")((acc, i) =>
      s"($acc * 16 + ${nib(i)})")
  }
}

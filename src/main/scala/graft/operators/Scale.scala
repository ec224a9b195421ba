package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-handling aggregation patterns (SURVEY §4.2 / the 100TB
  * notes): when a grouping key is hot, the single reducer owning it
  * becomes the straggler. These transformers split the hot key across
  * `saltBuckets` reducers with an exact second phase — results are
  * identical to the direct aggregation (decimal accumulation makes the
  * sum associative), only the shuffle shape changes.
  */
object Scale {

  /** Exact double SUM per key, salted: phase 1 groups on
    * (key, salt) where salt spreads rows uniformly, phase 2 combines
    * the ≤saltBuckets partials per key. Decimal accumulation end to
    * end → bit-identical to a direct decimal sum.
    */
  def saltedDecimalSum(df: DataFrame, keyCols: Seq[String],
      valueCol: String, outCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col(valueCol).cast(DecimalType(28, 6))).as("__partial"))
      .groupBy(keys: _*)
      .agg(round(sum(col("__partial")).cast(DoubleType), 4).as(outCol))
  }

  /** Exact COUNT(DISTINCT value) per key without funneling each key
    * through one reducer: phase 1 dedups on (key, value) — the shuffle
    * key includes the value, so a hot key spreads across reducers —
    * phase 2 counts survivors per key.
    */
  def skewSafeCountDistinct(df: DataFrame, keyCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    df.select(keys :+ col(valueCol): _*)
      .distinct()
      .groupBy(keys: _*)
      .agg(count(lit(1)).as(outCol))
  }
  /** Deterministic hash split/sample: bucket = integer value of the
    * first two hex chars of md5(key-as-string), i.e. a uniform,
    * engine-independent 0..255 draw that is exactly reproducible on
    * any cluster size, partitioning, or engine (md5 is md5 — this is
    * how training corpora get stable train/val/test membership and
    * stable N% samples across reruns, unlike rand()-based sampling).
    * A narrow map; no shuffle, no RNG state.
    */
  def hashBucket(keyAsString: Column): Column =
    conv(substring(md5(keyAsString), 1, 2), 16, 10).cast(IntegerType)

  /** 16-bit variant for finer thresholds (sampling). */
  def hashBucket16(keyAsString: Column): Column =
    conv(substring(md5(keyAsString), 1, 4), 16, 10).cast(IntegerType)

  /** Stable fraction sample over 65536 buckets; fractions below the
    * 1/65536 grain are a config error, not an empty result.
    */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    val cut = math.round(65536 * fraction).toInt
    require(cut >= 1 && fraction <= 1.0,
      s"hashSample: fraction $fraction below 1/65536 granularity")
    df.where(hashBucket16(keyCol.cast(StringType)) < cut)
  }

  /** Stable 3-way split labels over bucket thresholds (train/val/test). */
  def splitLabel(keyAsString: Column, trainUpto: Int = 205,
      valUpto: Int = 230): Column = {
    val b = hashBucket(keyAsString)
    when(b < trainUpto, "train").when(b < valUpto, "val").otherwise("test")
  }

  /** Deterministic stratified sample: exactly min(k, |stratum|) rows
    * per stratum, chosen by md5-of-key order (uniform, engine- and
    * partitioning-independent — the per-stratum analogue of
    * [[hashSample]], where a fraction can't guarantee per-group
    * counts). One shuffle on the strata columns; the `rn` column stays
    * in the output as the stable within-stratum draw index.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String],
      keyCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("rn"),
      "stratifiedSample: input already has an 'rn' column (it would be" +
        " silently overwritten by the draw index)")
    df.withColumn("rn", row_number().over(
        Window.partitionBy(strata.map(col): _*)
          .orderBy(md5(keyCol.cast(StringType)), keyCol)))
      .where(col("rn") <= k)
  }

  /** Deterministic fixed-size global sample: the k smallest rows in
    * md5-of-key order — what reservoir sampling gives, minus the RNG
    * state: stable across reruns and cluster sizes. Plans as
    * TakeOrderedAndProject (per-partition top-k then a k-row merge on
    * the driver), NOT a global sort — one corpus pass at any scale.
    */
  def fixedSample(df: DataFrame, keyCol: Column, k: Int): DataFrame =
    df.orderBy(md5(keyCol.cast(StringType)), keyCol).limit(k)

  /** Evolving fixed-k sample store for STREAMING reservoir sampling
    * (qs22): the current sample IS the whole state — k rows forever,
    * however long the stream runs. The md5-priority formulation makes
    * the classic reservoir MERGEABLE and deterministic: the sample of
    * any row set is its k smallest (md5(key), key) rows, and
    * top-k(top-k(A) ∪ top-k(B)) = top-k(A ∪ B) — associative AND
    * commutative, so any chunking in any order folds to the one-shot
    * [[fixedSample]] (the qs21 order-free contract class; a classic
    * counter-based reservoir is order-DEPENDENT and could never be
    * hash-gated).
    */
  final case class SampleStore private[operators] (sample: DataFrame,
      k: Int)

  def prepareSampleStore(corpus: DataFrame, keyCol: Column,
      k: Int): SampleStore =
    SampleStore(fixedSample(corpus, keyCol, k).localCheckpoint(true), k)

  /** Fold one batch into the store (batch schema must match the
    * store's). The current sample at any point is `store.sample`.
    */
  def sampleIngest(batch: DataFrame, store: SampleStore,
      keyCol: Column): SampleStore =
    SampleStore(
      fixedSample(store.sample.unionByName(batch), keyCol, store.k)
        .localCheckpoint(true),
      store.k)

  /** Token-budget shard packing as a DISTRIBUTED prefix sum: assign
    * each row the shard `floor(tokens_before_it / budget)` under a
    * total order — the "pack documents into ~budget-token training
    * shards" operator. The naive plan is `SUM(w) OVER (ORDER BY key)`,
    * a partition-less window that Spark executes on ONE task after a
    * global sort — the canonical 100TB non-starter. This runs the
    * classic two-level scan instead:
    *
    *  1. a monotone bucket `g = floor((key-min)·buckets/span)` (narrow
    *     map; only monotonicity matters, not uniformity, so the
    *     double rounding is harmless),
    *  2. the running sum WITHIN each bucket — a window partitioned on
    *     `g`, `buckets`-way parallel,
    *  3. per-bucket totals cascaded into bucket START offsets — a
    *     window over exactly `buckets` rows (the only single-partition
    *     step; 10^2..10^4 rows at any corpus size), broadcast back.
    *
    * Result is bit-identical to the naive global window for any bucket
    * count (spec-asserted), so shard boundaries are engine- and
    * partitioning-independent. Output = input + `shard`.
    *
    * `base` shifts the running sum by tokens already packed BEFORE
    * this frame — the continuous-ingestion hook (qs9): because a
    * prefix sum is associative, packing doc_id-ordered batches with
    * each batch's `base` = total weight of all earlier batches
    * reproduces the one-shot assignment exactly, with one Long of
    * carried state.
    */
  def packShards(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, buckets: Int = 256, base: Long = 0L): DataFrame = {
    require(budget > 0 && buckets > 0, "packShards: budget/buckets > 0")
    require(base >= 0, "packShards: base token offset must be >= 0")
    require(!df.columns.exists(_.startsWith("__pk")),
      "packShards: input carries reserved __pk* columns")
    require(!df.columns.contains("shard"),
      "packShards: input already has a 'shard' column (it would be " +
        "silently overwritten by the assignment)")
    val k = col(orderCol)
    val bounds = df.agg(min(k).cast(DoubleType).as("__pkmin"),
      max(k).cast(DoubleType).as("__pkmax"))
    val g = floor((k.cast(DoubleType) - col("__pkmin")) * buckets /
      (col("__pkmax") - col("__pkmin") + 1d)).as("__pkg")
    val src = df.crossJoin(broadcast(bounds)).withColumn("__pkg", g)
    runningSum(src, "__pkg", Seq(orderCol), weightCol, "__pkc", base)
      // exact Long floor division (all operands non-negative): a
      // double quotient would misplace boundary docs once the running
      // offset passes 2^53 — reachable for qs9's ever-growing base
      .withColumn("shard", expr(s"(__pkc - $weightCol) div ${budget}L"))
      .drop("__pkg", "__pkmin", "__pkmax", "__pkc")
  }

  /** Fixed-length causal-LM sample packing (the GPT pretraining data
    * prep shape): concatenate every row's token stream in `orderCol`
    * order and cut the global stream into consecutive samples of
    * EXACTLY `seqLen` tokens — rows SPLIT across sample boundaries.
    * Contrast [[packShards]] (keeps docs whole in budgeted shards) and
    * `TextFns.chunkDocs` (windows within one doc): this is the op that
    * turns a deduped corpus into the model's fixed-context training
    * samples, boundary docs straddling two samples.
    *
    * Output: one row per (input row, sample) piece — input columns +
    * `sample` (0-based global sample id), `piece_from` (1-based token
    * offset within the row), `piece_len`. Downstream slices the row's
    * token array with (piece_from, piece_len) and reassembles samples
    * by `STRING_AGG ... ORDER BY orderCol` — every sample except the
    * global last has Σ piece_len == seqLen exactly.
    *
    * Scale shape: one [[runningSum]] (two-level distributed prefix
    * sum — never a partition-less window), then a narrow explode of
    * ≤ 1 + weight/seqLen pieces per row. All boundary arithmetic is
    * exact Long floor division (a double quotient would misplace
    * boundary docs past 2^53 total tokens). Zero-weight rows emit no
    * piece (they contribute no tokens — and sequence(s0, s1) would
    * otherwise run DESCENDING for them).
    *
    * `base` shifts the stream position by tokens packed BEFORE this
    * frame — the continuous-ingestion hook (qs12), same associativity
    * as [[packShards]]'s: packing orderCol-monotone batches with each
    * batch's `base` = total weight of earlier batches reproduces the
    * one-shot piece assignment exactly (a sample straddling a batch
    * boundary receives its pieces from both batches).
    */
  def packSequences(df: DataFrame, orderCol: String, weightCol: String,
      seqLen: Long, buckets: Int = 256, base: Long = 0L): DataFrame = {
    require(seqLen > 0 && buckets > 0, "packSequences: seqLen/buckets > 0")
    require(base >= 0, "packSequences: base token offset must be >= 0")
    require(!df.columns.exists(_.startsWith("__pq")),
      "packSequences: input carries reserved __pq* columns")
    require(!df.columns.exists(Set("sample", "piece_from", "piece_len")),
      "packSequences: input already has a sample/piece_* column")
    val k = col(orderCol)
    val bounds = df.agg(min(k).cast(DoubleType).as("__pqmin"),
      max(k).cast(DoubleType).as("__pqmax"))
    val g = floor((k.cast(DoubleType) - col("__pqmin")) * buckets /
      (col("__pqmax") - col("__pqmin") + 1d)).as("__pqg")
    val src = df.where(col(weightCol) > 0)
      .crossJoin(broadcast(bounds)).withColumn("__pqg", g)
    val w = col(weightCol)
    runningSum(src, "__pqg", Seq(orderCol), weightCol, "__pqc", base)
      .withColumn("__pqs0", expr(s"(__pqc - $weightCol) div ${seqLen}L"))
      .withColumn("__pqs1", expr(s"(__pqc - 1) div ${seqLen}L"))
      .withColumn("sample", explode(sequence(col("__pqs0"), col("__pqs1"))))
      .withColumn("piece_from",
        greatest(col("sample") * seqLen - (col("__pqc") - w), lit(0L)) + 1)
      .withColumn("piece_len",
        least((col("sample") + 1) * seqLen, col("__pqc")) -
          greatest(col("sample") * seqLen, col("__pqc") - w))
      .drop("__pqg", "__pqmin", "__pqmax", "__pqc", "__pqs0", "__pqs1")
  }

  /** The distributed-prefix-sum core shared by [[packShards]] and
    * [[ppsSample]]: the INCLUSIVE running sum of `weightCol` under the
    * total order (`orderCols`), plus `base`, as `outCol`. `bucketCol`
    * must be a numeric column that is a monotone coarsening of the
    * order (equal-order rows share a bucket); only monotonicity
    * matters, not uniformity. Three-step two-level scan:
    *
    *  1. the input is materialized ONCE (both the offset aggregate and
    *     the window branch consume it; without this the upstream plan
    *     — e.g. a full-corpus tokenization — runs per branch),
    *  2. running sum WITHIN each bucket — a window partitioned on the
    *     bucket, buckets-way parallel (never a partition-less
    *     full-corpus window),
    *  3. per-bucket totals cascade into bucket START offsets — a
    *     window over exactly `buckets` rows, broadcast back.
    *
    * Bit-identical to the naive partition-less `SUM OVER (ORDER BY)`
    * for any bucket count (spec-asserted by both consumers).
    */
  private[graft] def runningSum(src0: DataFrame, bucketCol: String,
      orderCols: Seq[String], weightCol: String, outCol: String,
      base: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = src0.localCheckpoint(true)
    val within = src.withColumn("__rsrun", sum(col(weightCol))
      .over(Window.partitionBy(bucketCol)
        .orderBy(orderCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = src.groupBy(bucketCol)
      .agg(sum(col(weightCol)).as("__rstot"))
      .withColumn("__rsoff", coalesce(sum(col("__rstot"))
        .over(Window.orderBy(bucketCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(bucketCol, "__rsoff")
    within.join(broadcast(offsets), bucketCol)
      .withColumn(outCol, lit(base) + col("__rsoff") + col("__rsrun"))
      .drop("__rsrun", "__rsoff")
  }

  /** Probability-proportional-to-size SYSTEMATIC sampling (the "draw k
    * docs with probability ∝ token count" selection op — mixture
    * building and quality-weighted subcorpus draws): lay the corpus on
    * a [0, W) token axis in md5-of-key order (uniform, deterministic,
    * partitioning-independent — the same axis every sampling op here
    * uses), drop k evenly spaced points `floor(j·W/k)`, and select
    * each doc once per point inside its [cum−w, cum) interval. Docs
    * longer than W/k tokens can be drawn multiple times (`sel_count`
    * ≥ 2 — the PPS analogue of a repeat factor); zero-weight docs are
    * never drawn. Σ sel_count == k EXACTLY (the per-doc counts
    * telescope), partitioning- and engine-independent.
    *
    * Scale shape: the interval boundaries come from [[runningSum]]
    * (two-level distributed prefix sum — no partition-less window),
    * W from one broadcast scalar aggregate, and the point-count
    * arithmetic is exact DECIMAL(38,0) ceil-division per row (a
    * double quotient would misdraw boundary docs past 2^53; k·W
    * exceeds 2^63 for billion-doc corpora × large k).
    *
    * Output: input rows with `sel_count` ≥ 1 appended.
    */
  def ppsSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, buckets: Int = 256): DataFrame = {
    require(k > 0 && buckets > 0, "ppsSample: k/buckets > 0")
    require(!df.columns.exists(c =>
        c.startsWith("__pp") || c.startsWith("__rs")),
      "ppsSample: input carries reserved __pp*/__rs* columns")
    require(!df.columns.contains("sel_count"),
      "ppsSample: input already has a 'sel_count' column")
    // md5 hex as the order; its first two hex chars as the monotone
    // numeric bucket (equal-prefix ties stay in one bucket, so the
    // bucket is a true coarsening of the (md5, key) total order);
    // integer `div` grouping keeps it exact for any bucket count ≤ 256
    val step = math.max(1, 256 / buckets)
    val src = df
      .withColumn("__ppmd", md5(col(keyCol).cast(StringType)))
      .withColumn("__ppg", expr(
        s"CAST(conv(substring(__ppmd, 1, 2), 16, 10) AS INT) div $step"))
    val cum = runningSum(src, "__ppg", Seq("__ppmd", keyCol),
      weightCol, "__ppcum")
    val tot = df.agg(sum(col(weightCol)).as("__ppW"))
    cum.crossJoin(broadcast(tot))
      .withColumn("sel_count", expr(
        s"""(CAST(__ppcum AS DECIMAL(38,0)) * $k + __ppW - 1) div __ppW
           | - (CAST(__ppcum - $weightCol AS DECIMAL(38,0)) * $k + __ppW - 1)
           |   div __ppW""".stripMargin.replace("\n", " ")))
      .where(col("sel_count") >= 1)
      .drop("__ppmd", "__ppg", "__ppcum", "__ppW")
  }

  /** Weighted-fair source interleaving (xk9) — deterministic
    * training-order mixing: emit the corpus so every prefix holds
    * each source in proportion to its size (the mixture-scheduling
    * op: a model reading the output sequentially sees the target
    * source mix from step one, not source A then source B). Classic
    * weighted-fair-queuing virtual time: rows get a per-source rank
    * `rn` in md5 order (the house deterministic shuffle), virtual
    * time v = rn / w_source — one IEEE double division, identical in
    * both engines — and the output order is (v, source, key).
    *
    * Scale shape: per-source rank windows are partitioned (parallel);
    * the global position comes from [[runningSum]] over a monotone
    * v-range bucket — never a partition-less window. `pos` is the
    * 1-based global position (a permutation of 1..n, spec-asserted).
    */
  def interleaveBySource(df: DataFrame, keyCol: String,
      sourceCol: String, buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0, "interleaveBySource: buckets > 0")
    require(!df.columns.exists(c =>
        c.startsWith("__il") || c.startsWith("__rs")),
      "interleaveBySource: input carries reserved __il*/__rs* columns")
    require(!df.columns.contains("pos"),
      "interleaveBySource: input already has a 'pos' column")
    val rn = row_number().over(Window.partitionBy(sourceCol)
      .orderBy(md5(col(keyCol).cast(StringType)), col(keyCol)))
    val wts = df.groupBy(sourceCol).agg(count(lit(1)).as("__ilw"))
    val src = df.withColumn("__ilrn", rn)
      .join(broadcast(wts), sourceCol)
      .withColumn("__ilv",
        col("__ilrn").cast(DoubleType) / col("__ilw"))
      .withColumn("__ilone", lit(1L))
    val bounds = src.agg(min("__ilv").as("__ilmin"),
      max("__ilv").as("__ilmax"))
    // monotone coarsening of v (FP multiply by a positive constant
    // and floor are both monotone, ties share a bucket) — only
    // monotonicity matters, not uniformity
    val bucketed = src.crossJoin(broadcast(bounds))
      .withColumn("__ilg",
        floor((col("__ilv") - col("__ilmin")) * buckets /
          (col("__ilmax") - col("__ilmin") + 1e-9)))
    runningSum(bucketed, "__ilg", Seq("__ilv", sourceCol, keyCol),
      "__ilone", "pos")
      .drop("__ilrn", "__ilw", "__ilv", "__ilone", "__ilg",
        "__ilmin", "__ilmax")
  }

  /** Per-group cap keeping the k best rows by `ord` — the RefinedWeb/
    * C4 "at most k documents per domain" balancing op (a hot domain
    * must not dominate the corpus). One shuffle on the group key;
    * deterministic for any total `ord` (callers append a key
    * tiebreak). The group-hygiene twin of [[stratifiedSample]], which
    * draws uniformly where this keeps the BEST k.
    */
  def groupCap(df: DataFrame, groupCols: Seq[String], ord: Seq[Column],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "groupCap: k > 0")
    require(!df.columns.contains("__gcrn"),
      "groupCap: input carries the reserved __gcrn column")
    df.withColumn("__gcrn", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(ord: _*)))
      .where(col("__gcrn") <= k)
      .drop("__gcrn")
  }

  /** Scale-hygienic parquet layout: directory-partitioned on
    * `partitionCols` (readers with partition predicates prune whole
    * directories), rows sorted within each task by `sortCols` (tight
    * rowgroup min/max → predicate pushdown skips pages), and file
    * sizes bounded by `maxRecordsPerFile` (neither 10GB monofiles nor
    * a million-file explosion — the two failure modes of unmanaged
    * 100TB writes).
    */
  def writeLayout(df: DataFrame, dir: String, partitionCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Long): Unit = {
    require(partitionCols.nonEmpty, "writeLayout: partition columns")
    // repartition first: without it every task holds rows of every
    // partition value and emits tasks×values files — the small-file
    // explosion this helper exists to prevent. maxRecordsPerFile then
    // splits the per-value writes; a pathologically hot value still
    // funnels through one task (salt the repartition if that matters).
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(
        (partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(dir)
  }

}

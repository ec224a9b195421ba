package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Helpers shared by the scale-stress harnesses (ScaleStress /
  * RelationalStress / LshScale) so their evidence extraction and
  * corpus construction can't drift apart.
  */
object StressUtil {

  /** Fisher–Yates permutation of a vector, deterministic per seed —
    * replicas of an embedding become semantically unrelated vectors
    * with an identical value distribution.
    */
  def permuteVec(v: Seq[Float], seed: Long): Seq[Float] = {
    val arr = v.toArray
    val r = new java.util.Random(seed)
    var i = arr.length - 1
    while (i > 0) {
      val j = r.nextInt(i + 1)
      val tmp = arr(i); arr(i) = arr(j); arr(j) = tmp
      i -= 1
    }
    arr.toSeq
  }

  /** Replicate the documents table `factor`× with id offsets — THE
    * document-corpus scaling recipe (shared by ScaleStress and
    * StreamScale so their curve points measure the same corpus law):
    * replica 0 is the original; replica 1 of every 50th doc keeps the
    * original text plus one appended token (a PLANTED near-dup pair
    * at high Jaccard); every other replica gets a seeded word-shuffle
    * (same token multiset, different shingle set — NOT a near-dup).
    */
  def replicateDocuments(spark: SparkSession, baseDir: String,
      outDir: String, factor: Int): Long = {
    import spark.implicits._
    val OFF = 1000000L
    val baseDocs = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    locally {
      val maxId = baseDocs.agg(max(col("doc_id"))).head.getLong(0)
      require(maxId < OFF,
        s"base doc_id max $maxId >= offset $OFF: replica ids would " +
          "collide; raise OFF above the base id range")
      require(factor.toLong * OFF > 0 &&
        OFF <= Long.MaxValue / factor.toLong,
        s"factor $factor * OFF $OFF overflows Long")
    }
    spark.range(factor).crossJoin(baseDocs)
      .select(col("id").as("k"), col("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
      .as[(Long, Long, String, String, String, Long)]
      .map { case (k, id, text, lang, src, _) =>
        val newId = id + k * OFF
        val newText =
          if (k == 0) text
          else if (k == 1 && id % 50 == 0) text + " graftdupmark"
          else shuffleWords(text, id * 31 + k)
        // recompute n_chars: shuffled/marked replicas change the length,
        // and the corpus is a reusable on-disk artifact whose n_chars
        // must stay consistent with text for any downstream query
        (newId, newText, lang, src, newText.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }

  /** Fisher–Yates word shuffle, deterministic per seed — the document
    * replica transform of [[replicateDocuments]].
    */
  def shuffleWords(text: String, seed: Long): String = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val r = new java.util.Random(seed)
    var i = words.length - 1
    while (i > 0) {
      val j = r.nextInt(i + 1)
      val tmp = words(i); words(i) = words(j); words(j) = tmp
      i -= 1
    }
    words.mkString(" ")
  }

  /** Replicate the embeddings table `factor`× with id offsets: replica
    * 0 is byte-identical, replicas k>0 carry permuted vectors (same
    * distribution, no accidental near-dups). THE scaling recipe for
    * every LSH scale artifact (SCALE_r4*, SCALE_r5) — one definition
    * so curve points at different factors measure the same corpus law.
    */
  def replicateEmbeddings(spark: SparkSession, baseDir: String,
      outDir: String, factor: Int): Long = {
    import spark.implicits._
    val OFF = 1000000L
    val baseEmb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    // same replication invariant RelationalStress guards for
    // o_orderkey: replica id ranges must be disjoint (max base id <
    // OFF) and the top replica's offset must not overflow Long — a
    // silent collision would corrupt the planted-pair counts every
    // LSH scale artifact asserts on
    locally {
      val maxId = baseEmb.agg(max(col("vec_id"))).head.getLong(0)
      require(maxId < OFF,
        s"base vec_id max $maxId >= offset $OFF: replica ids would " +
          "collide; raise OFF above the base id range")
      require(factor.toLong * OFF > 0 &&
        OFF <= Long.MaxValue / factor.toLong,
        s"factor $factor * OFF $OFF overflows Long")
    }
    spark.range(factor).crossJoin(baseEmb)
      .select(col("id").as("k"), col("vec_id"), col("embedding"),
        col("label"))
      .as[(Long, Long, Seq[Float], Int)]
      .map { case (k, id, v, lab) =>
        (id + k * OFF, if (k == 0) v else permuteVec(v, id * 10 + k), lab)
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    spark.read.parquet(s"$outDir/embeddings.parquet").count()
  }

  /** Extract the join/exchange skeleton from an executed plan. Strips
    * the tree-drawing prefix and the whole-stage-codegen `*(N)` tag
    * BEFORE truncating at the first paren — otherwise a codegen-wrapped
    * node like `*(5) SortMergeJoin …` collapses to a bare `*`, which
    * both destroys the artifact's evidentiary value and lets the
    * BroadcastNestedLoopJoin assertion pass vacuously.
    */
  /** CLUSTERED embedding corpus: each base vector becomes a cluster
    * center with `members` satellites at center + 0.3·perm(center) —
    * deterministic per member id, norm-preserving, so within-cluster
    * cosine sits ≈0.95 while cross-cluster stays ≈0 (the base vectors
    * are isotropic). This is the corpus SemDedup's premise assumes
    * (real embedding spaces cluster); the isotropic replication recipe
    * above is its worst case. Member ids are center_id·members + j,
    * kept < 100000 so plantedEmbeddingCorpus's +100000 copy offset
    * stays collision-free.
    */
  def clusteredEmbeddings(spark: SparkSession, baseDir: String,
      outDir: String, members: Int): Long = {
    import spark.implicits._
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val maxId = base.agg(max(col("vec_id"))).head.getLong(0)
    require((maxId + 1) * members < 100000L,
      s"member ids would collide with the planted-copy offset: " +
        s"($maxId+1)*$members >= 100000")
    spark.range(members).crossJoin(base)
      .select(col("id").as("j"), col("vec_id"), col("embedding"),
        col("label"))
      .as[(Long, Long, Seq[Float], Int)]
      .map { case (j, cid, v, lab) =>
        val id = cid * members + j
        val p = permuteVec(v, id)
        val m = v.toArray.zip(p).map { case (x, y) => x + 0.3f * y }
        (id, m.toSeq, lab)
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(s"$outDir/embeddings_clustered.parquet")
    spark.read.parquet(s"$outDir/embeddings_clustered.parquet").count()
  }

  /** DRIFTED embedding corpus — the re-blocking epoch's premise
    * ([[graft.operators.Similarity.reblockGraphStore]]): the INITIAL
    * region reuses the clustered recipe (each base vector a cluster
    * center, `mInit` members at center + 0.25·perm — real embedding
    * spaces cluster), while the DELTA region's `deltaCids` clusters
    * all concentrate around ONE direction u = the lowest-id base
    * vector (center_c = u + 0.35·perm(base_c), members at center +
    * 0.25·perm) — a genuinely NEW region the initial corpus never
    * saw, tight enough that under centroids trained on the initial
    * region alone the whole delta region lands in its few nearest
    * stale cells (per-cell load balloons — the measured refresh-cost
    * law) while within-cluster cosine ≈ 0.95 still dominates
    * in-region cross-cluster ≈ 0.84, so true top-k stays the cluster
    * mates. Geometry margins: members are u + 0.35·p_c + 0.25·q_m
    * with u, p, q norm-equal and quasi-orthogonal → within-cluster
    * cos ≈ 1.1225/1.185 ≈ 0.947, in-region cross ≈ 1/1.185 ≈ 0.844,
    * initial-vs-delta ≈ 0.3 of that. Ids INTERLEAVE per base cid
    * (block of mInit initial then mDelta delta members) so
    * bounded-sample trainers that seed from low ids see both regions
    * after accumulation — the property that lets a refresh actually
    * split the new region into multiple cells.
    *
    * Columns: (vec_id, embedding float[], label, is_delta). Initial =
    * `is_delta = false`; the drift delta = `is_delta = true`.
    */
  def driftedEmbeddings(spark: SparkSession, baseDir: String,
      outDir: String, mInit: Int, mDelta: Int, deltaCids: Int): Long = {
    import spark.implicits._
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val u = base.orderBy("vec_id").limit(1)
      .select("embedding").head.getSeq[Float](0).toArray
    val block = mInit + mDelta
    val maxId = base.agg(max(col("vec_id"))).head.getLong(0)
    require((maxId + 1) * block < 1000000L,
      s"drifted ids would overflow the offset space: " +
        s"($maxId+1)*$block")
    val uB = spark.sparkContext.broadcast(u)
    spark.range(block).crossJoin(base)
      .select(col("id").as("j"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Seq[Float])]
      .flatMap { case (j, cid, v) =>
        val id = cid * block + j
        if (j < mInit) {
          val q = permuteVec(v, id)
          val m = v.toArray.zip(q).map { case (x, y) => x + 0.25f * y }
          Some((id, m.toSeq, 0, false))
        } else if (cid < deltaCids) {
          val p = permuteVec(v, cid * 7 + 3)
          val q = permuteVec(v, id)
          val m = uB.value.lazyZip(p).lazyZip(q)
            .map((a, b, c) => a + 0.35f * b + 0.25f * c)
          Some((id, m.toSeq, 1, true))
        } else None
      }
      .toDF("vec_id", "embedding", "label", "is_delta")
      .write.mode("overwrite")
      .parquet(s"$outDir/embeddings_drifted.parquet")
    spark.read.parquet(s"$outDir/embeddings_drifted.parquet").count()
  }

  def joinLines(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString.linesIterator
      .map(_.replaceAll("""^[\s:+-]*""", "")
        .replaceFirst("""^\*\(\d+\)\s*""", ""))
      .filter(l => l.contains("Join") || l.contains("Cartesian") ||
        l.contains("Exchange"))
      .map(_.takeWhile(_ != '(').trim).toSeq.distinct

  /** Minimal JSON scalar encoding for the artifact payloads (strings,
    * 3-decimal Locale.ROOT doubles, [[RawJson]] verbatim, everything
    * else via toString).
    */
  def jsonScalar(v: Any): String = v match {
    case RawJson(s) => s
    case s: String => "\"" + s.replace("\"", "\\\"") + "\""
    case d: Double =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    case other => other.toString
  }
}

/** A pre-encoded JSON fragment (array/object) for
  * [[StressUtil.jsonScalar]] — emitted verbatim into the artifact.
  */
final case class RawJson(s: String)

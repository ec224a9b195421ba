package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Graph, Scale}
import T._

/** Graph-ranking suite (SURVEY §2.11 extension family): link-centrality
  * operators a crawl-curation pipeline runs over the host/document link
  * graph. The driver testdata has no link column, so the declared
  * queries derive a DETERMINISTIC synthetic link graph from `documents`
  * with md5 arithmetic replayed identically in both engines (the xt21
  * synthetic-URL discipline): the oracle hash gate then proves the
  * ITERATIVE Spark computation — joins, dangling redistribution, decimal
  * quantization — equals a from-scratch relational re-derivation.
  */
object GraphQueries {

  /** Deterministic synthetic link graph over n docs, identical in both
    * engines:
    *  - doc d emits 1 + (d mod 3) candidate links (j = 1..);
    *  - target(d, j) = md5_16bit("d:j") mod n (the xk3 nibble bucket);
    *  - docs with d mod 97 == 0 emit NOTHING (planted dangling/sink
    *    pages so the dangling-mass path is exercised, not vacuous);
    *  - self-loops dropped, multi-edges deduped.
    */
  private def edgesSql: String =
    s"""links AS (
       |  SELECT d.doc_id AS src,
       |    CAST(${hb16Sql("CAST(d.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
       |      % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
       |  FROM documents d,
       |    UNNEST(GENERATE_SERIES(1, 1 + CAST(d.doc_id % 3 AS INT))) AS u(j)
       |  WHERE d.doc_id % 97 <> 0
       |), edges AS (
       |  SELECT DISTINCT src, dst FROM links WHERE dst <> src
       |)""".stripMargin

  /** 16-bit md5 bucket in DuckDB SQL (the ScaleQueries.hb16Sql pattern —
    * DuckDB has no base-conversion builtin, so the 4 nibbles expand via
    * STRPOS).
    */
  private def hb16Sql(x: String): String = {
    def nib(i: Int) =
      s"(STRPOS('0123456789abcdef', SUBSTR(MD5($x), $i, 1)) - 1)"
    s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
  }

  /** One unrolled PageRank iteration as oracle CTEs (see
    * [[Graph.pageRank]] for the update rule and the decimal-quantization
    * exactness contract; every CAST here mirrors one Spark-side cast).
    * Each p_k is MATERIALIZED — c_k and d_k both reference p_{k-1}, so
    * an inlined chain re-evaluates 2^k times (the BpeSql lesson).
    */
  private def iterSql(k: Int): String = {
    val prev = s"p${k - 1}"
    s"""c$k AS MATERIALIZED (
       |  SELECT e.dst,
       |    CAST(SUM(CAST(FLOOR(CAST(p.pr_e12 AS DOUBLE) / e.deg + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s
       |  FROM edgedeg e JOIN $prev p ON p.id = e.src GROUP BY e.dst
       |), d$k AS MATERIALIZED (
       |  SELECT CAST(COALESCE(SUM(pr_e12), 0) AS BIGINT) AS dm
       |  FROM $prev WHERE id NOT IN (SELECT src FROM outdeg)
       |), p$k AS MATERIALIZED (
       |  SELECT nd.id,
       |      CAST(FLOOR(0.15 / nn.n * 1.0e12 + 0.5) AS BIGINT)
       |    + CAST(FLOOR(0.85 * CAST(COALESCE(c.s, 0) AS DOUBLE) + 0.5)
       |        AS BIGINT)
       |    + CAST(FLOOR(0.85 * CAST(dd.dm AS DOUBLE) / nn.n + 0.5)
       |        AS BIGINT) AS pr_e12
       |  FROM nodes nd CROSS JOIN n nn CROSS JOIN d$k dd
       |  LEFT JOIN c$k c ON c.dst = nd.id
       |)""".stripMargin
  }

  /** One unrolled HITS iteration (see [[Graph.hits]]): per direction,
    * an edge join + Long-sum, the exact-integer norm partials Σq²/
    * Σqr/Σr² with raw = q·1e6 + r (HUGEINT here, DECIMAL(38,0) in
    * Spark — same integers, overflow-safe to n·maxdeg² ≤ 1e26), the
    * pinned sa·1e12 + sb·2e6 + sc double assembly, and the
    * floor(raw/√ss·1e12+0.5) requantization. SQRT is IEEE-correctly-
    * rounded, so the normalize step carries no cross-engine risk.
    */
  private def hitsIterSql(k: Int): String = {
    def half(tag: String, prev: String, joinKey: String,
        outKey: String): String =
      s"""r$tag$k AS MATERIALIZED (
         |  SELECT nd.id, COALESCE(r.raw, 0) AS raw
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.$outKey AS id, SUM(p.s) AS raw
         |    FROM edges e JOIN $prev p ON p.id = e.$joinKey
         |    GROUP BY e.$outKey) r USING (id)
         |), n$tag$k AS MATERIALIZED (
         |  SELECT
         |    COALESCE(SUM(CAST(raw // 1000000 AS HUGEINT)
         |      * (raw // 1000000)), 0) AS sa,
         |    COALESCE(SUM(CAST(raw // 1000000 AS HUGEINT)
         |      * (raw % 1000000)), 0) AS sb,
         |    COALESCE(SUM(CAST(raw % 1000000 AS HUGEINT)
         |      * (raw % 1000000)), 0) AS sc
         |  FROM r$tag$k
         |), $tag$k AS MATERIALIZED (
         |  SELECT id, CASE WHEN nn.sa = 0 AND nn.sb = 0 AND nn.sc = 0
         |    THEN CAST(0 AS BIGINT) ELSE
         |    CAST(FLOOR(CAST(raw AS DOUBLE) / SQRT(
         |        CAST(nn.sa AS DOUBLE) * 1.0e12
         |        + CAST(nn.sb AS DOUBLE) * 2.0e6
         |        + CAST(nn.sc AS DOUBLE))
         |      * 1.0e12 + 0.5) AS BIGINT) END AS s
         |  FROM r$tag$k CROSS JOIN n$tag$k nn
         |)""".stripMargin
    half("a", s"h${k - 1}", "src", "dst") + ",\n" +
      half("h", s"a$k", "dst", "src")
  }

  /** One unrolled TrustRank iteration (see [[Graph.trustRank]]): the
    * xg1 update with base + dangling terms gated on the seed flag.
    */
  private def trustIterSql(k: Int): String = {
    val prev = s"p${k - 1}"
    s"""c$k AS MATERIALIZED (
       |  SELECT e.dst,
       |    CAST(SUM(CAST(FLOOR(CAST(p.pr_e12 AS DOUBLE) / e.deg + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s
       |  FROM edgedeg e JOIN $prev p ON p.id = e.src GROUP BY e.dst
       |), d$k AS MATERIALIZED (
       |  SELECT CAST(COALESCE(SUM(pr_e12), 0) AS BIGINT) AS dm
       |  FROM $prev WHERE id NOT IN (SELECT src FROM outdeg)
       |), p$k AS MATERIALIZED (
       |  SELECT nd.id,
       |      CASE WHEN nd.seed THEN
       |        CAST(FLOOR(0.15 / nn.ns * 1.0e12 + 0.5) AS BIGINT)
       |      + CAST(FLOOR(0.85 * CAST(dd.dm AS DOUBLE) / nn.ns + 0.5)
       |          AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END
       |    + CAST(FLOOR(0.85 * CAST(COALESCE(c.s, 0) AS DOUBLE) + 0.5)
       |        AS BIGINT) AS pr_e12
       |  FROM nodes nd CROSS JOIN ns nn CROSS JOIN d$k dd
       |  LEFT JOIN c$k c ON c.dst = nd.id
       |)""".stripMargin
  }

  /** One unrolled synchronous-LPA iteration (see
    * [[Graph.labelPropagation]]): count neighbor labels, argmax by
    * (count DESC, label ASC) via ROW_NUMBER (the exact semantics of
    * Spark's min(struct(-count, label))), isolated nodes carried by
    * LEFT JOIN + COALESCE. Everything is integer arithmetic — the
    * whole gate is float-free.
    */
  private def lpaIterSql(k: Int): String = {
    val prev = s"l${k - 1}"
    s"""c$k AS MATERIALIZED (
       |  SELECT nb.v, l.lbl, COUNT(*) AS c
       |  FROM nb JOIN $prev l ON l.id = nb.u
       |  GROUP BY nb.v, l.lbl
       |), b$k AS MATERIALIZED (
       |  SELECT v, lbl FROM (
       |    SELECT v, lbl,
       |      ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lbl)
       |        AS rn
       |    FROM c$k) WHERE rn = 1
       |), l$k AS MATERIALIZED (
       |  SELECT p.id, COALESCE(b.lbl, p.lbl) AS lbl
       |  FROM $prev p LEFT JOIN b$k b ON b.v = p.id
       |)""".stripMargin
  }

  /** One unrolled iterated-H-index step (see [[Graph.coreness]]):
    * neighbors ranked by (c DESC, u), H = MAX(LEAST(rank, c)),
    * isolated nodes COALESCE to 0. All integers — float-free.
    */
  private def coreIterSql(k: Int): String = {
    val prev = s"h${k - 1}"
    s"""h$k AS MATERIALIZED (
       |  SELECT nd.id, COALESCE(hh.h, 0) AS c
       |  FROM nodes nd LEFT JOIN (
       |    SELECT v AS id, MAX(LEAST(rn, c)) AS h FROM (
       |      SELECT nb.v, l.c,
       |        ROW_NUMBER() OVER (PARTITION BY nb.v
       |          ORDER BY l.c DESC, nb.u) AS rn
       |      FROM nb JOIN $prev l ON l.id = nb.u)
       |    GROUP BY v) hh USING (id)
       |)""".stripMargin
  }

  /** 48-bit md5-prefix integer (12 nibbles; the ScaleQueries hex48Sql
    * fold) — xg7's HLL register hash.
    */
  private def hex48GSql(x: String): String = {
    def nib(i: Int) =
      s"(STRPOS('0123456789abcdef', SUBSTR(MD5($x), $i, 1)) - 1)"
    (2 to 12).foldLeft(s"CAST(${nib(1)} AS BIGINT)")((acc, i) =>
      s"($acc * 16 + ${nib(i)})")
  }

  /** One HyperBall register-propagation round (see [[Graph.hyperBall]]):
    * every node's counter absorbs its in-neighbors' counters by
    * elementwise MAX — associative, any merge tree.
    */
  private def hbRegsIterSql(t: Int): String =
    s"""regs$t AS MATERIALIZED (
       |  SELECT id, j, MAX(mj) AS mj FROM (
       |    SELECT id, j, mj FROM regs${t - 1}
       |    UNION ALL
       |    SELECT e.dst AS id, r.j, r.mj
       |    FROM edges e JOIN regs${t - 1} r ON r.id = e.src
       |  ) GROUP BY id, j
       |)""".stripMargin

  /** Per-node ball-size estimate at round `t` — xk16's pinned HLL
    * estimator (exact-integer register sums, one IEEE sequence, LC
    * branch), kept as a raw DOUBLE for the harmonic accumulation.
    */
  private def hbEstSql(t: Int): String =
    s"""est$t AS MATERIALIZED (
       |  SELECT id, CASE WHEN
       |      (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE)
       |        / 256.0) * 65536.0 * 2199023255552.0)
       |        / CAST(s AS DOUBLE) <= 640.0 AND vz > 0
       |    THEN 256.0 * LN(256.0 / CAST(vz AS DOUBLE))
       |    ELSE (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE)
       |        / 256.0) * 65536.0 * 2199023255552.0)
       |        / CAST(s AS DOUBLE) END AS e
       |  FROM (
       |    SELECT id, CAST(256 - COUNT(*) AS BIGINT) AS vz,
       |      CAST(SUM(CAST(1 AS BIGINT) << CAST(41 - mj AS INT))
       |        + (256 - COUNT(*)) * 2199023255552 AS BIGINT) AS s
       |    FROM regs$t GROUP BY id)
       |)""".stripMargin

  /** The Spark-side twin of [[edgesSql]] — THE single definition of
    * the synthetic link graph (xg1 and xg2 share it; drift between
    * this and the SQL breaks both hash gates).
    */
  private def sparkEdges(docs: org.apache.spark.sql.DataFrame, n: Long)
      : org.apache.spark.sql.DataFrame =
    docs
      .where(pmod(col("doc_id"), lit(97L)) =!= 0L)
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1),
          lit(1) + pmod(col("doc_id"), lit(3L)).cast(IntegerType)))
          .as("j"))
      .select(col("src"),
        pmod(Scale.hashBucket16(
            concat(col("src").cast(StringType), lit(":"),
              col("j").cast(StringType))).cast(LongType),
          lit(n)).as("dst"))
      .where(col("dst") =!= col("src")).distinct()
      // every Graph operator references its edge frame 2–3× (outdeg
      // agg + join, or both directions of the neighbor union) —
      // materialize the md5 derivation + distinct ONCE (r14; the
      // materialize-once sweep discipline from r5)
      .localCheckpoint(true)

  private val Iters = 10

  val all: Seq[Q] = Seq(

    // xg1: damped PageRank, 10 iterations, over the deterministic
    // synthetic link graph — the host-centrality ranking op (Common
    // Crawl publishes exactly this over its host graph; curation
    // pipelines weight sources by it). The oracle re-derives the graph
    // AND all 10 iterations in unrolled CTEs (a recursive CTE cannot
    // aggregate over its working table — the BpeSql lesson), so the
    // hash match proves the iterative join/checkpoint loop, the
    // dangling-mass redistribution and the 1e-12 fixed-point
    // requantization chain are all cross-engine exact (see
    // Graph.pageRank's Scaladoc for why fixed point, not DECIMAL).
    Q("xg1_pagerank",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |$edgesSql,
         |outdeg AS (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY src
         |), edgedeg AS (
         |  SELECT e.src, e.dst, o.deg FROM edges e
         |  JOIN outdeg o ON o.src = e.src
         |), p0 AS (
         |  SELECT id, CAST(FLOOR(1.0 / nn.n * 1.0e12 + 0.5) AS BIGINT)
         |    AS pr_e12
         |  FROM nodes CROSS JOIN n nn
         |),
         |${(1 to Iters).map(iterSql).mkString(",\n")}
         |SELECT id AS doc_id, pr_e12 FROM p$Iters ORDER BY doc_id"""
        .stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.pageRank(nodes, sparkEdges(docs, docs.count()),
          iters = Iters)
        .select(col("id").as("doc_id"), col("pr_e12"))
        .orderBy("doc_id")
    },

    // xg2: HITS hubs & authorities over the same link graph — the
    // other classic link-centrality pair (hubs = pages whose OUTLINKS
    // select good content; authorities = pages good hubs point AT —
    // a crawl seed-list / source-weighting signal PageRank's single
    // score conflates). Ten unrolled iterations, each direction an
    // edge join + exact Long sum + the IEEE-exact √Σraw² normalize.
    Q("xg2_hits",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |$edgesSql,
         |h0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS s FROM nodes),
         |${(1 to Iters).map(hitsIterSql).mkString(",\n")}
         |SELECT nd.id AS doc_id, a$Iters.s AS auth_e12,
         |  h$Iters.s AS hub_e12
         |FROM nodes nd
         |JOIN a$Iters ON a$Iters.id = nd.id
         |JOIN h$Iters ON h$Iters.id = nd.id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.hits(nodes, sparkEdges(docs, docs.count()), iters = Iters)
        .select(col("id").as("doc_id"), col("auth_e12"), col("hub_e12"))
        .orderBy("doc_id")
    },

    // xg3: exact triangle count + global clustering coefficient via
    // the degree-ordered orientation (Schank–Wagner "forward"
    // algorithm): every triangle owned by its (deg,id)-minimal
    // vertex, wedge volume Σ outdeg² with outdeg ≤ O(√m) REGARDLESS
    // of skew — the property that keeps the wedge join alive on
    // power-law graphs where a raw ordered join explodes on hub
    // degrees. The oracle replays the orientation and both joins on
    // the same undirected edge set.
    Q("xg3_triangles",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |$edgesSql,
         |und AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM edges WHERE src <> dst
         |), deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY id
         |), oriented AS (
         |  SELECT CASE WHEN (da.deg, und.a) < (db.deg, und.b)
         |    THEN und.a ELSE und.b END AS u,
         |    CASE WHEN (da.deg, und.a) < (db.deg, und.b)
         |    THEN und.b ELSE und.a END AS v
         |  FROM und
         |  JOIN deg da ON da.id = und.a
         |  JOIN deg db ON db.id = und.b
         |), tri AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS triangles
         |  FROM oriented w1
         |  JOIN oriented w2 ON w2.u = w1.u AND w1.v < w2.v
         |  JOIN und c ON c.a = w1.v AND c.b = w2.v
         |), stats AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |    CAST(SUM(deg) / 2 AS BIGINT) AS n_edges,
         |    CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS wedges
         |  FROM deg
         |)
         |SELECT n_nodes, n_edges, wedges, triangles,
         |  CAST(FLOOR(3.0 * triangles / wedges * 10000 + 0.5) AS BIGINT)
         |    AS gcc_e4
         |FROM stats CROSS JOIN tri""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      Graph.triangles(sparkEdges(docs, docs.count()))
    },

    // xg4: TrustRank — PageRank's teleport restricted to a trusted
    // seed set (doc_id % 50 == 0, the deterministic stand-in for a
    // vetted domain list): quality flows OUTWARD from seeds, and
    // pages unreachable from them score exactly 0 (no (1-d)/n floor
    // — the spam-island property classic PageRank lacks). Same
    // fixed-point discipline and unrolled-CTE oracle as xg1.
    Q("xg4_trustrank",
      s"""WITH nodes AS (
         |  SELECT doc_id AS id, doc_id % 50 = 0 AS seed FROM documents
         |),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM nodes
         |       WHERE seed),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |$edgesSql,
         |outdeg AS (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY src
         |), edgedeg AS (
         |  SELECT e.src, e.dst, o.deg FROM edges e
         |  JOIN outdeg o ON o.src = e.src
         |), p0 AS (
         |  SELECT id, CASE WHEN seed
         |    THEN CAST(FLOOR(1.0 / nn.ns * 1.0e12 + 0.5) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS pr_e12
         |  FROM nodes CROSS JOIN ns nn
         |),
         |${(1 to Iters).map(trustIterSql).mkString(",\n")}
         |SELECT id AS doc_id, pr_e12 FROM p$Iters ORDER BY doc_id"""
        .stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.trustRank(nodes, sparkEdges(docs, docs.count()),
          pmod(col("id"), lit(50L)) === 0L, iters = Iters)
        .select(col("id").as("doc_id"), col("pr_e12"))
        .orderBy("doc_id")
    },

    // xg5: synchronous label-propagation communities (Raghavan et al.
    // 2007) over the same link graph — the density-cluster finder
    // (mirror/template site grouping) where connectedComponents only
    // finds reachability. Classic LPA is randomized and ungateable;
    // this variant pins synchronous updates, (count DESC, label ASC)
    // tie-break and a fixed iteration count, making the whole chain
    // integer-exact — the only graph entry with a float-free gate.
    Q("xg5_label_propagation",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |$edgesSql,
         |nb AS (
         |  SELECT DISTINCT v, u FROM (
         |    SELECT src AS v, dst AS u FROM edges WHERE src <> dst
         |    UNION ALL
         |    SELECT dst AS v, src AS u FROM edges WHERE src <> dst)
         |), l0 AS (SELECT id, id AS lbl FROM nodes),
         |${(1 to Iters).map(lpaIterSql).mkString(",\n")},
         |sizes AS (
         |  SELECT lbl, CAST(COUNT(*) AS BIGINT) AS csize
         |  FROM l$Iters GROUP BY lbl
         |)
         |SELECT l.id AS doc_id, l.lbl AS label, s.csize
         |FROM l$Iters l JOIN sizes s USING (lbl)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.labelPropagation(nodes, sparkEdges(docs, docs.count()),
          iters = Iters)
        .select(col("id").as("doc_id"), col("label"), col("csize"))
        .orderBy("doc_id")
    },

    // xg6: k-core coreness via the iterated H-index (Lü et al., PNAS
    // 2016) — "how embedded is this page in a dense region": link-farm
    // cores light up where pendant crawl chains score 1. The classic
    // peel is a chain of n dependent deletions (unrunnable
    // distributed); the H-index iteration is per-neighborhood local,
    // O(~diameter) rounds of joins, and provably converges to the
    // same coreness. Integer-exact end to end (the xg5 float-free
    // class); 10 unrolled iterations in the oracle.
    Q("xg6_coreness",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |$edgesSql,
         |nb AS (
         |  SELECT DISTINCT v, u FROM (
         |    SELECT src AS v, dst AS u FROM edges WHERE src <> dst
         |    UNION ALL
         |    SELECT dst AS v, src AS u FROM edges WHERE src <> dst)
         |), dg AS (
         |  SELECT v AS id, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM nb GROUP BY v
         |), h0 AS (
         |  SELECT nd.id, COALESCE(dg.d, 0) AS c
         |  FROM nodes nd LEFT JOIN dg USING (id)
         |),
         |${(1 to Iters).map(coreIterSql).mkString(",\n")}
         |SELECT nd.id AS doc_id, COALESCE(dg.d, 0) AS deg,
         |  h$Iters.c AS core
         |FROM nodes nd
         |LEFT JOIN dg USING (id)
         |JOIN h$Iters ON h$Iters.id = nd.id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.coreness(nodes, sparkEdges(docs, docs.count()),
          iters = Iters)
        .select(col("id").as("doc_id"), col("deg"), col("core"))
        .orderBy("doc_id")
    },

    // xg7: HyperBall harmonic centrality (Boldi & Vigna 2013) — the
    // centrality Common Crawl actually publishes over its host graph,
    // computed the way it actually computes it: HLL counters per node
    // (the xk16 register machinery), one elementwise-MAX propagation
    // round per hop, harmonic accumulation from the estimated ball
    // sizes. Exact harmonic needs all-pairs BFS (Θ(n·m) — dead at
    // scale); this is 4 rounds of register joins. The register state
    // is pure max-merged integers and every estimate one pinned IEEE
    // sequence, so the whole approximate chain is hash-gated.
    Q("xg7_hyperball",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |$edgesSql,
         |regs0 AS MATERIALIZED (
         |  SELECT id, h // 1099511627776 AS j,
         |    CASE WHEN h % 1099511627776 = 0 THEN 41
         |      ELSE 41 - LENGTH(BIN(h % 1099511627776)) END AS mj
         |  FROM (SELECT id,
         |    ${hex48GSql("'v:' || CAST(id AS VARCHAR)")} AS h
         |    FROM nodes)
         |),
         |${hbEstSql(0)},
         |${(1 to 4).flatMap(t =>
             Seq(hbRegsIterSql(t), hbEstSql(t))).mkString(",\n")}
         |SELECT e0.id AS doc_id,
         |  CAST(FLOOR(e1.e + 0.5) AS BIGINT) AS ball1,
         |  CAST(FLOOR(e4.e + 0.5) AS BIGINT) AS ball4,
         |  CAST(FLOOR(((((e1.e - e0.e) / 1.0 + (e2.e - e1.e) / 2.0)
         |    + (e3.e - e2.e) / 3.0) + (e4.e - e3.e) / 4.0) * 1.0e4
         |    + 0.5) AS BIGINT) AS harm_e4
         |FROM est0 e0
         |JOIN est1 e1 ON e1.id = e0.id
         |JOIN est2 e2 ON e2.id = e0.id
         |JOIN est3 e3 ON e3.id = e0.id
         |JOIN est4 e4 ON e4.id = e0.id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.hyperBall(nodes, sparkEdges(docs, docs.count()), iters = 4)
        .select(col("id").as("doc_id"), col("ball1"), col("ball4"),
          col("harm_e4"))
        .orderBy("doc_id")
    },

    // xg8: multi-source BFS hop distances — the reachability
    // primitive run directly: hop distance from the seed set
    // (doc_id % 101 == 0, ~1% of nodes, the TrustRank-seed shape)
    // along directed links, capped at depth 12, unreached → −1.
    // Frontier iteration: each edge is scanned exactly once, when its
    // source enters the frontier — O(m) total work. The oracle closes
    // the same graph with a depth-capped recursive CTE + MIN(d):
    // UNION-dedup on (id, d) pairs bounds the recursion, and the
    // minimum over all ≤12-hop paths IS the BFS distance, so the
    // hash match proves the round-by-round frontier labeling (incl.
    // early exit) equals the declarative closure.
    Q("xg8_bfs_distance",
      s"""WITH RECURSIVE nodes AS (SELECT doc_id AS id FROM documents),
         |$edgesSql,
         |seeds AS (SELECT id FROM nodes WHERE id % 101 = 0),
         |reach(id, d) AS (
         |  SELECT id, 0 FROM seeds
         |  UNION
         |  SELECT e.dst, r.d + 1
         |  FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.d < 12
         |), dd AS (
         |  SELECT id, MIN(d) AS dist FROM reach GROUP BY id
         |)
         |SELECT n.id AS doc_id,
         |  CAST(COALESCE(dd.dist, -1) AS BIGINT) AS dist
         |FROM nodes n LEFT JOIN dd ON dd.id = n.id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      Graph.bfsDistances(nodes, sparkEdges(docs, docs.count()),
          pmod(col("id"), lit(101L)) === 0L, maxDepth = 12)
        .select(col("id").as("doc_id"), col("dist"))
        .orderBy("doc_id")
    },

    // xg9: co-citation similarity (Small 1973) — the link-analysis
    // "related pages" signal: pairs co-linked by the same sources,
    // common counts by wedge enumeration over HUB-CAPPED out-lists
    // (each src keeps its maxOut=2 smallest-dst targets before the
    // self-join — Σ min(outdeg, maxOut)² wedge volume, the xd3 df-cap
    // discipline; the cap BINDS here on every outdeg-3 source, so the
    // gate proves the capped operator end-to-end, not a dead branch),
    // exact RAW in-degrees joined back, Jaccard as r4 over exact
    // integers. The cap is deterministic (distinct edges, smallest
    // dst) — ROW_NUMBER ORDER BY dst has no ties in either engine.
    Q("xg9_cocitation",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |$edgesSql,
         |capped AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
         |    FROM edges) c WHERE rn <= 2
         |), w AS (
         |  SELECT e1.dst AS a, e2.dst AS b
         |  FROM capped e1 JOIN capped e2
         |    ON e1.src = e2.src AND e1.dst < e2.dst
         |), cc AS (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common
         |  FROM w GROUP BY 1, 2
         |), indeg AS (
         |  SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS din
         |  FROM edges GROUP BY dst
         |)
         |SELECT cc.a, cc.b, cc.common, ia.din AS na, ib.din AS nb,
         |  FLOOR(CAST(cc.common AS DOUBLE)
         |    / (ia.din + ib.din - cc.common) * 10000 + 0.5) / 10000.0
         |    AS j
         |FROM cc
         |JOIN indeg ia ON ia.id = cc.a
         |JOIN indeg ib ON ib.id = cc.b
         |ORDER BY cc.a, cc.b""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      Graph.cocitation(sparkEdges(docs, docs.count()), maxOut = 2)
        .withColumn("j", graft.queries.T.r4(
          col("common").cast(DoubleType) /
            (col("na") + col("nb") - col("common"))))
        .orderBy("a", "b")
    },

    // xg10: weighted seed-set shortest paths (frontier Bellman-Ford —
    // delta-stepping's scan discipline): min total weight from the
    // xg8 seed set along directed edges with deterministic integer
    // weights 1 + md5_16("w:src:dst") mod 9 ∈ [1,9]. Round-k costs ==
    // "min cost over ≤ k-edge paths" EXACTLY (see Graph.sssp), so the
    // 12-round cap is the same semantic object as the oracle's
    // depth-12 recursive closure, converged or not; the UNION dedups
    // (id, cost, depth) triples, bounding the recursion, and MIN(c)
    // over them IS the capped shortest path. Pure BIGINT — hash-gated.
    Q("xg10_sssp",
      s"""WITH RECURSIVE nodes AS (SELECT doc_id AS id FROM documents),
         |$edgesSql,
         |wedges AS (
         |  SELECT src, dst, CAST(1 + ${hb16Sql(
               "'w:' || CAST(src AS VARCHAR) || ':' || " +
                 "CAST(dst AS VARCHAR)")} % 9 AS BIGINT) AS w
         |  FROM edges
         |),
         |seeds AS (SELECT id FROM nodes WHERE id % 101 = 0),
         |reach(id, c, d) AS (
         |  SELECT id, CAST(0 AS BIGINT), 0 FROM seeds
         |  UNION
         |  SELECT e.dst, r.c + e.w, r.d + 1
         |  FROM reach r JOIN wedges e ON e.src = r.id
         |  WHERE r.d < 12
         |), dd AS (
         |  SELECT id, MIN(c) AS cost FROM reach GROUP BY id
         |)
         |SELECT n.id AS doc_id,
         |  CAST(COALESCE(dd.cost, -1) AS BIGINT) AS cost
         |FROM nodes n LEFT JOIN dd ON dd.id = n.id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      val we = sparkEdges(docs, docs.count())
        .withColumn("w", lit(1L) + pmod(Scale.hashBucket16(
          concat(lit("w:"), col("src").cast(StringType), lit(":"),
            col("dst").cast(StringType))).cast(LongType), lit(9L)))
      Graph.sssp(nodes, we, pmod(col("id"), lit(101L)) === 0L,
          maxRounds = 12)
        .select(col("id").as("doc_id"), col("cost"))
        .orderBy("doc_id")
    },

    // xp7: TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04) —
    // the OTHER direction of graph×text composition: instead of
    // ranking documents by links (xp6), rank WORDS by co-occurrence.
    // The word graph (nodes = corpus vocabulary, undirected edges =
    // adjacent-token pairs, the w=2 window of the original paper)
    // feeds the UNCHANGED Graph.pageRank fixed-point machinery —
    // pageRank is id-type-agnostic, so word strings are vertex ids
    // directly and the oracle reuses iterSql verbatim. Scale shape:
    // one corpus-wide DISTINCT over bigrams builds the vocab-sized
    // graph (vocabulary ≪ corpus — the Heaps'-law bound); the
    // 10-iteration loop then runs on vocab-sized frames only, and the
    // top-20 never sorts the vocabulary (TakeOrdered + a 20-row rank
    // window). Dangling words (single-token docs) exercise the
    // dangling-mass path.
    Q("xp7_textrank",
      s"""WITH tok AS (
         |  SELECT doc_id, LIST_FILTER(
         |    STRING_SPLIT_REGEX(LOWER(text), '\\s+'), t -> t <> '') AS fw
         |  FROM documents
         |), bgp AS (
         |  SELECT fw[i] AS w1, fw[i + 1] AS w2
         |  FROM tok, UNNEST(RANGE(1, LEN(fw))) AS ti(i)
         |), edges AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT w1 AS src, w2 AS dst FROM bgp WHERE w1 <> w2
         |    UNION ALL
         |    SELECT w2 AS src, w1 AS dst FROM bgp WHERE w1 <> w2)
         |), nodes AS (
         |  SELECT DISTINCT w AS id FROM (SELECT UNNEST(fw) AS w FROM tok)
         |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |outdeg AS (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY src
         |), edgedeg AS (
         |  SELECT e.src, e.dst, o.deg FROM edges e
         |  JOIN outdeg o ON o.src = e.src
         |), p0 AS (
         |  SELECT id, CAST(FLOOR(1.0 / nn.n * 1.0e12 + 0.5) AS BIGINT)
         |    AS pr_e12
         |  FROM nodes CROSS JOIN n nn
         |),
         |${(1 to Iters).map(iterSql).mkString(",\n")},
         |ranked AS (
         |  SELECT id AS word, pr_e12,
         |    CAST(ROW_NUMBER() OVER (ORDER BY pr_e12 DESC, id) AS INT)
         |      AS rnk
         |  FROM p$Iters
         |)
         |SELECT rnk, word, pr_e12 FROM ranked WHERE rnk <= 20
         |ORDER BY rnk""".stripMargin) { (s, d) =>
      import graft.functions.TextFns
      val docs = t(s, d, "documents")
      // the bigram explode is referenced by BOTH edge directions, and
      // pageRank reads the edge frame twice (outdeg + join):
      // materialize each stage once (the r5 sweep discipline)
      val pairs = docs
        .select(explode(TextFns.wordBigrams(TextFns.tokens(col("text"))))
          .as("bg"))
        .select(substring_index(col("bg"), " ", 1).as("w1"),
          substring_index(col("bg"), " ", -1).as("w2"))
        .where(col("w1") =!= col("w2"))
        .localCheckpoint(true)
      val edges = pairs
        .select(col("w1").as("src"), col("w2").as("dst"))
        .unionAll(pairs.select(col("w2").as("src"), col("w1").as("dst")))
        .distinct()
        .localCheckpoint(true)
      val nodes = docs
        .select(explode(TextFns.tokens(col("text"))).as("id"))
        .distinct()
      val pr = Graph.pageRank(nodes, edges, iters = Iters)
      val top = pr.orderBy(col("pr_e12").desc, col("id")).limit(20)
      top.withColumn("rnk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("pr_e12").desc, col("id")))
            .cast(IntegerType))
        .select(col("rnk"), col("id").as("word"), col("pr_e12"))
        .orderBy("rnk")
    },

    // xp6: link-aware quality cap — the graph family composed with
    // the selection family (the real curation move: RefinedWeb-style
    // per-source caps ordered by link centrality instead of a text
    // heuristic). xg1's PageRank scores every doc; Scale.groupCap
    // keeps the 5 highest-centrality docs per source (ties to the
    // smaller doc_id — pr_e12 is an exact integer, so ties are real
    // and the order is total). Oracle replays the ENTIRE chain: the
    // shared graph CTEs, all 10 fixed-point iterations, and the
    // per-source ROW_NUMBER.
    Q("xp6_pagerank_cap",
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |$edgesSql,
         |outdeg AS (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY src
         |), edgedeg AS (
         |  SELECT e.src, e.dst, o.deg FROM edges e
         |  JOIN outdeg o ON o.src = e.src
         |), p0 AS (
         |  SELECT id, CAST(FLOOR(1.0 / nn.n * 1.0e12 + 0.5) AS BIGINT)
         |    AS pr_e12
         |  FROM nodes CROSS JOIN n nn
         |),
         |${(1 to Iters).map(iterSql).mkString(",\n")},
         |ranked AS (
         |  SELECT d.source, d.doc_id, p.pr_e12,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY d.source
         |      ORDER BY p.pr_e12 DESC, d.doc_id) AS INT) AS rnk
         |  FROM documents d JOIN p$Iters p ON p.id = d.doc_id
         |)
         |SELECT source, rnk, doc_id, pr_e12 FROM ranked
         |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val nodes = docs.select(col("doc_id").as("id"))
      val pr = Graph.pageRank(nodes, sparkEdges(docs, docs.count()),
          iters = Iters)
        .join(docs.select(col("doc_id").as("id"), col("source")), "id")
        .select(col("id").as("doc_id"), col("source"), col("pr_e12"))
      // Scale.groupCap's exact semantics, rank kept for the output
      // (groupCap drops its row number; the oracle needs it)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(col("pr_e12").desc, col("doc_id").asc)
      pr.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("source"), col("rnk"), col("doc_id"), col("pr_e12"))
        .orderBy("source", "rnk")
    }
  )
}

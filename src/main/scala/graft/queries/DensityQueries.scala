package graft.queries

import graft._
import graft.ann.Ann
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density-based embedding-space operators (beyond the reference — the
  * two classic neighborhood-density algorithms a data-cleaning /
  * clustering pipeline reaches for):
  *
  *  - DBSCAN (Ester et al. 1996) over cosine similarity: core points have
  *    ≥ minPts neighbors within eps (cos ≥ τ); clusters are connected
  *    components of the core-core graph; border points attach to their
  *    best core neighbor's cluster; the rest is noise.
  *  - Local Outlier Factor (Breunig et al. 2000): the k-NN
  *    reachability-density ratio on a probe slice — LOF ≈ 1 means the
  *    probe sits at its neighbors' density, ≫ 1 means outlier.
  *
  * Scale shapes: the eps-neighbor graph comes from the exact triangle
  * block join ([[Ann.allPairsCosine]] — n·blocks shuffle rows, no driver
  * state; swap in [[Ann.lshNearDupPairs]] for the sub-quadratic path at
  * 100 TB); components reuse the dedup CC machinery (driver fast path /
  * compressed label propagation); LOF is probe-bounded — three broadcast
  * kNN passes discover probes → neighbors → 2-hop neighbors, the corpus
  * streams map-side and never shuffles.
  *
  * Engine agreement: every downstream quantity (degree, core flag,
  * component label, reach distance, lrd, LOF) derives from the 6-dp
  * ROUNDED cosine, so both engines compute on bit-identical inputs;
  * component labels are min-id (total order), ranks tie-break on vec_id.
  */
object DensityQueries {
  private def embs(s: SparkSession, dir: String) =
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))

  /** DBSCAN: eps as a cosine floor (the near-dup family's 0.4), minPts
    * counts the point itself (the classic convention). */
  private val Eps = 0.4
  private val MinPts = 3

  /** LOF neighborhood size and the probe rule shared with the kNN family. */
  private val LofK = 5

  /** Label spreading: eps-graph floor, propagation rounds, seed rule =
    * vec_id % 10 (10% labeled). */
  private val LsEps = 0.2
  private val LsRounds = 3

  /** q_label_spread_lsh truncates each node's vote edges to its TOP-K
    * strongest verified neighbors (the standard kNN-graph label
    * propagation). The low eps makes the FULL eps-graph dense — the
    * second-decade measurement caught 92M verified edges at 200k
    * vectors (bucket-mates share 12 hyperplane signs, so ~70% of
    * candidates clear cos 0.2): edge volume was Θ(n²·density) no matter
    * how the candidates were generated. The top-K cap bounds it at
    * Θ(n·k); ranking is on the 1e6-scaled INTEGER weight (desc, id) so
    * both engines cut the identical edge set. */
  private val LsTopK = 32

  /** DBSCAN tail shared by the exact and LSH-candidate variants: degree +
    * core flag from the symmetric view; clusters = CC over core-core edges
    * (min-id labels — deterministic), singleton cores label themselves;
    * border points take the smallest cluster id among their core neighbors
    * (a deterministic tiebreak of DBSCAN's order-dependent border
    * assignment); everything else is noise. cluster_id = -1 for noise. */
  private def dbscanFrom(e: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("j").as("i"), col("i").as("j")))
    val deg = sym.groupBy("i").agg(count(lit(1)).as("deg"))
    val core = deg.where(col("deg") + 1 >= MinPts).select(col("i").as("node"))
    val coreEdges = edges
      .join(core.withColumnRenamed("node", "i"), Seq("i"))
      .join(core.withColumnRenamed("node", "j"), Seq("j"))
      .select("i", "j")
    val cc = Dedup.connectedComponents(coreEdges)
      .select(col("u").as("node"), col("label").as("cluster_id"))
    val coreClusters = core.join(cc, Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster_id"), col("node")).as("cluster_id"))
    val border = sym
      .join(coreClusters.withColumnRenamed("node", "j"), Seq("j"))
      .join(core.withColumnRenamed("node", "i"), Seq("i"), "left_anti")
      .groupBy(col("i").as("node")).agg(min("cluster_id").as("cluster_id"))
    val assigned = coreClusters.withColumn("role", lit("core"))
      .union(border.withColumn("role", lit("border")))
    e.select(col("vec_id")).join(assigned.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"),
        coalesce(col("role"), lit("noise")).as("role"))
  }

  /** Label-spreading tail shared by the exact and LSH-candidate variants:
    * `sym` is the symmetric weighted eps graph (i, j, w). */
  private def labelSpreadFrom(e: DataFrame, sym: DataFrame): DataFrame = {
    val seeds = e.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("label").as("lbl"))
    var labeled = seeds
    var r = 0
    while (r < LsRounds) {
      val votes = sym.join(labeled.withColumnRenamed("vec_id", "j"), Seq("j"))
        .groupBy(col("i"), col("lbl")).agg(sum("w").as("wv"))
      val wv = Window.partitionBy("i").orderBy(col("wv").desc, col("lbl").asc)
      val picks = votes.withColumn("rk", row_number().over(wv)).where(col("rk") === 1)
        .select(col("i").as("vec_id"), col("lbl"))
        .join(labeled.select("vec_id"), Seq("vec_id"), "left_anti")
      // materialize each round: `labeled` appears THREE times in the next
      // round's plan (votes join, anti-join, union), so an unmaterialized
      // loop grows the plan ~3^r — the round-12 before-plan had 190
      // Exchange/Scan nodes for 3 rounds. Per-round scratch parquet is the
      // same shape connectedComponents uses for its rounds (guide §3.3:
      // materialise intermediates to truncate the plan).
      labeled = Scratch.materialize(labeled.union(picks), s"ls_round$r")
      r += 1
    }
    e.select(col("vec_id"), col("label"))
      .join(labeled.withColumnRenamed("lbl", "pred"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), coalesce(col("pred"), lit(-1L)).as("pred"),
        when(col("vec_id") % 10 === 0, 1).otherwise(0).as("is_seed"),
        when(col("vec_id") % 10 =!= 0 && col("pred") === col("label"), 1)
          .when(col("vec_id") % 10 =!= 0 && col("pred").isNotNull, 0)
          .otherwise(-1).as("correct"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── DBSCAN, exact eps graph via the triangle block join (opt-in at
    // scale — compute is inherently quadratic). ──
    "q_dbscan" -> ((s, dir) => {
      val e = embs(s, dir)
      // the eps graph feeds FOUR consumers (degree, core-core edges,
      // border, via sym twice) — scratch-materialize it once
      val edges = Scratch.materialize(Ann.allPairsCosine(e, Eps).select("i", "j"), "dbscan_edges")
      dbscanFrom(e, edges)
    }),

    // ── DBSCAN over the LSH-candidate eps graph — the 100 TB default:
    // candidates come from the adaptive banded key-equality join
    // (Θ(n·log n) total candidate mass under Ann.LshSteps), exact-verified
    // at Eps before any density logic runs. The output is DBSCAN on a
    // recall-bounded SUBGRAPH of the true eps graph (missed edges can
    // only demote density, never invent it); the oracle replays the
    // identical bands, so both engines see the same subgraph. ──
    "q_dbscan_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      val st = Ann.lshStepFor(e.count())
      val edges = Scratch.materialize(
        Ann.lshNearDupPairs(e, Eps, bands = st.bands, rowsPerBand = st.rows)
          .select("i", "j"), "dbscan_lsh_edges")
      dbscanFrom(e, edges)
    }),

    // ── LOF on the probe slice. One broadcast kNN kernel reused three
    // times: probes → their neighbors (N1) → 2-hop neighbors (N2); the
    // final kNN table over probes ∪ N1 ∪ N2 yields k-distances,
    // reachability distances reach(p,o) = max(kdist(o), d(p,o)), local
    // reachability densities lrd = k/Σreach, and LOF(p) = mean_o lrd(o) /
    // lrd(p). Distances are 1 − cos on the ROUNDED cosine. ──
    "q_lof" -> ((s, dir) => {
      val e = embs(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
      // materialize each hop's id frontier: u2 would otherwise replay
      // knn2 -> knn1 (every hop is a full-corpus broadcast scan)
      val knn1 = Ann.knnBruteForce(e, probes, LofK)
      val n1 = knn1.select(col("neighbor_id").as("vec_id")).distinct()
      val u1 = Scratch.materialize(probes.select("vec_id").union(n1).distinct(), "lof_u1")
      val knn2 = Ann.knnBruteForce(e, e.join(u1, Seq("vec_id")), LofK)
      val n2 = knn2.select(col("neighbor_id").as("vec_id")).distinct()
      val u2 = Scratch.materialize(u1.union(n2).distinct(), "lof_u2")
      val knn = Scratch.materialize(
        Ann.knnBruteForce(e, e.join(u2, Seq("vec_id")), LofK)
          .select(col("probe_id").as("pid"), col("neighbor_id").as("nid"),
            (lit(1.0) - col("cos")).as("dist"), col("rk")), "lof_knn")
      val kdist = knn.where(col("rk") === LofK).select(col("pid").as("id"), col("dist").as("kdist"))
      val reach = knn
        .join(kdist.withColumnRenamed("id", "nid"), Seq("nid"))
        .select(col("pid"), col("nid"), greatest(col("kdist"), col("dist")).as("reach"))
      val lrd = reach.groupBy("pid").agg((lit(LofK) / sum("reach")).as("lrd"))
      knn.select("pid", "nid")
        .join(probes.select(col("vec_id").as("pid")), Seq("pid"))
        .join(lrd.select(col("pid").as("nid"), col("lrd").as("lrd_n")), Seq("nid"))
        .join(lrd, Seq("pid"))
        .groupBy("pid", "lrd")
        .agg(sum("lrd_n").as("sum_lrd_n"))
        .select(col("pid").as("probe_id"), round(col("lrd"), 6).as("lrd"),
          round(col("sum_lrd_n") / (lit(LofK) * col("lrd")), 6).as("lof"))
    }),

    // ── Semi-supervised label spreading (the Zhu & Ghahramani label-
    // propagation family, frozen-once-assigned variant): seeds keep their
    // label; each round, every unlabeled vector with labeled eps-graph
    // neighbors takes the label with the largest 1e6-scaled-integer
    // cosine-weight sum (tie → smaller label). Three rounds of pure
    // key-equality joins — no driver state, no float vote can diverge.
    // Emits per vector: truth, prediction (−1 unreached), seed flag,
    // and correctness on the non-seed slice — the "how far do 10% labels
    // carry" measurement. ──
    "q_label_spread" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label"))
      val edges = Scratch.materialize(
        Ann.allPairsCosine(e, LsEps)
          .select(col("i"), col("j"), round(col("cos") * 1e6).cast("long").as("w")),
        "label_spread_edges")
      val sym = edges.union(edges.select(col("j").as("i"), col("i").as("j"), col("w")))
      labelSpreadFrom(e, sym)
    }),

    // ── Label spreading over the top-K LSH-candidate graph — the 100 TB
    // default twin of q_label_spread (allPairsCosine stays the exact
    // opt-in). Candidates from the adaptive banding, exact-verified at
    // eps, then each node keeps only its K strongest neighbors (kNN-graph
    // label propagation — the full eps-graph at this low eps is DENSE,
    // Θ(n²·density) edges; see LsTopK). Votes flow directionally j→i
    // over i's kept edges; both engines replay the identical cut. ──
    "q_label_spread_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label"))
      val st = Ann.lshStepFor(e.count())
      val pairs = Ann.lshNearDupPairs(e, LsEps, bands = st.bands, rowsPerBand = st.rows)
        .select(col("i"), col("j"), round(col("cos") * 1e6).cast("long").as("w"))
      val both = pairs.union(pairs.select(col("j").as("i"), col("i").as("j"), col("w")))
      val wk = Window.partitionBy("i").orderBy(col("w").desc, col("j"))
      val edges = Scratch.materialize(
        both.withColumn("rk", row_number().over(wk)).where(col("rk") <= LsTopK)
          .select("i", "j", "w"),
        "label_spread_lsh_edges")
      labelSpreadFrom(e, edges)
    })
  )

  private val cosSql = LlmQueries.cosSql _

  /** DBSCAN SQL tail over an edge CTE named `e` (i, j) — shared verbatim
    * by the exact and LSH-candidate variants. */
  private def dbscanTailSql: String =
    s"""sym AS (SELECT i, j FROM e UNION ALL SELECT j AS i, i AS j FROM e),
       |deg AS (SELECT i, count(*) AS deg FROM sym GROUP BY 1),
       |core AS (SELECT i AS node FROM deg WHERE deg + 1 >= $MinPts),
       |ce AS (SELECT e.i, e.j FROM e
       |       JOIN core ca ON e.i = ca.node JOIN core cb ON e.j = cb.node),
       |symc AS (SELECT i AS u, j AS v FROM ce UNION SELECT j AS u, i AS v FROM ce),
       |reach AS (SELECT u, v FROM symc
       |          UNION
       |          SELECT r.u, s.v FROM reach r JOIN symc s ON r.v = s.u WHERE s.v <> r.u),
       |cc AS (SELECT u AS node, least(u, min(v)) AS cluster_id FROM reach GROUP BY 1),
       |corec AS (SELECT c.node, coalesce(cc.cluster_id, c.node) AS cluster_id
       |          FROM core c LEFT JOIN cc ON c.node = cc.node),
       |border AS (SELECT s.i AS node, min(k.cluster_id) AS cluster_id
       |           FROM sym s JOIN corec k ON s.j = k.node
       |           WHERE s.i NOT IN (SELECT node FROM core) GROUP BY 1),
       |assigned AS (SELECT node, cluster_id, 'core' AS role FROM corec
       |             UNION ALL SELECT node, cluster_id, 'border' AS role FROM border)
       |SELECT v.vec_id, coalesce(a.cluster_id, -1) AS cluster_id,
       |       coalesce(a.role, 'noise') AS role
       |FROM embeddings v LEFT JOIN assigned a ON v.vec_id = a.node""".stripMargin

  val sql: Map[String, String] = Map(

    "q_dbscan" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= $Eps),
         |$dbscanTailSql""".stripMargin,

    "q_dbscan_lsh" ->
      s"""WITH RECURSIVE ${LlmQueries.adaptiveBandsSql},
         |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |e AS (SELECT i, j FROM cand JOIN embeddings ea ON i = ea.vec_id JOIN embeddings eb ON j = eb.vec_id
         |      WHERE ${cosSql("ea.embedding", "eb.embedding")} >= $Eps),
         |$dbscanTailSql""".stripMargin,

    "q_lof" -> {
      // one reusable kNN-over-a-probe-set SQL block (1-indexed rank)
      def knnSql(probeSet: String, out: String) =
        s"""$out AS (
           |  SELECT * FROM (
           |    SELECT p.vec_id AS pid, c.vec_id AS nid,
           |      1.0 - round(${cosSql("p.embedding", "c.embedding")}, 6) AS dist,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY ${cosSql("p.embedding", "c.embedding")} DESC, c.vec_id) AS rk
           |    FROM $probeSet p JOIN embeddings c ON c.vec_id <> p.vec_id)
           |  WHERE rk <= $LofK)""".stripMargin
      s"""WITH p0 AS (SELECT vec_id, embedding FROM embeddings ${Ann.ProbeQualify}),
         |${knnSql("p0", "knn1")},
         |u1 AS (SELECT vec_id, embedding FROM embeddings
         |       WHERE vec_id IN (SELECT pid FROM knn1 UNION SELECT nid FROM knn1)),
         |${knnSql("u1", "knn2")},
         |u2 AS (SELECT vec_id, embedding FROM embeddings
         |       WHERE vec_id IN (SELECT pid FROM knn2 UNION SELECT nid FROM knn2)),
         |${knnSql("u2", "knn")},
         |kd AS (SELECT pid AS id, dist AS kdist FROM knn WHERE rk = $LofK),
         |reach AS (SELECT k.pid, k.nid, greatest(kd.kdist, k.dist) AS reach
         |          FROM knn k JOIN kd ON k.nid = kd.id),
         |lrd AS (SELECT pid, $LofK / sum(reach) AS lrd FROM reach GROUP BY 1)
         |SELECT k.pid AS probe_id, round(l.lrd, 6) AS lrd,
         |  round(sum(ln.lrd) / ($LofK * l.lrd), 6) AS lof
         |FROM knn k
         |JOIN p0 ON k.pid = p0.vec_id
         |JOIN lrd ln ON k.nid = ln.pid
         |JOIN lrd l ON k.pid = l.pid
         |GROUP BY 1, l.lrd""".stripMargin
    },

    "q_label_spread_lsh" -> {
      def roundCte(prev: String, out: String) =
        s"""${out}_v AS (SELECT s.i, l.lbl, sum(s.w)::BIGINT AS wv
           |        FROM sym s JOIN $prev l ON s.j = l.vec_id GROUP BY 1, 2),
           |${out}_p AS (SELECT i AS vec_id, lbl FROM (
           |        SELECT i, lbl, row_number() OVER (PARTITION BY i ORDER BY wv DESC, lbl) AS rk
           |        FROM ${out}_v) WHERE rk = 1),
           |$out AS (SELECT vec_id, lbl FROM $prev
           |        UNION ALL
           |        SELECT p.vec_id, p.lbl FROM ${out}_p p
           |        WHERE p.vec_id NOT IN (SELECT vec_id FROM $prev))""".stripMargin
      s"""WITH ${LlmQueries.adaptiveBandsSql},
         |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |e0 AS (SELECT i, j, round(round(${cosSql("ea.embedding", "eb.embedding")}, 6) * 1e6)::BIGINT AS w
         |      FROM cand JOIN embeddings ea ON i = ea.vec_id JOIN embeddings eb ON j = eb.vec_id
         |      WHERE ${cosSql("ea.embedding", "eb.embedding")} >= $LsEps),
         |eb0 AS (SELECT i, j, w FROM e0 UNION ALL SELECT j AS i, i AS j, w FROM e0),
         |sym AS (SELECT i, j, w FROM (
         |        SELECT *, row_number() OVER (PARTITION BY i ORDER BY w DESC, j) AS rk FROM eb0)
         |        WHERE rk <= $LsTopK),
         |l0 AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings WHERE vec_id % 10 = 0),
         |${roundCte("l0", "l1")},
         |${roundCte("l1", "l2")},
         |${roundCte("l2", "l3")}
         |SELECT v.vec_id, v.label::BIGINT AS label,
         |  coalesce(l.lbl, -1) AS pred,
         |  CASE WHEN v.vec_id % 10 = 0 THEN 1 ELSE 0 END AS is_seed,
         |  CASE WHEN v.vec_id % 10 <> 0 AND l.lbl = v.label::BIGINT THEN 1
         |       WHEN v.vec_id % 10 <> 0 AND l.lbl IS NOT NULL THEN 0
         |       ELSE -1 END AS correct
         |FROM embeddings v LEFT JOIN l3 l ON v.vec_id = l.vec_id""".stripMargin
    },

    "q_label_spread" -> {
      def roundCte(prev: String, out: String) =
        s"""${out}_v AS (SELECT s.i, l.lbl, sum(s.w)::BIGINT AS wv
           |        FROM sym s JOIN $prev l ON s.j = l.vec_id GROUP BY 1, 2),
           |${out}_p AS (SELECT i AS vec_id, lbl FROM (
           |        SELECT i, lbl, row_number() OVER (PARTITION BY i ORDER BY wv DESC, lbl) AS rk
           |        FROM ${out}_v) WHERE rk = 1),
           |$out AS (SELECT vec_id, lbl FROM $prev
           |        UNION ALL
           |        SELECT p.vec_id, p.lbl FROM ${out}_p p
           |        WHERE p.vec_id NOT IN (SELECT vec_id FROM $prev))""".stripMargin
      s"""WITH e AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |    round(${cosSql("a.embedding", "b.embedding")} * 1e6)::BIGINT AS w
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= $LsEps),
         |sym AS (SELECT i, j, w FROM e UNION ALL SELECT j AS i, i AS j, w FROM e),
         |l0 AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings WHERE vec_id % 10 = 0),
         |${roundCte("l0", "l1")},
         |${roundCte("l1", "l2")},
         |${roundCte("l2", "l3")}
         |SELECT v.vec_id, v.label::BIGINT AS label,
         |  coalesce(l.lbl, -1) AS pred,
         |  CASE WHEN v.vec_id % 10 = 0 THEN 1 ELSE 0 END AS is_seed,
         |  CASE WHEN v.vec_id % 10 <> 0 AND l.lbl = v.label::BIGINT THEN 1
         |       WHEN v.vec_id % 10 <> 0 AND l.lbl IS NOT NULL THEN 0
         |       ELSE -1 END AS correct
         |FROM embeddings v LEFT JOIN l3 l ON v.vec_id = l.vec_id""".stripMargin
    }
  )
}

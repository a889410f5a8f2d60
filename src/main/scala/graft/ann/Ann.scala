package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Three tiers, by corpus size:
  *  - brute force: broadcast the (small) probe set against the full
  *    corpus — exact, one scan, no shuffle of the corpus side;
  *  - LSH: random-hyperplane bucketing — candidates meet through a
  *    key-equality join on the bucket id;
  *  - IVF: coarse cells learned by [[KMeansDet]] (or any precomputed
  *    partition), probe the nearest cells only.
  *
  * Dot products run in double precision: the native zip_with/aggregate
  * form for one-shot compares, the codegen'd [[graft.expressions.CosineSim]]
  * expression (identical arithmetic) on pair-heavy paths where the
  * higher-order functions' per-pair array allocation dominates.
  */
object Ann {

  /** Σ aᵢbᵢ in double precision via zip_with + aggregate (codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity between two array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Same arithmetic as [[cosine]] (left-to-right double accumulation) as
    * the native codegen'd [[graft.expressions.CosineSim]] expression: no
    * UDF boxing, no per-pair allocation — on pair-heavy paths (all-pairs
    * near-dup, LSH verification, top-k scans) the boxing otherwise
    * dominates the arithmetic. Results are bit-identical to [[cosine]].
    */
  def cosineFast(a: Column, b: Column): Column = graft.expressions.cosine_sim(a, b)

  /** Fixed-budget probe sample (round-10 scale fix). The old `% 50`
    * probe sets scaled WITH the corpus, so every probe-broadcast eval
    * was Θ(n²/50) — the one-decade SCALE measurement caught it at
    * exponent ~1.5. A deterministic md5-rank cap keeps the probe budget
    * CONSTANT: evals are linear in the corpus at any SF and the
    * broadcast side is bounded by construction (the offline-recall
    * harness shape that stays feasible at 100 TB). The identical rank
    * filter rides each oracle's QUALIFY clause ([[ProbeQualify]]).
    */
  val ProbeCap = 64
  def probeSample(df: DataFrame, id: String = "vec_id", cap: Int = ProbeCap): DataFrame =
    df.orderBy(md5(col(id).cast("string")), col(id)).limit(cap)
  val ProbeQualify =
    s"QUALIFY row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) <= $ProbeCap"

  /** Adaptive LSH banding schedule (rounds 10–11 scale fixes). With a
    * FIXED rowsPerBand the candidate count is Θ(n²·2^{-rows}) — the
    * one-decade SCALE measurement caught q_embed_clusters at exponent
    * 2.0 (8-bucket bands), and the r10 three-step fix itself capped at
    * 9 rows = 512 buckets, re-opening Θ(n²/512) one decade further out.
    * This table is the UNCAPPED continuation: rows grow +3 per 8× of
    * corpus (2^rows ∝ n ⇒ expected bucket load stays ≤ 512 at every
    * boundary, ≤ 256 past the first ⇒ per-band candidates Θ(n)), and
    * the band count grows to hold the recall curve 1−(1−pʳ)ᵇ fixed in
    * the high-similarity regime cluster collapse cares about: at
    * cos 0.9 (p = 1 − θ/π ≈ 0.8563) every step's analytic recall is
    * ≥ 0.988 (AnnSpec asserts the whole curve). Band count growth is
    * the standard log-factor price of constant recall — total
    * candidate mass is Θ(n·log n), never quadratic.
    *
    * The schedule is a SHARED LITERAL: the steps below are the single
    * source for both engines — the Spark side branches via
    * [[lshStepFor]] on the exact corpus count, and the DuckDB twin
    * replays the identical table via [[lshStepsValuesSql]] on its own
    * count(*), so both engines always pick the same granularity.
    */
  final case class LshStep(maxN: Long, rows: Int, bands: Int)
  val LshSteps: Seq[LshStep] = Seq(
    LshStep(4096L, 3, 16),
    LshStep(16384L, 6, 16),
    LshStep(131072L, 9, 16),
    LshStep(1048576L, 12, 27),
    LshStep(8388608L, 15, 44),
    LshStep(67108864L, 18, 72),
    LshStep(Long.MaxValue, 21, 115))
  def lshStepFor(n: Long): LshStep = LshSteps.find(n <= _.maxN).get
  def lshRowsFor(n: Long): Int = lshStepFor(n).rows
  def lshBandsFor(n: Long): Int = lshStepFor(n).bands
  /** The schedule as a SQL VALUES body `(maxn, rows_, bands_), …` for the
    * oracle twin's step selection. */
  val lshStepsValuesSql: String =
    LshSteps.map(s => s"(${s.maxN}, ${s.rows}, ${s.bands})").mkString(", ")

  /** Exact all-pairs cosine near-duplicates above a threshold, fully
    * distributed — NO driver collect, NO broadcast of the corpus.
    *
    * Triangle block join: each vector gets a block id (`vec_id % blocks`);
    * a tiny broadcast table enumerates the blocks×(blocks+1)/2 unordered
    * block pairs; vectors route to every block-pair partition that needs
    * them (shuffle volume = n·blocks rows) and each partition computes its
    * (n/blocks)² pair slice. Compute is still O(n²) — inherent to EXACT
    * all-pairs — but it is spread over blocks²/2 reducers with bounded
    * per-task memory, so the plan survives any corpus that can afford the
    * quadratic work. For sub-quadratic candidate generation at 100 TB use
    * [[lshNearDupPairs]] (recall-bounded) and exact-verify its candidates.
    */
  def allPairsCosine(corpus: DataFrame, threshold: Double, blocks: Int = 16,
                     id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val blockPairs = spark.createDataFrame(
      for { a <- 0 until blocks; b <- a until blocks } yield (a, b)).toDF("ba", "bb")
    val v = corpus.select(col(id), col(vec), pmod(col(id), lit(blocks)).as("blk"))
    // a vector in block c routes to every pair (c, b≥c) as the a-side and
    // every pair (a≤c, c) as the b-side — blocks+1 copies total, meeting
    // each other block exactly once under the composite (ba, bb) join key.
    val left = v.join(broadcast(blockPairs), col("blk") === col("ba"))
      .select(col("ba"), col("bb"), col(id).as("_xi"), col(vec).as("va"))
    val right = v.join(broadcast(blockPairs.withColumnRenamed("ba", "ba2").withColumnRenamed("bb", "bb2")),
        col("blk") === col("bb2"))
      .select(col("ba2"), col("bb2"), col(id).as("_yj"), col(vec).as("vb"))
    // same-block pairs appear once via _xi < _yj; cross-block pairs appear
    // exactly once (a-side from the lower block) in either id order, so
    // normalize with least/greatest.
    left.join(right,
        col("ba") === col("ba2") && col("bb") === col("bb2") &&
          (col("ba") < col("bb") || col("_xi") < col("_yj")))
      .withColumn("_cos", cosineFast(col("va"), col("vb")))
      .where(col("_cos") >= threshold)
      .select(least(col("_xi"), col("_yj")).as("i"), greatest(col("_xi"), col("_yj")).as("j"),
        round(col("_cos"), 6).as("cos"))
  }

  /** Banded random-hyperplane LSH near-duplicate pairs: `bands` bands of
    * `rowsPerBand` deterministic LCG hyperplanes each; docs colliding in
    * ANY band become candidates (key-equality join per band — shuffle
    * scales with collisions, never n²); candidates are deduped then
    * EXACT-verified with the full cosine ≥ threshold. Output is therefore
    * always a subset of the true pair set; recall at the threshold is
    * 1-(1-p^r)^b with p = 1-θ/π (AnnSpec measures it on the test corpus).
    * This is the 100 TB path — the oracle replicates the banding exactly.
    */
  def lshNearDupPairs(corpus: DataFrame, threshold: Double, bands: Int = 8, rowsPerBand: Int = 4,
                      id: String = "vec_id", vec: String = "embedding", salt: Int = 1): DataFrame = {
    val v = corpus.select(col(id), col(vec))
    // all band buckets in one compiled pass over the vector (bit-identical
    // to the per-plane HOF projections — see LshBandBuckets). coalesce: a
    // NULL vector bucketed as 0 by the old when/otherwise form (and by the
    // oracle's CASE) must not become a NULL array that posexplode drops.
    val zeroBuckets = array((0 until bands).map(_ => lit(0L)): _*)
    val banded = v.select(col(id), col(vec),
        posexplode(coalesce(
          graft.expressions.lsh_band_buckets(col(vec), bands, rowsPerBand), zeroBuckets))
          .as(Seq("band", "bucket")))
    // verify-then-dedup: the codegen'd cosine is cheaper than shuffling
    // the full candidate multiset through a distinct — a pair colliding in
    // several bands is verified once per collision, but only the tiny
    // ≥-threshold survivor set reaches the dedup shuffle.
    graft.dedup.Dedup.saltedPairJoin(banded, Seq("band", "bucket"), id, salt)
      .withColumn("_cos", cosineFast(col(s"a.$vec"), col(s"b.$vec")))
      .where(col("_cos") >= threshold)
      .select(col(s"a.$id").as("i"), col(s"b.$id").as("j"), round(col("_cos"), 6).as("cos"))
      .distinct()
  }

  /** Exact top-k cosine neighbors of each probe row. The probe side is
    * broadcast; the corpus side streams — no corpus shuffle.
    */
  def knnBruteForce(corpus: DataFrame, probes: DataFrame, k: Int,
                    id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(probes.select(col(id).as("probe_id"), col(vec).as("pvec"))),
        col(s"c.$id") =!= col("probe_id"))
      .withColumn("cos", cosineFast(col("pvec"), col(s"c.$vec")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(s"c.$id"))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col(s"c.$id").as("neighbor_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  /** Projection of `vec` on a deterministic pseudo-random hyperplane:
    * the (plane, dim) weight is integer-arithmetic LCG noise in
    * [-0.5, 0.5), so any engine reproduces the same planes bit-exactly.
    */
  def planeProjection(vec: Column, plane: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x.cast("double") *
          ((((lit(plane.toLong) * 64 + d.cast("long")) * lit(2654435761L)) % 1000003).cast("double") / 1000003.0 - 0.5)),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket id from `planes` sign bits (one band of
    * `planes` rows through the compiled single-pass expression); NULL
    * vectors bucket as 0 like the old when/otherwise form. */
  def lshBucket(vec: Column, planes: Int): Column =
    coalesce(element_at(graft.expressions.lsh_band_buckets(vec, 1, planes), 1), lit(0L))

  /** Top-k within LSH buckets: probes only compare against their bucket. */
  def knnLsh(corpus: DataFrame, probes: DataFrame, k: Int, planes: Int = 8,
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val bc = corpus.withColumn("bucket", lshBucket(col(vec), planes))
    val bp = probes.withColumn("bucket", lshBucket(col(vec), planes))
      .select(col("bucket"), col(id).as("probe_id"), col(vec).as("pvec"))
    val joined = bc.join(bp, Seq("bucket")).where(col(id) =!= col("probe_id"))
      .withColumn("cos", cosineFast(col("pvec"), col(vec)))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(id))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col("bucket"), col(id).as("neighbor_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  /** Elementwise mean vector per cell (array avg via posexplode). */
  def centroids(corpus: DataFrame, cell: String, vec: String = "embedding"): DataFrame =
    corpus.select(col(cell), posexplode(col(vec)).as(Seq("dim", "x")))
      .groupBy(cell, "dim").agg(avg(col("x").cast("double")).as("cx"))
      .groupBy(cell).agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("cs"))
      .select(col(cell), expr("transform(cs, s -> s.cx)").as("centroid"))

  /** IVF search: rank cells by probe→centroid cosine, scan the top
    * `nprobe` cells only, return top-k per probe. Centroids are the
    * per-cell member means of `corpus`.
    */
  def knnIvf(corpus: DataFrame, probes: DataFrame, cell: String, k: Int, nprobe: Int,
             id: String, vec: String): DataFrame =
    knnIvf(corpus, probes, centroids(corpus, cell, vec), cell, k, nprobe, id, vec)

  def knnIvf(corpus: DataFrame, probes: DataFrame, cell: String, k: Int, nprobe: Int = 2): DataFrame =
    knnIvf(corpus, probes, cell, k, nprobe, "vec_id", "embedding")

  /** IVF search against a precomputed centroid table (`cell`, centroid) —
    * the learned-cells path: probes rank cells by cosine against the
    * FITTED centroids (e.g. [[KMeansDet.fit]] output), then scan only the
    * corpus rows assigned to the top `nprobe` cells. The centroid table is
    * k rows and broadcasts; the corpus joins on the cell key — shuffle
    * volume is the probed slice, never all pairs.
    */
  def knnIvf(corpus: DataFrame, probes: DataFrame, cents: DataFrame, cell: String,
             k: Int, nprobe: Int, id: String, vec: String): DataFrame = {
    val probeCells = probes.select(col(id).as("probe_id"), col(vec).as("pvec"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("pvec"), col("centroid")))
    val wCell = Window.partitionBy("probe_id").orderBy(col("ccos").desc, col(cell))
    val chosen = probeCells.withColumn("crk", row_number().over(wCell)).where(col("crk") <= nprobe)
      .select(col("probe_id"), col("pvec"), col(cell), col("crk"))
    val joined = chosen.join(corpus, Seq(cell)).where(col(id) =!= col("probe_id"))
      .withColumn("cos", cosineFast(col("pvec"), col(vec)))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(id))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col(cell), col(id).as("neighbor_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }
}

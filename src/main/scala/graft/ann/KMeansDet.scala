package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd's k-means for IVF cell learning.
  *
  * MLlib's KMeans seeds with randomized k-means|| — not reproducible by
  * an external engine — so graft uses the fully deterministic variant:
  * initial centroids are the embeddings of the k smallest ids, and each
  * of the fixed `iters` Lloyd rounds is (a) a truly map-side assignment —
  * the k×dim centroid table collapses to ONE broadcast row holding the
  * sorted (cell, centroid) list, and each corpus row takes the argmin via
  * `array_min` over per-cell squared distances (ties → lowest cell id;
  * zero corpus shuffle, no per-id aggregation) — and (b) a keyed
  * elementwise-mean centroid update (one shuffle of (cell, dim, x) rows).
  * Every arithmetic step is replayable in SQL, so the DuckDB oracle
  * checks the whole clustering bit-for-bit at 6 dp.
  * Scale: assignment is O(n·k·dim) map-side work; the update shuffle
  * carries n·dim rows — both linear in corpus size, no driver state
  * beyond the k×dim centroid table.
  */
object KMeansDet {

  private def d2(vec: Column, centroid: Column): Column =
    aggregate(zip_with(vec, centroid, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid assignment; output = corpus columns + (cell, d2).
    * `array_min` over struct(d2, cell) compares lexicographically, so the
    * argmin and its lowest-cell tie-break happen inside one narrow
    * projection — the corpus is never expanded to n·k rows or shuffled.
    */
  def assign(corpus: DataFrame, cents: DataFrame,
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val centsRow = cents.agg(array_sort(collect_list(struct(col("cell"), col("centroid")))).as("_cents"))
    corpus.crossJoin(broadcast(centsRow))
      .withColumn("_best", array_min(transform(col("_cents"),
        c => struct(d2(col(vec), c.getField("centroid")).as("d2"), c.getField("cell").as("cell")))))
      .select(col(id), col(vec), col("_best.cell").as("cell"), col("_best.d2").as("d2"))
  }

  /** Elementwise mean per cell (the Lloyd update). The distributed part
    * stops at the (cell, dim) keyed means — k·dim rows; [[fit]] collects
    * those and assembles the centroid arrays driver-side, which removes
    * the second exchange + stage per Lloyd round that the old
    * groupBy(cell)+collect_list assembly cost (r13: the fit is
    * stage-latency-bound, ~0.1 s per AQE stage-job at any data size —
    * the k·dim row collect is identical bytes to collecting assembled
    * arrays). */
  def update(assigned: DataFrame, vec: String = "embedding"): DataFrame =
    assigned.select(col("cell"), posexplode(col(vec)).as(Seq("dim", "x")))
      .groupBy("cell", "dim").agg(avg(col("x").cast("double")).as("cx"))

  /** `iters` full Lloyd rounds from the deterministic seed; returns the
    * final centroid table (cell, centroid) as a LOCAL k-row DataFrame.
    *
    * Each round materializes the k×dim centroids back to the driver — the
    * standard iterative-ML shape (MLlib holds its centroids on the driver
    * too). Without the per-round collect the rounds chain into one lazy
    * lineage and EVERY downstream action replays all `iters` rounds; with
    * it each round is exactly one job over the (caller-persisted) corpus,
    * and the result costs nothing to broadcast or reuse.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int,
          id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Seq[(Int, Seq[Double])] = corpus.orderBy(col(id)).limit(k)
      .select(expr(s"transform($vec, x -> cast(x as double))").as("centroid"))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    var i = 0
    while (i < iters) {
      cents = update(assign(corpus, cents.toDF("cell", "centroid"), id, vec), vec)
        .collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toSeq
        .map { case (c, xs) => (c, xs.sortBy(_._2).map(_._3)) }
        .sortBy(_._1)
      i += 1
    }
    cents.toDF("cell", "centroid")
  }

  /** Cluster summary after `iters` rounds: per cell, member count and
    * inertia (Σ d² to the final centroid).
    */
  def summary(corpus: DataFrame, k: Int, iters: Int,
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    // the cache exists for fit()'s per-round collect jobs, which run
    // eagerly here; unpersist before returning so no cached blocks
    // outlive the call (the returned plan rescans the source once)
    val cached = corpus.select(col(id), col(vec)).persist()
    val out = assign(cached, fit(cached, k, iters, id, vec), id, vec)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"), round(sum("d2"), 6).as("inertia"))
    cached.unpersist()
    out
  }
}

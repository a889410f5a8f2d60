package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, dedup => _}
import graft.dedup.Dedup

/** Scratch profiler for heavy queries — not part of the shipped surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    t("warmup docs.count")(docs.count())
    val fp = docs.select(col("doc_id"), md5(col("text")).as("fp"))
    val gmin = fp.groupBy("fp").agg(min("doc_id").as("m"), count(lit(1)).as("c")).where(col("c") > 1)
    val exactE = fp.join(gmin, "fp").where(col("doc_id") > col("m"))
      .select(col("m").as("i"), col("doc_id").as("j"))
    println("[profile] exactE = " + t("exactE.count")(exactE.count()))
    val sig = Dedup.minhashSignatures(docs, 64)
    t("signatures.count")(sig.count())
    val nearAll = Dedup.minhashLshPairs(docs, 64, 16)
    println("[profile] cand pairs = " + t("lshPairs.count")(nearAll.count()))
    spark.sqlContext.clearCache()
    val nearE = nearAll.where(col("est_jaccard") >= 0.5).select("i", "j")
    println("[profile] nearE = " + t("nearE.count")(nearE.count()))
    spark.sqlContext.clearCache()
    val edges = exactE.union(nearE)
    t("cc")(Dedup.connectedComponents(edges).count())
    spark.sqlContext.clearCache()
    t("full q_dedup_clusters")(graft.SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count())
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Warm steady-state timing for local iteration: run the named queries
  * for N passes inside ONE JVM (same session conf as Bench) and print a
  * per-pass JSON line. Pass 1 carries JIT/codegen warmup; later passes
  * are the steady state the full 423-query suite reaches anyway. Not part
  * of the driver contract — Bench remains the measured artifact.
  * Usage: runMain graft.BenchLoop <passes> <query> [query ...]
  */
object BenchLoop {
  def main(args: Array[String]): Unit = {
    val passes = args(0).toInt
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the opt-in event log fails session startup if the dir is absent
    if (sys.env.get("SPARK_GRAFT_EVENTLOG").contains("true"))
      try java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG_DIR", "/tmp/graft-eventlog")))
      catch { case _: Exception => }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.compress", "false")
      .config("spark.eventLog.dir", sys.env.getOrElse("SPARK_GRAFT_EVENTLOG_DIR", "/tmp/graft-eventlog"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries.get("q_metrics").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    (1 to passes).foreach { p =>
      val times = names.map { name =>
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[benchloop] $name FAILED: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sqlContext.clearCache()
        Scratch.sweep()
        name -> dt
      }
      println(s"""{"pass":$p,${times.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",")}}""")
    }
    spark.stop()
  }
}

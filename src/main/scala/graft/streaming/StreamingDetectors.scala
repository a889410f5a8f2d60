package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the detectors: the same semantics as the
  * batch operators, expressed as watermarked stream transformations. At
  * scale these run keyed-parallel exactly like the batch plans — state is
  * partitioned by series key in the state store.
  */
object StreamingDetectors {

  case class Point(event_type: String, ts: java.sql.Timestamp, value: Double)
  case class Changepoint(event_type: String, ts: java.sql.Timestamp, n: Long, cum: Double, zscore: Double)

  case class CusumState(n: Long, mean: Double, m2: Double, cum: Double)

  /** Streaming z-score against a (small, broadcast) static baseline of
    * per-series mean/std — the streaming twin of Detectors.outlierZscore.
    * Stream-static join keeps the stream side shuffle-free.
    */
  def zscoreAgainstBaseline(stream: DataFrame, baseline: DataFrame, z: Double = 3.0,
                            watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .join(broadcast(baseline), Seq("event_type"))
      .withColumn("z", (col("value") - col("mu")) / col("sigma"))
      .where(abs(col("z")) > z)

  /** Watermarked tumbling-window resample — the streaming twin of
    * TS.resample: emits one (series, window, sum, count) row per closed
    * window.
    */
  def windowedResample(stream: DataFrame, every: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), every))
      .agg(sum("value").as("value"), count(lit(1)).as("n"))
      .select(col("event_type"), col("window.start").as("ts"), col("value"), col("n"))

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class EwmaPoint(event_type: String, ts: java.sql.Timestamp, value: Double,
                       ewma: Double, deviation: Double, flagged: Boolean)
  case class EwmaState(num: Double, den: Double, n: Long)

  /** Streaming exact dedup — the streaming twin of Dedup.exact: md5
    * content fingerprint + dropDuplicatesWithinWatermark, so the state
    * store only retains fingerprints inside the watermark horizon
    * (bounded state at any ingest rate).
    */
  def dedupExact(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream.withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stateful adjusted EWMA per series (streaming twin of TS.ewma):
    * carries the (num, den) recurrence in keyed state, emits each point
    * with its smoothed level and flags deviations beyond `k`× the level.
    */
  def ewmaTracker(points: Dataset[Point], alpha: Double = 0.2, k: Double = 0.5): Dataset[EwmaPoint] = {
    import points.sparkSession.implicits._
    val b = 1.0 - alpha
    points.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Point], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, 0.0, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[EwmaPoint]
          it.toSeq.sortBy(_.ts.getTime).foreach { p =>
            val num = st.num * b + p.value
            val den = st.den * b + 1.0
            val level = num / den
            val dev = if (level != 0) math.abs(p.value - level) / math.abs(level) else 0.0
            out += EwmaPoint(key, p.ts, p.value, level, dev, st.n >= 5 && dev > k)
            st = EwmaState(num, den, st.n + 1)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Online CUSUM via flatMapGroupsWithState: per series, maintain running
    * mean/variance (Welford) and the cumulative deviation; emit a
    * changepoint and reset when |cum| exceeds `k`·σ·√n.
    */
  def cusum(points: Dataset[Point], k: Double = 3.0): Dataset[Changepoint] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Point], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0.0, 0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Changepoint]
          it.toSeq.sortBy(_.ts.getTime).foreach { p =>
            val n = st.n + 1
            val d = p.value - st.mean
            val mean = st.mean + d / n
            val m2 = st.m2 + d * (p.value - mean)
            val cum = st.cum + (p.value - mean)
            val sigma = math.sqrt(if (n > 1) m2 / (n - 1) else 0.0)
            val bound = k * sigma * math.sqrt(n.toDouble)
            if (n > 10 && sigma > 0 && math.abs(cum) > bound) {
              out += Changepoint(key, p.ts, n, cum, cum / (sigma * math.sqrt(n.toDouble)))
              st = CusumState(0L, 0.0, 0.0, 0.0) // restart after a confirmed change
            } else {
              st = CusumState(n, mean, m2, cum)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

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

  case class PhState(n: Long, mean: Double, cum: Double, mn: Double, alarmed: Boolean)
  case class PhAlarm(event_type: String, ts: java.sql.Timestamp, n: Long, gap: Double, lambda: Double)
  case class PhPoint(event_type: String, ts: java.sql.Timestamp, value: Double,
                     delta: Double, lambda: Double)

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

  case class BarPoint(event_type: String, ts: java.sql.Timestamp, event_id: Long, value: Double)

  /** Streaming OHLC + volume bar builder — the in-flight twin of
    * q_ohlc_bars (BizQueries-adjacent market-data shape): watermarked
    * tumbling windows; open/close via min_by/max_by on the (ts, event_id)
    * order, so the bar is deterministic under any arrival order. State is
    * one row per open (series, window); closed bars emit exactly once in
    * append mode.
    */
  def ohlcBars(stream: DataFrame, every: String = "1 hour",
               watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), every))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n_events"), sum("value").as("v_sum"))
      .select(col("event_type"), col("window.start").as("ts"),
        col("open"), col("close"), col("high"), col("low"),
        col("n_events"), col("v_sum"))

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class SourcedDoc(doc_id: Long, ts: java.sql.Timestamp, source: String, text: String)
  case class LangDoc(doc_id: Long, ts: java.sql.Timestamp, lang: String, text: String)

  /** Streaming calibration monitor for a deployed quality classifier:
    * every arriving doc is scored with the broadcast five-double model
    * (the q_quality_logreg fit) and lands in its fixed-width probability
    * bin; per tumbling window the op emits the ECE bin counters —
    * (n, n_pos, Σ round(p·1e6)) per bin, i.e. ≤10 counters of state per
    * open window, with the scaled-integer predicted-probability sum
    * order-free across state-store merges. A drifting live ECE is the
    * first sign the scorer no longer matches the incoming distribution —
    * the streaming twin of q_calibration.
    */
  def calibMonitor(stream: DataFrame,
                   b1: Double, b2: Double, b3: Double, b4: Double, b5: Double,
                   stop: Seq[String], every: String = "1 hour"): DataFrame = {
    import graft.text.TextFunctions
    stream
      .withColumn("y", (col("lang") === "en").cast("int"))
      .withColumn("x1", TextFunctions.alphaRatio(col("text")))
      .withColumn("x2", TextFunctions.meanTokenLen(col("text")) / lit(10.0))
      .withColumn("x3", TextFunctions.stopwordRatio(col("text"), stop))
      .withColumn("x4", least(TextFunctions.nTokens(col("text")).cast("double") / 100, lit(1.0)))
      .withColumn("eta",
        lit(b1) + lit(b2) * col("x1") + lit(b3) * col("x2") + lit(b4) * col("x3") + lit(b5) * col("x4"))
      .withColumn("p", expr("1.0E0 / (1.0E0 + exp(-eta))"))
      .withColumn("bin", least(floor(col("p") * 10), lit(9.0)).cast("int"))
      .withColumn("p6", round(col("p") * 1e6).cast("long"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), every), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("y").cast("long").as("n_pos"),
        sum("p6").as("sum_p6"))
      .select(col("window.start").as("win"), col("bin"),
        col("n_docs"), col("n_pos"), col("sum_p6"))
  }

  /** Streaming ingest telemetry: per-(source, window) doc/token/byte
    * accounting — the rate meter a pretraining ingest runs alongside the
    * quality gate (budget tracking for q_mix_weights-style mixture
    * planning). Watermarked tumbling windows with map-side partial
    * aggregation; state is one row per open (source, window), closed
    * windows emit exactly once in append mode.
    */
  def tokenMeter(stream: DataFrame, every: String = "1 hour",
                 watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col("source"), window(col("ts"), every))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .select(col("source"), col("window.start").as("ts"),
        col("n_docs"), col("n_tokens"), col("n_chars"))
  /** Streaming heavy-hitter meter: per tumbling window, a Misra–Gries
    * candidate summary of the token stream (expressions/Sketches.scala
    * MisraGriesAgg — ≤ `capacity` keys of state per open window, merged
    * associatively across tasks like any streaming aggregate) plus the
    * exact window token count. Every token with in-window share >
    * 1/(capacity+1) is GUARANTEED in the candidate array; a downstream
    * exact confirm restricted to candidates (the q_heavy_hitters second
    * pass) then yields a deterministic per-window heavy-hitter set. The
    * streaming form of the "what's trending right now" monitor whose
    * exact version would hold every distinct token in the state store.
    */
  def topkMeter(stream: DataFrame, capacity: Int = 256, every: String = "1 hour",
                watermark: String = "2 hours"): DataFrame =
    stream
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), every))
      .agg(graft.expressions.mg_candidates(col("tok"), capacity).as("cands"),
        count(lit(1)).as("n_tokens"))
      .select(col("window.start").as("ts"), col("cands"), col("n_tokens"))

  /** Streaming windowed quantiles: per-(key, window) p50/p90/p99 latency
    * estimates from a fixed-width histogram sketch — the q_sketch_quantiles
    * two-pass shape with the range pass served from a store. Each value
    * buckets map-side against the broadcast (key, lo, hi) range relation
    * (fit batch-side, the psiMonitor store discipline), the window
    * aggregates `buckets` longs of mergeable counter state
    * (expressions/Sketches.scala HistSketchAgg — exact streaming
    * quantiles would hold or sort every value), and the closed window
    * folds its counts array once into the three bucket indices. Estimator
    * math is the batch operator's verbatim: midpoint of the first bucket
    * whose cumulative count reaches q·n, error ≤ range/buckets.
    */
  def quantileMeter(stream: DataFrame, ranges: DataFrame, buckets: Int = 512,
                    every: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val b = buckets
    val bucket =
      when(col("hi") === col("lo"), lit(0L)).otherwise(
        least(floor((col("value") - col("lo")) * b.toDouble / (col("hi") - col("lo"))), lit(b - 1.0))
          .cast("long"))
    val agged = stream.withWatermark("ts", watermark)
      .join(broadcast(ranges), Seq("event_type"))
      .withColumn("bucket", bucket)
      .groupBy(col("event_type"), window(col("ts"), every))
      .agg(graft.expressions.hist_sketch(col("bucket"), b).as("cnts"),
        count(lit(1)).as("n"), first("lo").as("lo"), first("hi").as("hi"))
    // one fold over the counts array: running cum + first bucket index
    // reaching q·n for each of the three quantiles (−1 = not yet seen)
    val init = struct(lit(0L).as("i"), lit(0L).as("cum"),
      lit(-1L).as("b50"), lit(-1L).as("b90"), lit(-1L).as("b99"))
    def step(acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) = {
      val i = acc.getField("i")
      val cum2 = acc.getField("cum") + x
      def pick(prev: org.apache.spark.sql.Column, q: Double) =
        when(prev >= 0, prev)
          .otherwise(when(cum2.cast("double") >= lit(q) * col("n"), i).otherwise(lit(-1L)))
      struct((i + 1L).as("i"), cum2.as("cum"),
        pick(acc.getField("b50"), 0.5).as("b50"),
        pick(acc.getField("b90"), 0.9).as("b90"),
        pick(acc.getField("b99"), 0.99).as("b99"))
    }
    def est(bIdx: org.apache.spark.sql.Column) =
      round(col("lo") + (bIdx.cast("double") + 0.5) * ((col("hi") - col("lo")) / b.toDouble), 6)
    agged
      .withColumn("qb", aggregate(col("cnts"), init, step))
      .select(col("event_type"), col("window.start").as("ts"), col("n"),
        est(col("qb.b50")).as("p50_est"),
        est(col("qb.b90")).as("p90_est"),
        est(col("qb.b99")).as("p99_est"))
  }

  /** Streaming error-budget burn monitor — the q_burn_rate twin. The
    * trailing-6 h error share comes from ONE sliding-window aggregation
    * (6 h duration, 1 h slide): each event lands in six open windows,
    * each holding two counters — 16 bytes of state per open window and
    * nothing else. The batch operator's 6 h frame is a TIME range over
    * epoch seconds, so a closed window's end-hour burn equals the batch
    * trailing-6 h burn for that hour even when intermediate hours are
    * empty. The emitted `alert` gates on the 6 h burn alone; the batch
    * alert additionally requires the 1 h burn, which rides a parallel
    * tumbling aggregation the caller joins (tokenMeter shape) — callers
    * wanting the exact batch alert AND the two conditions together.
    * At an SLO target t, burn = share/t; alert when burn > `burnAlert`.
    */
  /** Streaming MOSUM level-shift monitor: hopping 24 h windows (1 h
    * slide) of the hourly value stream against a batch-fit dense-grid
    * (μ, σ, t0) store — M = (Σ_window v − 24μ)/(σ√24), |M| > 3 alarms.
    * Gap hours contribute nothing to the window sum, exactly like the
    * zero-filled dense batch twin, so streamed window sums equal the
    * dense math without the stream ever materializing gap rows. Only
    * full-span windows (end ≥ t0 + 24 h) are scored. State = one sum
    * per open (series, window) — bytes per key, closed by the
    * watermark.
    */
  def mosum(stream: DataFrame, store: DataFrame,
            watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .join(store, "event_type") // stream-static: (mu, sd, t0) per series
      .groupBy(col("event_type"), window(col("ts"), "24 hours", "1 hour"))
      .agg(sum("value").as("ws"), first("mu").as("mu"),
        first("sd").as("sd"), first("t0").as("t0"))
      .where(col("window.end") >= col("t0") + expr("INTERVAL 24 HOURS"))
      .select(col("event_type"), col("window.end").as("ts_end"), col("ws"),
        ((col("ws") - lit(24.0) * col("mu")) / (col("sd") * sqrt(lit(24.0)))).as("m"))
      .where(abs(col("m")) > 3.0)

  def burnMonitor(stream: DataFrame, sloTarget: Double = 0.2, burnAlert: Double = 1.5,
                  watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "6 hours", "1 hour"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"),
        count(lit(1)).as("n_tot"))
      .select(col("window.end").as("ts_hour_end"), col("n_err"), col("n_tot"),
        round(col("n_err").cast("double") / col("n_tot"), 6).as("share_6h"),
        round(col("n_err").cast("double") / col("n_tot") / sloTarget, 6).as("burn_6h"),
        (col("n_err").cast("double") / col("n_tot") / sloTarget > burnAlert).cast("int").as("alert"))

  case class UserEvent(event_type: String, ts: java.sql.Timestamp, user_id: Long)

  /** Streaming distinct-user meter: per-(event_type, window) HyperLogLog
    * cardinality plus the exact event count — the "unique users per hour"
    * monitor where exact streaming distinct would hold every id in the
    * state store. The HLL aggregate (expressions/Sketches.scala) keeps 64
    * BYTES of state per open (key, window) regardless of cardinality, and
    * its estimates are identical to the batch q_sketch_distinct math, so
    * a closed window's streamed value equals the batch aggregate exactly
    * (StreamingSpec proves it).
    */
  def distinctMeter(stream: DataFrame, every: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), every))
      .agg(count(lit(1)).as("n_events"),
        round(graft.expressions.hll_sketch(
          graft.text.TextFunctions.hash60(col("user_id").cast("string"))), 6).as("approx_users"))
      .select(col("event_type"), col("window.start").as("ts"),
        col("n_events"), col("approx_users"))

  /** Streaming A/B experiment health monitor — the streaming twin of
    * q_interval_ab (TwoSampleProportionIntervalDetectorModel semantics):
    * per tumbling window, each arm's active and purchasing user counts
    * are HyperLogLog estimates (4 × 64 B of state per open window — exact
    * distinct would hold every user id), the purchase-proportion z is the
    * binomial normal approximation, and ONE_SIDED_UPPER rejection fires
    * at |norm.ppf(0.05)|. Arms come from the same deterministic md5
    * parity as q_ab_test, so batch and stream agree on assignment.
    * Degenerate windows (empty arm, se = 0, or HLL estimates putting
    * p outside [0,1]) clamp to a fail-to-reject z of 0.
    */
  def abMonitor(stream: DataFrame, every: String = "1 hour",
                watermark: String = "2 hours"): DataFrame = {
    val idh = graft.text.TextFunctions.hash60(col("user_id").cast("string"))
    def users(armV: Int, onlyPurchase: Boolean) = {
      val gate = if (onlyPurchase) col("arm") === armV && col("event_type") === "purchase"
                 else col("arm") === armV
      round(graft.expressions.hll_sketch(when(gate, idh)), 6)
    }
    stream
      .withColumn("arm",
        conv(substring(md5(concat(col("user_id").cast("string"), lit(":ab1"))), 1, 1), 16, 10)
          .cast("int") % 2)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), every))
      .agg(users(0, onlyPurchase = false).as("n_a"), users(0, onlyPurchase = true).as("s_a"),
        users(1, onlyPurchase = false).as("n_b"), users(1, onlyPurchase = true).as("s_b"))
      .withColumn("p_a", expr("CASE WHEN n_a <= 0.0 THEN 0.0 ELSE least(greatest(s_a / n_a, 0.0), 1.0) END"))
      .withColumn("p_b", expr("CASE WHEN n_b <= 0.0 THEN 0.0 ELSE least(greatest(s_b / n_b, 0.0), 1.0) END"))
      .withColumn("se", expr(
        "CASE WHEN n_a <= 0.0 OR n_b <= 0.0 THEN 0.0 ELSE sqrt(p_a * (1.0 - p_a) / n_a + p_b * (1.0 - p_b) / n_b) END"))
      .withColumn("z", expr("CASE WHEN se <= 0.0 THEN 0.0 ELSE (p_b - p_a) / se END"))
      .withColumn("reject", (col("z") > 1.6448536269514722).cast("int"))
      .select(col("window.start").as("ts"), col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("z"), 6).as("z"), col("reject"))
  }

  /** Streaming PSI drift monitor — the streaming twin of q_drift_psi:
    * a trained baseline (Drift.fitEdges: per-series decile edges +
    * smoothed shares, a #series-row store) broadcast-joins the stream
    * STATELESSLY; each closed tumbling window aggregates 10 bin counters
    * per series (80 B of state per open (series, window)) and emits the
    * window's PSI against the baseline shares with the industry 0.2
    * drift flag. Binning is the same codegen'd array fold on both the
    * batch fit and the stream, so stream PSI equals the batch PSI of the
    * same window's rows exactly (StreamingSpec proves it).
    */
  def psiMonitor(stream: DataFrame, edges: DataFrame, every: String = "1 hour",
                 watermark: String = "2 hours"): DataFrame = {
    val cAggs = (0 to 9).map(b => sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b")) :+
      first(col("p")).as("p")
    stream.withWatermark("ts", watermark)
      .join(broadcast(edges), Seq("event_type"))
      .withColumn("bin", graft.detectors.Drift.binOf("value"))
      .groupBy(col("event_type"), window(col("ts"), every))
      .agg(cAggs.head, cAggs.tail: _*)
      .withColumn("n", (0 to 9).map(b => col(s"c$b")).reduce(_ + _))
      .withColumn("qs", array((0 to 9).map(b =>
        (col(s"c$b") + 0.5) / (col("n").cast("double") + 5.0)): _*))
      .withColumn("psi", round(expr(
        "aggregate(zip_with(p, qs, (a, b) -> (a - b) * ln(a / b)), 0.0D, (acc, x) -> acc + x)"), 6))
      .select(col("event_type"), col("window.start").as("ts"), col("n"),
        col("psi"), (col("psi") > 0.2).cast("int").as("drift"))
  }

  case class EwmaPoint(event_type: String, ts: java.sql.Timestamp, value: Double,
                       ewma: Double, deviation: Double, flagged: Boolean)
  case class EwmaState(num: Double, den: Double, n: Long)

  case class KalmanPoint(event_type: String, ts: java.sql.Timestamp, value: Double,
                         level: Double, pvar: Double, flagged: Boolean)
  case class KalmanState(l: Double, p: Double, ss: Double, n: Long)

  /** Stateful local-level Kalman filter per series — the streaming twin
    * of q_kalman_level (StateQueries): 32 B of keyed state carries
    * (level, variance, innovation SSE, count); each point is emitted with
    * its filtered level and a scale-free anomaly flag (innovation beyond
    * 3× its own running RMS). The recursion is IDENTICAL to the batch
    * kernel, so the final state equals q_kalman_level's output bit for
    * bit across any microbatch partitioning.
    */
  def kalmanTracker(points: Dataset[Point], q: Double = 1.0, r: Double = 10.0): Dataset[KalmanPoint] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Point], state: GroupState[KalmanState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[KalmanPoint]
          var st = state.getOption.orNull
          it.toSeq.sortBy(_.ts.getTime).foreach { pt =>
            if (st == null) {
              st = KalmanState(pt.value, r, 0.0, 1L)
              out += KalmanPoint(key, pt.ts, pt.value, st.l, st.p, flagged = false)
            } else {
              val ppred = st.p + q
              val k = ppred / (ppred + r)
              val innov = pt.value - st.l
              // prior innovations = n - 1; flag needs at least one
              val fl = st.n >= 2 && innov * innov > 9.0 * (st.ss / (st.n - 1))
              st = KalmanState(st.l + k * innov, (1 - k) * ppred,
                st.ss + innov * innov, st.n + 1)
              out += KalmanPoint(key, pt.ts, pt.value, st.l, st.p, fl)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming exact dedup — the streaming twin of Dedup.exact: md5
    * content fingerprint + dropDuplicatesWithinWatermark, so the state
    * store only retains fingerprints inside the watermark horizon
    * (bounded state at any ingest rate).
    */
  def dedupExact(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream.withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dedup against a static corpus band store — the 100 TB
    * ingest shape: incoming docs get their MinHash signature map-side
    * (Dedup.withSignatures, no aggregation), explode to banded keys, and a
    * stream-static key-equality join against the corpus's
    * (band, b0..bR, corpus_id) store flags band collisions. Stateless —
    * corpus state lives in the store table (bucketable by band keys),
    * never in the stream's state store or driver memory. Emits one row
    * per (incoming doc, colliding band, corpus doc); downstream either
    * drops flagged docs or routes them to exact verification.
    */
  def nearDedupAgainstStore(stream: DataFrame, store: DataFrame,
                            numPerms: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numPerms / bands
    val sig = graft.dedup.Dedup.withSignatures(stream, Seq("doc_id", "ts"), numPerms)
    val bandCols = (0 until bands).map { b =>
      struct((lit(b).as("band") +:
        (0 until rows).map(r => col(s"mh${b * rows + r}").as(s"b$r"))): _*)
    }
    val bKeys = "band" +: (0 until rows).map(r => s"b$r")
    sig.select(col("doc_id"), col("ts"), explode(array(bandCols: _*)).as("bd"))
      .select((col("doc_id") +: col("ts") +: bKeys.map(kk => col(s"bd.$kk").as(kk))): _*)
      .join(store, bKeys)
      .where(col("doc_id") =!= col("corpus_id"))
      .select(col("doc_id"), col("ts"), col("corpus_id"), col("band"))
  }

  /** Build the corpus-fingerprint bloom filter for [[bloomGate]]: ONE
    * distributed pass over the fingerprint store (map-side partial bloom
    * merge via bloom_filter_build); only the finished bits come back —
    * KBs here, MBs for a billion fingerprints. Rebuild it whenever the
    * corpus store is compacted; between rebuilds it serves every
    * microbatch as a constant.
    */
  def corpusBloom(corpusFps: DataFrame, expectedItems: Long, numBits: Long): Array[Byte] =
    corpusFps
      .agg(graft.expressions.bloom_filter_build(xxhash64(col("fp")), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Streaming bloom pre-filter — the streaming twin of q_dedup_bloom:
    * each incoming doc probes the corpus-fingerprint bloom MAP-SIDE
    * (stateless, zero shuffle, nothing in the state store; the bits ride
    * the task binary as a constant). `maybe_dup` = false is definitive
    * (blooms have no false negatives) — those docs skip the exact confirm
    * join entirely; positives route to an exact fingerprint join or
    * [[nearDedupAgainstStore]]. This is the shape that holds when the
    * corpus is 100 TB and the stream is fast: per-doc cost is one hash +
    * k bit probes, and the only corpus state in the hot path is the
    * filter itself.
    */
  def bloomGate(stream: DataFrame, bloomBits: Array[Byte]): DataFrame = {
    // corpusBloom over an EMPTY fingerprint store returns null
    // (bloom_filter_agg of zero rows is NULL); a null filter would probe
    // NULL and silently drop every doc from both routing branches. An
    // empty corpus means nothing can be a duplicate: probe constant-false.
    val probe =
      if (bloomBits == null) lit(false)
      else graft.expressions.bloom_might_contain(lit(bloomBits), xxhash64(col("fp")))
    stream.withColumn("fp", md5(col("text")))
      .withColumn("maybe_dup", probe)
  }

  /** Stateless streaming quality gate — the q_doc_filter rule cascade as
    * an ingest-time filter: every signal is per-row column math (no
    * state, no shuffle, no watermark needed), so the gate composes in
    * front of [[dedupExact]] / [[nearDedupAgainstStore]] at any ingest
    * rate. The batch filter's corpus-level top-2-gram coverage needs an
    * aggregation, so the stream variant uses the map-side equivalent:
    * the duplicated-2-gram fraction within the document (array HOFs over
    * the word list). Emits every doc with its signals, keep flag, and
    * first-failing-rule reason — route on `keep` downstream.
    */
  def qualityGate(stream: DataFrame): DataFrame = {
    import graft.text.TextFunctions
    // the repetition signal runs as the codegen'd dup_bigram_frac
    // expression — one hash pass per doc instead of the HOF gram
    // construction (measured 11× cheaper; this is the per-document cost
    // every ingested row pays)
    stream
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("n_words", size(col("_ws")).cast("long"))
      .withColumn("mtl", TextFunctions.meanTokenLen(col("text")))
      .withColumn("alpha", TextFunctions.alphaRatio(col("text")))
      .withColumn("rep", graft.expressions.dup_bigram_frac(col("_ws")))
      .withColumn("fail_reason",
        when(col("n_words") < 10, "too_short")
          .when(col("n_words") > 1000, "too_long")
          .when(col("mtl") < 2.0 || col("mtl") > 12.0, "token_len")
          .when(col("alpha") < 0.5, "low_alpha")
          .when(col("rep") >= 0.5, "repetitive")
          .otherwise("ok"))
      .select(col("doc_id"), col("ts"), col("text"), col("n_words"),
        round(col("mtl"), 6).as("mean_token_len"),
        round(col("alpha"), 6).as("alpha_ratio"),
        round(col("rep"), 6).as("dup2_frac"),
        (col("fail_reason") === "ok").as("keep"), col("fail_reason"))
  }

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

  case class UPoint(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Point-in-time feature index for streaming enrichment: per user, the
    * CLOSED hourly feature history as ONE sorted array row
    * (avail_s = bucket end, n, sum). The whole as-of lookup problem
    * becomes a broadcastable (or bucketed) key-value table whose row size
    * is bounded by the history window — the serving-store shape of a
    * feature platform.
    */
  def pitFeatureIndex(staticEvents: DataFrame, eventType: String = "click"): DataFrame =
    staticEvents.where(col("event_type") === eventType)
      .groupBy(col("user_id"),
        (date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR")).as("avail"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        unix_timestamp(col("avail")).as("avail_s"), col("n"), col("sum")))).as("feats"))

  /** Streaming point-in-time enrichment — the streaming twin of the batch
    * q_pit_features as-of join: each arriving event picks up the LATEST
    * closed feature bucket with avail_s ≤ event time via an array
    * filter + tail lookup on the joined index row. Stateless (plain
    * stream-static join + per-row column math), no watermark-bounded
    * state, no per-event aggregation — the leakage guarantee (only CLOSED
    * buckets visible) is carried by the index's availability stamps.
    */
  def pitEnrich(stream: DataFrame, featIndex: DataFrame): DataFrame =
    stream.join(broadcast(featIndex), Seq("user_id"), "left")
      .withColumn("_elig", filter(col("feats"), f => f.getField("avail_s") <= unix_timestamp(col("ts"))))
      .withColumn("_f", when(size(col("_elig")) > 0, element_at(col("_elig"), -1)))
      .select(col("user_id"), col("ts"), col("value"),
        col("_f.avail_s").as("feat_avail_s"), col("_f.n").as("feat_n"), col("_f.sum").as("feat_sum"))

  /** Streaming sessionization — the streaming twin of
    * [[graft.TS.sessionize]]: Spark's native session windows merge events
    * closer than `gap` and close a session `gap` after its last event, so
    * the emitted session set equals the batch gap-islands (both split at
    * inactivity ≥ gap). Watermark bounds session state; output carries
    * (key, start, end, n_events, sum_value) per CLOSED session.
    */
  def sessionWindows(stream: DataFrame, key: String = "user_id", gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col(key), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col(key), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"), col("sum_value"))

  case class BocpdState(t: Long, rProb: Seq[Double], rMu: Seq[Double], rV: Seq[Double],
                        lagTs: Seq[Long])
  case class ChangeProbPoint(event_type: String, ts: java.sql.Timestamp, change_prob: Double)
  case class PointWithPriors(event_type: String, ts: java.sql.Timestamp, value: Double,
                             mu0: Double, v0: Double, sigma2: Double)

  /** Streaming Bayesian Online Changepoint Detection (Normal
    * unknown-mean model) — the streaming twin of
    * [[graft.detectors.Bocpd.changeProbWithPriors]], same recurrence
    * carried point-by-point in keyed state.
    *
    * Priors come in as a trained per-series baseline TABLE (like
    * [[zscoreAgainstBaseline]]'s mean/std table) with columns
    * (event_type, mu0, v0, sigma2) — [[graft.detectors.DetectorStore
    * .bocpdPriorsTable]] produces exactly this shape. They reach the
    * stateful operator through a stream-static broadcast join, so priors
    * state lives executor-side and scales to millions of series without
    * a driver-side map riding the closure. Emission follows the batch
    * lag convention —
    * point t's probability P(r_{t+lag} = lag) is emitted once `lagN`
    * later points have been seen, so the stream output matches the batch
    * array element-for-element (the not-yet-confirmable tail is simply
    * not emitted yet).
    *
    * State per series is the run-length posterior; `maxRun` bounds it by
    * collapsing tail mass into the last retained run (the standard
    * Adams–MacKay pruning), so state is O(maxRun) per key forever —
    * below `maxRun` points the recurrence is EXACT, which is what the
    * replay spec checks.
    *
    * Contract: a series whose key has NO row in `priors` emits nothing —
    * the stream-static inner join drops it (an untrained series cannot
    * be scored; the batch path derives its priors from the full
    * history). Fit baselines for new keys and restart, or add a
    * catch-all prior row under the expected keys.
    */
  def bocpd(points: Dataset[Point], priors: DataFrame,
            hazard: Double = 0.01, lagN: Int = 10, maxRun: Int = 512): Dataset[ChangeProbPoint] = {
    import points.sparkSession.implicits._
    points.join(broadcast(priors), Seq("event_type")).as[PointWithPriors]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[PointWithPriors], state: GroupState[BocpdState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ChangeProbPoint]
          var st = state.getOption.getOrElse(BocpdState(0L, Nil, Nil, Nil, Nil))
          for (pt <- it.toSeq.sortBy(_.ts.getTime)) {
            val p = graft.detectors.Bocpd.Priors(pt.mu0, pt.v0, pt.sigma2)
            val x = pt.value
            if (st.t == 0L) {
              st = BocpdState(1L,
                Seq(1.0),
                Seq(p.mu0 + (x - p.mu0) * (p.v0 / (p.v0 + p.sigma2))),
                Seq(1.0 / (1.0 / p.v0 + 1.0 / p.sigma2)),
                Seq(pt.ts.getTime))
            } else {
              val k = st.rProb.length
              val growth = new Array[Double](k)
              var cp = 0.0
              var i = 0
              while (i < k) {
                val pv = st.rV(i) + p.sigma2
                val d = x - st.rMu(i)
                val pred = math.exp(-0.5 * d * d / pv) / math.sqrt(2 * math.Pi * pv)
                val joint = st.rProb(i) * pred
                growth(i) = joint * (1 - hazard)
                cp += joint * hazard
                i += 1
              }
              var total = cp
              i = 0; while (i < k) { total += growth(i); i += 1 }
              if (total <= 0 || total.isNaN) total = 1e-300
              val nProb = new Array[Double](k + 1)
              val nMu = new Array[Double](k + 1)
              val nV = new Array[Double](k + 1)
              val g0 = 1.0 / (1.0 / p.v0 + 1.0 / p.sigma2)
              nProb(0) = cp / total
              nV(0) = g0
              nMu(0) = g0 * (p.mu0 / p.v0 + x / p.sigma2)
              i = 0
              while (i < k) {
                nProb(i + 1) = growth(i) / total
                val g = 1.0 / (1.0 / st.rV(i) + 1.0 / p.sigma2)
                nV(i + 1) = g
                nMu(i + 1) = g * (st.rMu(i) / st.rV(i) + x / p.sigma2)
                i += 1
              }
              val lagTs = st.lagTs :+ pt.ts.getTime
              if (st.t >= lagN && lagN < nProb.length) {
                val emitIdx = st.t - lagN // series index whose prob is now confirmed
                out += ChangeProbPoint(key, new java.sql.Timestamp(lagTs.head),
                  if (emitIdx == 0L) 0.0 else nProb(lagN)) // first point is never a cp
              }
              // Adams–MacKay pruning: collapse tail mass into the last kept run
              val (pr, mu, v) =
                if (nProb.length > maxRun + 1) {
                  val keep = maxRun + 1
                  val tailMass = nProb.drop(keep).sum
                  val pp = nProb.take(keep); pp(keep - 1) += tailMass
                  (pp.toSeq, nMu.take(keep).toSeq, nV.take(keep).toSeq)
                } else (nProb.toSeq, nMu.toSeq, nV.toSeq)
              st = BocpdState(st.t + 1, pr, mu, v, lagTs.takeRight(lagN))
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Online CUSUM via flatMapGroupsWithState: per series, maintain running
    * mean/variance (Welford) and the cumulative deviation; emit a
    * changepoint and reset when |cum| exceeds `k`·σ·√n.
    */
  case class SpcAlarm(event_type: String, ts: java.sql.Timestamp, value: Double,
                      z: Double, r1: Int, r2: Int, r3: Int, r4: Int)
  case class SpcState(recent: List[Double])

  /** Streaming Western Electric run rules — the streaming twin of
    * q_spc_rules: baselines (per-series mu/sigma, the DetectorStore
    * shape) join STATELESSLY; the only keyed state is the trailing
    * EIGHT z-scores per series (a ring buffer — the longest rule
    * lookback), so state is 64 bytes/series at any rate. Rules match
    * the batch operator exactly: 1>3σ, 2-of-3>2σ same side, 4-of-5>1σ
    * same side, 8 consecutive same side; only alarms are emitted.
    */
  def spcRules(stream: DataFrame, baseline: DataFrame): Dataset[SpcAlarm] = {
    import stream.sparkSession.implicits._
    val scored = stream.join(broadcast(baseline), Seq("event_type"))
      .withColumn("z", (col("value") - col("mu")) / col("sigma"))
      .select(col("event_type"), col("ts"), col("value"), col("z"))
      .as[(String, java.sql.Timestamp, Double, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, java.sql.Timestamp, Double, Double)],
         state: GroupState[SpcState]) =>
          var recent = state.getOption.map(_.recent).getOrElse(Nil) // newest first
          val out = scala.collection.mutable.ArrayBuffer.empty[SpcAlarm]
          it.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v, z) =>
            recent = (z :: recent).take(8)
            def cnt(w: Int, f: Double => Boolean) = recent.take(w).count(f)
            val r1 = if (math.abs(z) > 3.0) 1 else 0
            val r2 = if ((cnt(3, _ > 2.0) >= 2 && z > 2.0) ||
              (cnt(3, _ < -2.0) >= 2 && z < -2.0)) 1 else 0
            val r3 = if ((cnt(5, _ > 1.0) >= 4 && z > 1.0) ||
              (cnt(5, _ < -1.0) >= 4 && z < -1.0)) 1 else 0
            val r4 = if (cnt(8, _ > 0.0) == 8 || cnt(8, _ < 0.0) == 8) 1 else 0
            if (r1 + r2 + r3 + r4 > 0) out += SpcAlarm(key, ts, v, z, r1, r2, r3, r4)
          }
          state.update(SpcState(recent))
          out.iterator
      }
  }

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

  /** Streaming Page-Hinkley drift monitor — the q_page_hinkley twin.
    * Thresholds (δ, λ) come from a TRAINED per-series baseline (the
    * Drift.fitEdges / DetectorStore shape: a #series-row table the
    * caller broadcast-joins onto the stream to build [[PhPoint]]s), so
    * the stream side is stateless until the keyed recursion; the ONLY
    * keyed state is (n, running mean, cum, min, alarmed) — 33 bytes per
    * series regardless of stream length. Emits one alarm row per series
    * at the FIRST λ crossing (the batch operator's convention) and then
    * goes quiet; the recursion is the batch kernel's float sequence
    * exactly, so a chronological replay reproduces the batch alarm
    * point bit-for-bit (StreamingSpec proves it).
    */
  def pageHinkley(points: Dataset[PhPoint]): Dataset[PhAlarm] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[PhPoint], state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(PhState(0L, 0.0, 0.0, 0.0, alarmed = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[PhAlarm]
          it.toSeq.sortBy(_.ts.getTime).foreach { p =>
            if (!st.alarmed) {
              val n = st.n + 1
              val mean = st.mean + (p.value - st.mean) / n
              val cum = st.cum + (p.value - mean - p.delta)
              val mn = if (cum < st.mn) cum else st.mn
              val gap = cum - mn
              if (gap > p.lambda) {
                out += PhAlarm(key, p.ts, n, gap, p.lambda)
                st = PhState(n, mean, cum, mn, alarmed = true)
              } else st = PhState(n, mean, cum, mn, alarmed = false)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

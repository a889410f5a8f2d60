package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Panel econometrics over the hourly event series — the
  * direct-coupling / information-flow / random-walk battery next to
  * q_granger and q_xcorr:
  *
  *  - `q_partial_corr` — partial correlations via the precision matrix:
  *    Ω = S⁻¹ over the balanced panel (hours where every series
  *    reports), pcorr_ij = −Ω_ij/√(Ω_ii·Ω_jj) — "which series couple
  *    DIRECTLY, not through a third". The covariance matrix is
  *    ≤#series² driver state (q_stationary_dist discipline), snapped at
  *    6 dp before a no-pivot Gauss-Jordan inverse that replays the
  *    models/GaussJordan divide-then-multiply float sequence verbatim;
  *    the oracle runs the identical elimination via GaussJordan.sqlAug
  *    with an identity augmentation.
  *  - `q_transfer_entropy` — directional information flow on binarized
  *    hourly directions (Schreiber 2000): TE(X→Y) =
  *    Σ p(y_t,y_{t−1},x_{t−1})·ln[p(y_t|y_{t−1},x_{t−1})/p(y_t|y_{t−1})]
  *    — the nonlinear, asymmetric companion to q_granger. Every
  *    probability is a ratio of BIGINT counts (identical doubles on
  *    both engines); gaps in the hourly grid drop out naturally because
  *    directions require the exact previous hour.
  *  - `q_variance_ratio` — Lo-MacKinlay variance-ratio test (1988):
  *    VR(q) = Var(q-period diff)/(q·Var(1-period diff)) with the
  *    homoskedastic z; VR < 1 = mean reversion, > 1 = trending. Moments
  *    2-dp-snapped, q = 4 hours.
  */
object PanelQueries {

  private val H = Tables.hourlySql
  private val Hc = Tables.hourlyCappedSql // pair-query series budget

  /** Variance-ratio horizon (hours). */
  private val Q = 4

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_partial_corr" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val kAll = hourly.select(countDistinct("event_type")).collect()(0).getLong(0).toInt
      val full = hourly.groupBy("ts").agg(count(lit(1)).as("kk"))
        .where(col("kk") === kAll).select("ts")
      val h = hourly.join(full, "ts")
      val a = h.select(col("event_type").as("ta"), col("ts"), col("value").as("va"))
      val b = h.select(col("event_type").as("tb"), col("ts"), col("value").as("vb"))
      val mom = a.join(b, "ts").where(col("ta") <= col("tb"))
        .groupBy("ta", "tb").agg(
          count(lit(1)).as("n"),
          round(sum("va"), 4).as("sa"), round(sum("vb"), 4).as("sb"),
          round(sum(col("va") * col("vb")), 2).as("sab"))
        .collect() // ≤ k(k+1)/2 rows — bounded by #series², never row-scale
      import s.implicits._
      if (mom.isEmpty) {
        // degenerate panel (no hour where every series reports): empty result
        Seq.empty[(String, String, Long, Double, Double, Double)]
          .toDF("ta", "tb", "n_obs", "cov", "corr", "pcorr")
      } else {
      val names = mom.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
      val k = names.length
      val idx = names.zipWithIndex.toMap
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cov = Array.ofDim[Double](k, k)
      mom.foreach { r =>
        val (i, j) = (idx(r.getString(0)), idx(r.getString(1)))
        val n = r.getLong(2).toDouble
        val c = r6((r.getDouble(5) - r.getDouble(3) * r.getDouble(4) / n) / (n - 1.0))
        cov(i)(j) = c; cov(j)(i) = c
      }
      val nObs = mom.head.getLong(2)
      // augmented [S | I], eliminated with the EXACT GaussJordan.sqlAug
      // float sequence (divide-then-multiply, all updates from the old m)
      val cols = 2 * k
      var m = Array.tabulate(k, cols) { (i, j) =>
        if (j < k) cov(i)(j) else if (j - k == i) 1.0 else 0.0
      }
      var step = 1
      while (step <= k) {
        val s0 = step - 1
        val piv = m(s0)(s0)
        m = Array.tabulate(k, cols) { (r, c) =>
          if (r == s0) m(r)(c) / piv
          else m(r)(c) - m(r)(s0) * (m(s0)(c) / piv)
        }
        step += 1
      }
      val omega = Array.tabulate(k, k)((i, j) => m(i)(j + k))
      (for (i <- 0 until k; j <- (i + 1) until k) yield {
        val corr = cov(i)(j) / math.sqrt(cov(i)(i) * cov(j)(j))
        val pc = -omega(i)(j) / math.sqrt(omega(i)(i) * omega(j)(j))
        (names(i), names(j), nObs, cov(i)(j), r6(corr), r6(pc))
      }).toDF("ta", "tb", "n_obs", "cov", "corr", "pcorr")
      }
    }),

    "q_transfer_entropy" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val prev = hourly.select(col("event_type"), (col("ts") + expr("INTERVAL 1 HOUR")).as("ts"),
        col("value").as("pv"))
      val dirs = hourly.join(prev, Seq("event_type", "ts"))
        .select(col("event_type"), col("ts"), (col("value") > col("pv")).cast("int").as("d"))
      val cur = dirs.select(col("event_type").as("ty"), col("ts"), col("d").as("dy"))
      val lagY = dirs.select(col("event_type").as("ty"), (col("ts") + expr("INTERVAL 1 HOUR")).as("ts"),
        col("d").as("dyl"))
      val lagX = dirs.select(col("event_type").as("tx"), (col("ts") + expr("INTERVAL 1 HOUR")).as("ts"),
        col("d").as("dxl"))
      val triples = cur.join(lagY, Seq("ty", "ts"))
        .join(lagX, "ts").where(col("tx") =!= col("ty"))
      val cells = triples.groupBy("ty", "tx", "dy", "dyl", "dxl").agg(count(lit(1)).as("c"))
      val wp = Window.partitionBy("ty", "tx")
      val wYl = Window.partitionBy("ty", "tx", "dyl")
      val wYlXl = Window.partitionBy("ty", "tx", "dyl", "dxl")
      val wYYl = Window.partitionBy("ty", "tx", "dy", "dyl")
      cells
        .withColumn("nn", sum("c").over(wp))
        .withColumn("cyl", sum("c").over(wYl))
        .withColumn("cylxl", sum("c").over(wYlXl))
        .withColumn("cyyl", sum("c").over(wYYl))
        .withColumn("term", (col("c").cast("double") / col("nn")) *
          log((col("c").cast("double") * col("cyl")) /
            (col("cylxl").cast("double") * col("cyyl"))))
        .groupBy(col("tx").as("source"), col("ty").as("target"))
        .agg(first("nn").as("n_obs"), round(sum("term"), 6).as("te"))
    }),

    "q_variance_ratio" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val base = Tables.hourlyEvents(s, dir).drop("n")
        .withColumn("d1", col("value") - lag("value", 1).over(w))
        .withColumn("dq", col("value") - lag("value", Q).over(w))
        .where(col("dq").isNotNull)
      base.groupBy("event_type").agg(
        count(lit(1)).cast("double").as("n"),
        round(sum("d1"), 2).as("s1"), round(sum(col("d1") * col("d1")), 2).as("ss1"),
        round(sum("dq"), 2).as("sq"), round(sum(col("dq") * col("dq")), 2).as("ssq"))
        .withColumn("v1", expr("(ss1 - s1 * s1 / n) / (n - 1)"))
        .withColumn("vq", expr("(ssq - sq * sq / n) / (n - 1)"))
        .withColumn("vr", expr(s"vq / ($Q * v1)"))
        .withColumn("z", expr(
          s"(vr - 1) / sqrt(2.0 * (2 * $Q - 1) * ($Q - 1) / (3.0 * $Q * n))"))
        .select(col("event_type"), col("n").cast("long").as("n_obs"),
          round(col("vr"), 6).as("vr"), round(col("z"), 6).as("z"),
          when(abs(col("z")) >= 1.96, 1).otherwise(0).as("rejects_rw"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_partial_corr" -> {
      val k = 5 // panel width: the testdata's event-type vocabulary
      val cols = 2 * k
      val omg = (1 to k).map(j => s"b$j").mkString(", ")
      s"""WITH RECURSIVE hourly AS ($Hc),
         |full_ts AS (SELECT ts FROM hourly GROUP BY ts HAVING count(*) = $k),
         |h AS (SELECT e.* FROM hourly e JOIN full_ts USING (ts)),
         |mom AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |    count(*)::BIGINT AS n,
         |    round(sum(a.value), 4) AS sa, round(sum(b.value), 4) AS sb,
         |    round(sum(a.value * b.value), 2) AS sab
         |  FROM h a JOIN h b ON a.ts = b.ts AND a.event_type <= b.event_type
         |  GROUP BY 1, 2),
         |cv AS (SELECT ta, tb, n,
         |    round((sab - sa * sb / n) / (n - 1.0), 6) AS c
         |  FROM mom),
         |names AS (SELECT st, row_number() OVER (ORDER BY st) AS i FROM
         |  (SELECT DISTINCT ta AS st FROM cv)),
         |grid AS (SELECT a.i AS i, b.i AS j,
         |    coalesce(c1.c, c2.c) AS c
         |  FROM names a CROSS JOIN names b
         |    LEFT JOIN cv c1 ON c1.ta = a.st AND c1.tb = b.st
         |    LEFT JOIN cv c2 ON c2.ta = b.st AND c2.tb = a.st),
         |aug AS (SELECT i, j, c FROM grid
         |        UNION ALL
         |        SELECT a.i, b.i + $k,
         |          CASE WHEN a.i = b.i THEN 1.0E0 ELSE 0.0E0 END
         |        FROM names a CROSS JOIN names b),
         |mats AS (SELECT 'g' AS event_type, list(c ORDER BY i, j) AS m FROM aug),
         |${graft.models.GaussJordan.sqlAug(k, k)},
         |om AS (SELECT $omg FROM beta),
         |pairs AS (SELECT a.st AS ta, a.i AS ia, b.st AS tb, b.i AS ib
         |          FROM names a JOIN names b ON a.i < b.i),
         |dg AS (SELECT i, c FROM grid WHERE i = j),
         |nn AS (SELECT max(n) AS n_obs FROM mom)
         |SELECT p.ta, p.tb, nn.n_obs,
         |  g.c AS cov,
         |  round(g.c / sqrt(da.c * db.c), 6) AS corr,
         |  round(-(CASE p.ib WHEN 1 THEN om.b1[p.ia] WHEN 2 THEN om.b2[p.ia]
         |            WHEN 3 THEN om.b3[p.ia] WHEN 4 THEN om.b4[p.ia]
         |            ELSE om.b5[p.ia] END)
         |    / sqrt((CASE p.ia WHEN 1 THEN om.b1[p.ia] WHEN 2 THEN om.b2[p.ia]
         |              WHEN 3 THEN om.b3[p.ia] WHEN 4 THEN om.b4[p.ia]
         |              ELSE om.b5[p.ia] END)
         |         * (CASE p.ib WHEN 1 THEN om.b1[p.ib] WHEN 2 THEN om.b2[p.ib]
         |              WHEN 3 THEN om.b3[p.ib] WHEN 4 THEN om.b4[p.ib]
         |              ELSE om.b5[p.ib] END)), 6) AS pcorr
         |FROM pairs p
         |  JOIN grid g ON g.i = p.ia AND g.j = p.ib
         |  JOIN dg da ON da.i = p.ia
         |  JOIN dg db ON db.i = p.ib
         |  CROSS JOIN om CROSS JOIN nn""".stripMargin
    },

    "q_transfer_entropy" ->
      s"""WITH hourly AS ($Hc),
         |dirs AS (SELECT a.event_type, a.ts,
         |    CASE WHEN a.value > b.value THEN 1 ELSE 0 END AS d
         |  FROM hourly a JOIN hourly b
         |    ON a.event_type = b.event_type AND b.ts = a.ts - INTERVAL 1 HOUR),
         |triples AS (SELECT y.event_type AS ty, xl.event_type AS tx,
         |    y.d AS dy, yl.d AS dyl, xl.d AS dxl
         |  FROM dirs y
         |    JOIN dirs yl ON yl.event_type = y.event_type
         |      AND yl.ts = y.ts - INTERVAL 1 HOUR
         |    JOIN dirs xl ON xl.ts = y.ts - INTERVAL 1 HOUR
         |      AND xl.event_type <> y.event_type),
         |cells AS (SELECT ty, tx, dy, dyl, dxl, count(*) AS c
         |          FROM triples GROUP BY 1, 2, 3, 4, 5),
         |mg AS (SELECT *,
         |    sum(c) OVER (PARTITION BY ty, tx) AS nn,
         |    sum(c) OVER (PARTITION BY ty, tx, dyl) AS cyl,
         |    sum(c) OVER (PARTITION BY ty, tx, dyl, dxl) AS cylxl,
         |    sum(c) OVER (PARTITION BY ty, tx, dy, dyl) AS cyyl
         |  FROM cells)
         |SELECT tx AS source, ty AS target, max(nn)::BIGINT AS n_obs,
         |  round(sum((c::DOUBLE / nn) * ln((c::DOUBLE * cyl) / (cylxl::DOUBLE * cyyl))), 6) AS te
         |FROM mg GROUP BY 1, 2""".stripMargin,

    "q_variance_ratio" ->
      s"""WITH hourly AS ($H),
         |lg AS (SELECT event_type,
         |    value - lag(value, 1) OVER w AS d1,
         |    value - lag(value, $Q) OVER w AS dq
         |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |mom AS (SELECT event_type, count(*)::DOUBLE AS n,
         |    round(sum(d1), 2) AS s1, round(sum(d1 * d1), 2) AS ss1,
         |    round(sum(dq), 2) AS sq, round(sum(dq * dq), 2) AS ssq
         |  FROM lg WHERE dq IS NOT NULL GROUP BY 1),
         |st AS (SELECT event_type, n,
         |    (ssq - sq * sq / n) / (n - 1) / ($Q * ((ss1 - s1 * s1 / n) / (n - 1))) AS vr
         |  FROM mom),
         |zz AS (SELECT event_type, n, vr,
         |    (vr - 1) / sqrt(2.0 * (2 * $Q - 1) * ($Q - 1) / (3.0 * $Q * n)) AS z
         |  FROM st)
         |SELECT event_type, n::BIGINT AS n_obs, round(vr, 6) AS vr, round(z, 6) AS z,
         |  CASE WHEN abs(z) >= 1.96 THEN 1 ELSE 0 END AS rejects_rw
         |FROM zz""".stripMargin
  )
}

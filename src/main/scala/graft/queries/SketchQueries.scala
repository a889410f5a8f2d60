package graft.queries

import graft._
import graft.expressions.{cms_sketch, hll_sketch, kmv_sketch}
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch profiling queries — the cardinality/frequency health
  * checks a 100 TB ingest runs where exact answers would shuffle the whole
  * corpus: per-key distinct counts (KMV bottom-k + HyperLogLog, both a
  * few bytes of associative state per group; see
  * expressions/Sketches.scala) and Count-Min heavy-hitter estimates (one
  * depth×width counter array per corpus, merged across tasks — the data
  * itself never shuffles). Exact counterparts ride along so every row
  * carries its own ground truth; the DuckDB oracles replay the md5-derived
  * sketch math bit-exactly.
  *
  * Estimator arithmetic is deterministic across engines by construction:
  * hash60 values (exact in both), left-assoc double products of powers of
  * two, and an integer-accumulated HLL Z (Σ 2^(55−M_r) as a BIGINT) so no
  * order-dependent float sum exists. kats has no sketch surface — this
  * extends the engine along the pipeline axis (SURVEY §2.7–§2.9 family).
  */
object SketchQueries {
  private val KmvK = 64
  private val CmsDepth = 4
  private val CmsWidth = 256
  private val P = TextFunctions.MinHashPrime
  /** exact double repr of 0.709·64²·2^55 (= expressions.Sketches.HllAm2);
    * e-notation so DuckDB parses it as DOUBLE, not DECIMAL. */
  private val HllAm2Lit = "1.0462993238608057e+20"

  private def hv(c: org.apache.spark.sql.Column) = TextFunctions.hash60(c.cast("string"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-event-type distinct users: exact vs KMV(k=64) vs HLL(m=64) —
    // ONE pass, one partial-aggregated shuffle of ≤(k+m)-sized states.
    // (countDistinct plans its own expand; the sketches are why the query
    // scales — at 100 TB you drop the exact column and keep the plan.)
    "q_sketch_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val sk = ev.groupBy("event_type").agg(
        round(kmv_sketch(hv(col("user_id")), KmvK), 6).as("kmv_est"),
        round(hll_sketch(hv(col("user_id"))), 6).as("hll_est"))
      val ex = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      ex.join(sk, "event_type")
    }),

    // Corpus heavy hitters: exact top-20 tokens (distributed top-k) probed
    // against one global Count-Min sketch (4×256 longs, broadcast back).
    // cms_est ≥ n_exact always; the gap is collision mass.
    "q_sketch_cms" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      val h31 = TextFunctions.hash31(col("tok"))
      val sketch = toks.agg(cms_sketch(h31, CmsDepth, CmsWidth).as("cms"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(20)
      val est = TextFunctions.permParams(CmsDepth).zipWithIndex.map { case ((a, b), j) =>
        element_at(col("cms"), (lit(j * CmsWidth) + ((lit(a) * col("h") + lit(b)) % P) % CmsWidth + 1).cast("int"))
      }.reduce(least(_, _))
      exact.crossJoin(broadcast(sketch))
        .withColumn("h", h31) // hash31 of tok again, same md5 derivation
        .select(col("tok"), col("n_exact"), est.as("cms_est"))
    })
  )

  private def h60Sql(c: String) = s"('0x' || substr(md5($c), 1, 15))::BIGINT"

  val sql: Map[String, String] = Map(
    "q_sketch_distinct" ->
      s"""WITH hv AS (SELECT DISTINCT event_type, ${h60Sql("user_id::VARCHAR")} AS h FROM events),
         |ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact FROM events GROUP BY 1),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS nh
         |      FROM hv),
         |kmv AS (SELECT event_type,
         |          CASE WHEN max(nh) >= $KmvK
         |               THEN ${KmvK - 1}.0::DOUBLE * 1152921504606846976.0::DOUBLE
         |                    / max(CASE WHEN rn = $KmvK THEN h END)::DOUBLE
         |               ELSE max(nh)::DOUBLE END AS kmv_est
         |        FROM r GROUP BY 1),
         |regs AS (SELECT event_type, h & 63 AS reg,
         |           max(CASE WHEN (h >> 6) = 0 THEN 55
         |                    ELSE 55 - length(format('{:b}', h >> 6)) END) AS mr
         |         FROM hv GROUP BY 1, 2),
         |hz AS (SELECT event_type,
         |         (sum(1::BIGINT << (55 - mr))::BIGINT
         |          + (64 - count(*)) * (1::BIGINT << 55))::BIGINT AS zint,
         |         64 - count(*) AS zeros
         |       FROM regs GROUP BY 1),
         |hll AS (SELECT event_type,
         |          CASE WHEN $HllAm2Lit / zint::DOUBLE <= 160.0 AND zeros > 0
         |               THEN 64.0::DOUBLE * ln(64.0::DOUBLE / zeros)
         |               ELSE $HllAm2Lit / zint::DOUBLE END AS hll_est
         |        FROM hz)
         |SELECT e.event_type, e.n_exact,
         |  round(k.kmv_est, 6) AS kmv_est, round(h.hll_est, 6) AS hll_est
         |FROM ex e
         |JOIN kmv k USING (event_type)
         |JOIN hll h USING (event_type)""".stripMargin,

    "q_sketch_cms" -> {
      val rows = TextFunctions.permParams(CmsDepth).zipWithIndex.map { case ((a, b), j) =>
        s"b$j AS (SELECT (($a * h31 + $b) % $P) % $CmsWidth AS pos, count(*)::BIGINT AS c FROM h GROUP BY 1)"
      }
      val joins = TextFunctions.permParams(CmsDepth).zipWithIndex.map { case ((a, b), j) =>
        s"JOIN b$j ON b$j.pos = (($a * ex.h31 + $b) % $P) % $CmsWidth"
      }
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |h AS (SELECT tok, ${h60Sql("tok")} % $P AS h31 FROM toks),
         |${rows.mkString(",\n")},
         |ex AS (SELECT tok, count(*)::BIGINT AS n_exact, min(h31) AS h31
         |       FROM h GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20)
         |SELECT ex.tok, ex.n_exact,
         |  least(${(0 until CmsDepth).map(j => s"b$j.c").mkString(", ")}) AS cms_est
         |FROM ex
         |${joins.mkString("\n")}""".stripMargin
    }
  )
}

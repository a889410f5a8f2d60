package graft.queries

import graft._
import graft.expressions.{cms_sketch, hll_sketch, kmv_sketch, Sketches}
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
  private val HistB = 512
  private val SetK = 256
  private val MgCap = 4096
  private val HhDen = 1000 // heavy hitter = share > 1/HhDen
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
    }),

    // Two-pass equi-width histogram quantiles per key: pass 1 aggregates
    // (lo, hi, n) — a #keys-row broadcast — pass 2 buckets every value
    // map-side and aggregates B counters per key. Error ≤ range/B by
    // construction, state B longs per key: the quantile shape that never
    // sorts the data (an exact distributed quantile is a full sort at
    // 100 TB). Midpoint estimator keeps the float-op sequence short and
    // identical across engines.
    "q_sketch_quantiles" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val rng = ev.groupBy("event_type").agg(
        min("value").as("lo"), max("value").as("hi"), count(lit(1)).as("n"))
      val bucketed = ev.join(broadcast(rng), "event_type")
        .withColumn("bucket",
          // constant series (hi = lo) would divide 0/0 → NaN (and DuckDB
          // errors casting NaN) — all mass lands in bucket 0 by definition
          when(col("hi") === col("lo"), lit(0L)).otherwise(
            least(floor((col("value") - col("lo")) * HistB.toDouble / (col("hi") - col("lo"))), lit(HistB - 1.0))
              .cast("long")))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("bucket")
      val cum = bucketed.withColumn("cum", sum("c").over(w)).join(rng, "event_type")
      def qBucket(q: Double) = min(when(col("cum") >= lit(q) * col("n"), col("bucket")))
      def est(b: org.apache.spark.sql.Column) =
        round(col("lo") + (b + 0.5) * ((col("hi") - col("lo")) / HistB.toDouble), 6)
      cum.groupBy("event_type")
        .agg(first("n").as("n"), first("lo").as("lo"), first("hi").as("hi"),
          qBucket(0.5).as("b50"), qBucket(0.9).as("b90"), qBucket(0.99).as("b99"))
        .select(col("event_type"), col("n"),
          est(col("b50")).as("p50_est"), est(col("b90")).as("p90_est"), est(col("b99")).as("p99_est"))
    }),

    // KMV set algebra (Beyer et al. 2007): per-source bottom-k shingle
    // sketches compose into union/Jaccard/intersection estimates with
    // array math on the ≤ k-long sketches alone — the 100 TB path for
    // the exact q_source_overlap pair join (the corpus is aggregated once
    // per source; the pair stage touches only #sources² tiny arrays).
    // union sketch = k smallest distinct of the two arrays' concat;
    // ρ = |union-sketch ∩ A_k ∩ B_k| / |union-sketch| estimates Jaccard.
    "q_sketch_setops" -> ((s, dir) => {
      val sh = Tables.documents(s, dir)
        .select(col("source"), explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
      val sk = sh.groupBy("source")
        .agg(graft.expressions.kmv_hashes(TextFunctions.hash60(col("shingle")), SetK).as("kh"))
      sk.as("a").join(broadcast(sk.as("b")), col("a.source") < col("b.source"))
        .withColumn("u", slice(array_sort(array_union(col("a.kh"), col("b.kh"))), 1, SetK))
        .withColumn("l", size(col("u")))
        .withColumn("est_union", when(col("l") >= SetK,
            lit((SetK - 1).toDouble) * Sketches.HashSpace / element_at(col("u"), SetK).cast("double"))
          .otherwise(col("l").cast("double")))
        .withColumn("n_both", size(filter(col("u"),
          h => array_contains(col("a.kh"), h) && array_contains(col("b.kh"), h))).cast("long"))
        .withColumn("jac", col("n_both").cast("double") / col("l").cast("double"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"), col("n_both"),
          round(col("est_union"), 6).as("est_union"),
          round(col("jac"), 6).as("est_jaccard"),
          round(col("jac") * col("est_union"), 6).as("est_shared"))
    }),

    // Incremental sketch maintenance — the store-family shape (ModelStore,
    // fingerprint store, band store) applied to profiling: the HISTORY's
    // per-source KMV sketch is the only state carried forward (≤ k longs
    // per source, a persistable table); a new ingest BATCH folds in via
    // the same bottom-k union composition, giving the updated corpus
    // distinct-shingle estimate without rescanning history. Certified
    // against the exact distinct over the full corpus.
    "q_sketch_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      def sketchOf(part: DataFrame) = part
        .select(col("source"), explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
        .groupBy("source")
        .agg(graft.expressions.kmv_hashes(TextFunctions.hash60(col("shingle")), SetK).as("kh"))
      val store = sketchOf(d.where(col("doc_id") < 300))   // persisted profile
      val batch = sketchOf(d.where(col("doc_id") >= 300))  // new ingest
      val merged = store.as("a").join(batch.as("b"), Seq("source"), "full")
        .select(col("source"),
          slice(array_sort(array_union(
            coalesce(col("a.kh"), array().cast("array<long>")),
            coalesce(col("b.kh"), array().cast("array<long>")))), 1, SetK).as("u"))
        .withColumn("l", size(col("u")))
        .withColumn("est_distinct", when(col("l") >= SetK,
            lit((SetK - 1).toDouble) * Sketches.HashSpace / element_at(col("u"), SetK).cast("double"))
          .otherwise(col("l").cast("double")))
      val exact = d
        .select(col("source"), explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
        .groupBy("source").agg(countDistinct("shingle").as("n_exact"))
      exact.join(merged, "source")
        .select(col("source"), col("n_exact"), round(col("est_distinct"), 6).as("est_distinct"),
          round(col("est_distinct") / col("n_exact").cast("double"), 6).as("ratio"))
    }),

    // CMS inner products estimate JOIN SIZE (Cormode & Muthukrishnan §4.3):
    // |R ⋈_key S| ≈ min_j Σ_b R_j[b]·S_j[b] — two 8 KB sketches stand in
    // for the join itself, pure integer math (bit-exact across engines).
    // The "should I even run this join / how to size it" planning probe:
    // at 100 TB each side folds into its sketch in one pass, the estimate
    // costs d·w multiplications. Exact count rides along as ground truth
    // (Σ_u cnt_R(u)·cnt_S(u), one group-count join — cheap at test SF).
    "q_sketch_joinsize" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val h = TextFunctions.hash31(col("user_id").cast("string"))
      val r = ev
      val sSide = ev.where(col("event_type") === "purchase")
      val cmsR = r.agg(cms_sketch(h, CmsDepth, CmsWidth).as("cr"))
      val cmsS = sSide.agg(cms_sketch(h, CmsDepth, CmsWidth).as("cs"))
      val prod = zip_with(col("cr"), col("cs"), (x, y) => x * y)
      val rowDots = (0 until CmsDepth).map(j =>
        aggregate(slice(prod, j * CmsWidth + 1, CmsWidth), lit(0L), (acc, x) => acc + x))
      val exact = r.groupBy("user_id").agg(count(lit(1)).as("cr_n"))
        .join(sSide.groupBy("user_id").agg(count(lit(1)).as("cs_n")), "user_id")
        .agg(sum(col("cr_n") * col("cs_n")).as("exact_pairs"))
      cmsR.crossJoin(cmsS).crossJoin(exact)
        .select(col("exact_pairs"),
          rowDots.reduce(least(_, _)).as("est_pairs"))
        .withColumn("over_ratio",
          round(col("est_pairs").cast("double") / col("exact_pairs").cast("double"), 6))
    }),

    // Heavy hitters by the two-pass Misra–Gries pattern: pass 1 folds the
    // token stream into ONE mergeable ≤4096-key candidate summary (every
    // token with share > 1/4097 is guaranteed present — Misra & Gries
    // 1982; merge rule per Agarwal et al. 2012), pass 2 broadcast-joins
    // the candidate set back and exact-counts ONLY candidate rows, then
    // keeps share > 0.1% by integer compare (n_tok·1000 > N — no float
    // threshold). The final set is deterministic even though sketch
    // membership beyond the guarantee is partition-order dependent: the
    // guarantee makes candidates ⊇ true heavy hitters, and the exact
    // confirm prunes the rest. At 100 TB: pass 1 is map-side state (no
    // token shuffle — one 4096-key state per task merges to one row);
    // pass 2 shuffles only rows matching ≤4096 candidates.
    "q_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      val sk = toks.agg(
        graft.expressions.mg_candidates(col("tok"), MgCap).as("cands"),
        count(lit(1)).as("n_total"))
      val cands = sk.select(explode(col("cands")).as("tok"), col("n_total"))
      toks.join(broadcast(cands), "tok")
        .groupBy("tok", "n_total").agg(count(lit(1)).as("n_tok"))
        .where(col("n_tok") * lit(HhDen.toLong) > col("n_total"))
        .select(col("tok"), col("n_tok"),
          round(col("n_tok").cast("double") / col("n_total").cast("double"), 6).as("share"))
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    // key = u^(1/w) with u md5-derived, winners = global top-k by key —
    // which Spark executes as TakeOrderedAndProject (per-partition top-k
    // + a k-row driver merge), so a 100 TB corpus is one map pass. Here
    // w = n_chars: char-budget-proportional document sampling.
    "q_sample_weighted" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
      val u = (hv(col("doc_id")).cast("double") + 0.5) / Sketches.HashSpace
      d.withColumn("samp_key", pow(u, lit(1.0) / col("n_chars").cast("double")))
        .orderBy(col("samp_key").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("source"), col("n_chars"), round(col("samp_key"), 6).as("samp_key"))
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
    },

    // 0.5/0.9/0.99 are forced ::DOUBLE so the cum >= q*n comparison runs
    // the same IEEE arithmetic Spark does (DuckDB would otherwise compute
    // q*n in exact DECIMAL, which can disagree at integral q*n).
    "q_sketch_quantiles" ->
      s"""WITH rng AS (SELECT event_type, min(value) AS lo, max(value) AS hi, count(*)::BIGINT AS n
         |            FROM events GROUP BY 1),
         |bk AS (SELECT e.event_type,
         |         CASE WHEN hi = lo THEN 0
         |              ELSE least(floor((e.value - lo) * ${HistB}.0 / (hi - lo)), ${HistB - 1}.0::DOUBLE)::BIGINT
         |         END AS bucket
         |       FROM events e JOIN rng USING (event_type)),
         |bc AS (SELECT event_type, bucket, count(*)::BIGINT AS c FROM bk GROUP BY 1, 2),
         |cm AS (SELECT event_type, bucket,
         |         (sum(c) OVER (PARTITION BY event_type ORDER BY bucket))::BIGINT AS cum
         |       FROM bc),
         |qb AS (SELECT c.event_type, max(r.n) AS n, max(r.lo) AS lo, max(r.hi) AS hi,
         |         min(CASE WHEN cum >= 0.5::DOUBLE * r.n THEN bucket END) AS b50,
         |         min(CASE WHEN cum >= 0.9::DOUBLE * r.n THEN bucket END) AS b90,
         |         min(CASE WHEN cum >= 0.99::DOUBLE * r.n THEN bucket END) AS b99
         |       FROM cm c JOIN rng r USING (event_type) GROUP BY 1)
         |SELECT event_type, n,
         |  round(lo + (b50 + 0.5::DOUBLE) * ((hi - lo) / ${HistB}.0), 6) AS p50_est,
         |  round(lo + (b90 + 0.5::DOUBLE) * ((hi - lo) / ${HistB}.0), 6) AS p90_est,
         |  round(lo + (b99 + 0.5::DOUBLE) * ((hi - lo) / ${HistB}.0), 6) AS p99_est
         |FROM qb""".stripMargin,

    "q_sketch_setops" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
         |sh0 AS (SELECT doc_id, source, unnest(list_distinct(
         |          CASE WHEN len(t) >= 3
         |               THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |               ELSE []::VARCHAR[] END
         |        )) AS shingle FROM toks),
         |shh AS (SELECT DISTINCT source, ${h60Sql("shingle")} AS h FROM sh0),
         |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM shh),
         |sk AS (SELECT source, h FROM rk WHERE rn <= $SetK),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b
         |       FROM srcs a JOIN srcs b ON a.source < b.source),
         |uni0 AS (SELECT pr.src_a, pr.src_b, sk.h FROM pr JOIN sk ON sk.source = pr.src_a
         |         UNION
         |         SELECT pr.src_a, pr.src_b, sk.h FROM pr JOIN sk ON sk.source = pr.src_b),
         |urk AS (SELECT src_a, src_b, h,
         |          row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
         |        FROM uni0),
         |u AS (SELECT src_a, src_b, h, rn FROM urk WHERE rn <= $SetK),
         |flags AS (SELECT u.src_a, u.src_b, u.h, u.rn,
         |            CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END AS inboth
         |          FROM u
         |          LEFT JOIN sk sa ON sa.source = u.src_a AND sa.h = u.h
         |          LEFT JOIN sk sb ON sb.source = u.src_b AND sb.h = u.h),
         |agg AS (SELECT src_a, src_b, count(*)::BIGINT AS l,
         |          max(CASE WHEN rn = $SetK THEN h END) AS hk,
         |          sum(inboth)::BIGINT AS n_both
         |        FROM flags GROUP BY 1, 2)
         |SELECT src_a, src_b, n_both,
         |  round(CASE WHEN l >= $SetK
         |             THEN ${SetK - 1}.0::DOUBLE * 1152921504606846976.0::DOUBLE / hk::DOUBLE
         |             ELSE l::DOUBLE END, 6) AS est_union,
         |  round(n_both::DOUBLE / l::DOUBLE, 6) AS est_jaccard,
         |  round((n_both::DOUBLE / l::DOUBLE)
         |        * (CASE WHEN l >= $SetK
         |                THEN ${SetK - 1}.0::DOUBLE * 1152921504606846976.0::DOUBLE / hk::DOUBLE
         |                ELSE l::DOUBLE END), 6) AS est_shared
         |FROM agg""".stripMargin,

    "q_sketch_incremental" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
         |sh0 AS (SELECT doc_id, source, unnest(list_distinct(
         |          CASE WHEN len(t) >= 3
         |               THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |               ELSE []::VARCHAR[] END
         |        )) AS shingle FROM toks),
         |hh AS (SELECT DISTINCT source, ${h60Sql("shingle")} AS h FROM sh0 WHERE doc_id < 300),
         |hb AS (SELECT DISTINCT source, ${h60Sql("shingle")} AS h FROM sh0 WHERE doc_id >= 300),
         |ka AS (SELECT source, h FROM (SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh) t
         |       WHERE rn <= $SetK),
         |kb AS (SELECT source, h FROM (SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hb) t
         |       WHERE rn <= $SetK),
         |unn AS (SELECT source, h FROM ka UNION SELECT source, h FROM kb),
         |u AS (SELECT source, h, rn FROM (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM unn) t
         |      WHERE rn <= $SetK),
         |agg AS (SELECT source, count(*)::BIGINT AS l,
         |          max(CASE WHEN rn = $SetK THEN h END) AS hk
         |        FROM u GROUP BY 1),
         |ex AS (SELECT source, count(DISTINCT shingle)::BIGINT AS n_exact FROM sh0 GROUP BY 1)
         |SELECT ex.source, ex.n_exact,
         |  round(CASE WHEN l >= $SetK
         |             THEN ${SetK - 1}.0::DOUBLE * 1152921504606846976.0::DOUBLE / hk::DOUBLE
         |             ELSE l::DOUBLE END, 6) AS est_distinct,
         |  round((CASE WHEN l >= $SetK
         |              THEN ${SetK - 1}.0::DOUBLE * 1152921504606846976.0::DOUBLE / hk::DOUBLE
         |              ELSE l::DOUBLE END) / ex.n_exact::DOUBLE, 6) AS ratio
         |FROM ex JOIN agg ON ex.source = agg.source""".stripMargin,

    "q_sketch_joinsize" -> {
      val rowEsts = TextFunctions.permParams(CmsDepth).zipWithIndex.map { case ((a, b), j) =>
        s"""d$j AS (SELECT coalesce(sum(r.c * s.c), 0)::BIGINT AS dot
           |  FROM (SELECT (($a * h31 + $b) % $P) % $CmsWidth AS pos, count(*)::BIGINT AS c
           |        FROM h GROUP BY 1) r
           |  JOIN (SELECT (($a * h31 + $b) % $P) % $CmsWidth AS pos, count(*)::BIGINT AS c
           |        FROM h WHERE event_type = 'purchase' GROUP BY 1) s
           |  ON r.pos = s.pos)""".stripMargin
      }
      s"""WITH h AS (SELECT event_type,
         |             ${h60Sql("user_id::VARCHAR")} % $P AS h31
         |           FROM events),
         |${rowEsts.mkString(",\n")},
         |ex AS (SELECT sum(r.n * s.n)::BIGINT AS exact_pairs
         |       FROM (SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY 1) r
         |       JOIN (SELECT user_id, count(*)::BIGINT AS n FROM events
         |             WHERE event_type = 'purchase' GROUP BY 1) s
         |       ON r.user_id = s.user_id)
         |SELECT ex.exact_pairs,
         |  least(${(0 until CmsDepth).map(j => s"(SELECT dot FROM d$j)").mkString(", ")}) AS est_pairs,
         |  round(least(${(0 until CmsDepth).map(j => s"(SELECT dot FROM d$j)").mkString(", ")})::DOUBLE
         |        / ex.exact_pairs::DOUBLE, 6) AS over_ratio
         |FROM ex""".stripMargin
    },

    "q_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |n AS (SELECT count(*)::BIGINT AS n_total FROM toks),
         |c AS (SELECT tok, count(*)::BIGINT AS n_tok FROM toks GROUP BY 1)
         |SELECT c.tok, c.n_tok,
         |  round(c.n_tok::DOUBLE / n.n_total::DOUBLE, 6) AS share
         |FROM c, n
         |WHERE c.n_tok * $HhDen > n.n_total""".stripMargin,

    "q_sample_weighted" ->
      s"""WITH d AS (SELECT doc_id, source, n_chars,
         |             ${h60Sql("doc_id::VARCHAR")} AS h
         |           FROM documents),
         |k AS (SELECT doc_id, source, n_chars,
         |        pow((h::DOUBLE + 0.5) / 1152921504606846976.0::DOUBLE,
         |            1.0::DOUBLE / n_chars::DOUBLE) AS samp_key
         |      FROM d)
         |SELECT doc_id, source, n_chars, round(samp_key, 6) AS samp_key
         |FROM (SELECT * FROM k ORDER BY samp_key DESC, doc_id LIMIT 10) t""".stripMargin
  )
}

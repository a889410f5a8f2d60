package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation reporting over the documents table — the artifacts a
  * training-data pipeline publishes next to the dedup/quality operators:
  *
  *  - `q_hill_tail` — Hill tail-index of the document-length
  *    distribution per source (peaks-over-threshold form): threshold =
  *    value-domain p90 of n_chars (integer cumulative-count lookup, the
  *    q_leadtime discipline), α = k/Σ ln(x/T) over x > T. α ≤ ~2 means
  *    infinite-variance tails — shard plans and batch-size bounds must
  *    assume extreme docs; the scale shape is one count aggregate + one
  *    ≤#distinct-lengths frame.
  *  - `q_dataset_card` — the per-source datasheet: docs, chars, length
  *    mean, language count + top-language share, exact-duplicate rate
  *    (md5 distinct / total) — one scan, counting aggregates only, every
  *    probability a ratio of BIGINTs.
  */
object CorpusQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Heaps'-law vocabulary growth (Heaps 1978): V(N) = K·N^β fit over
    // ten doc-count checkpoints. V_k = distinct word types whose FIRST
    // occurrence (min doc_id) falls under checkpoint k and N_k = tokens
    // under it are exact integers from one min-doc aggregate and one
    // token-count prefix — no per-checkpoint rescan; the log-log OLS runs
    // on the 10-row frame with 6-dp-snapped moments. β drifting across
    // rounds of crawl ingestion signals template mass (sublinear novelty)
    // — the growth view next to q_corpus_zipf's static rank law. ──
    "q_heaps" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val nDocs = d.agg(max("doc_id").as("mx"))
      val toks = d.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .where(col("tok").rlike("^[a-z]+$"))
      val firstOcc = toks.groupBy("tok").agg(min("doc_id").as("fd"))
      val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      val ck = nDocs.select(explode(expr(
        "transform(sequence(1, 10), k -> struct(k AS k, ((mx + 1) * k) DIV 10 AS cdoc))")).as("c"))
        .select(col("c.k").as("k"), col("c.cdoc").as("cdoc"))
      val vk = broadcast(ck).join(firstOcc, col("fd") < col("cdoc"), "left")
        .groupBy("k", "cdoc").agg(count(col("fd")).as("vocab"))
      val nk = broadcast(ck).join(perDoc, col("doc_id") < col("cdoc"), "left")
        .groupBy("k", "cdoc").agg(sum("nt").as("n_tokens"))
      val pts = vk.join(nk, Seq("k", "cdoc"))
        .withColumn("lx", log(col("n_tokens").cast("double")))
        .withColumn("ly", log(col("vocab").cast("double")))
      val wAll = Window.partitionBy(substring(col("k").cast("string"), 1, 0))
      val fit = pts
        .withColumn("np", count(lit(1)).over(wAll).cast("double"))
        .withColumn("sx", round(sum("lx").over(wAll), 6))
        .withColumn("sy", round(sum("ly").over(wAll), 6))
        .withColumn("sxx", round(sum(col("lx") * col("lx")).over(wAll), 6))
        .withColumn("sxy", round(sum(col("lx") * col("ly")).over(wAll), 6))
        .withColumn("beta", expr("(np * sxy - sx * sy) / (np * sxx - sx * sx)"))
        .withColumn("kcoef", expr("exp((sy - beta * sx) / np)"))
      fit.select(col("k").cast("int").as("checkpoint"), col("cdoc").as("n_docs"),
        col("n_tokens"), col("vocab"),
        // + 0.0 normalizes the sign of a zero slope (a saturated
        // vocabulary yields -0.0 on one engine, +0.0 on the other)
        (round(col("beta"), 6) + lit(0.0)).as("heaps_beta"),
        round(col("kcoef"), 6).as("heaps_k"))
    }),

    // ── k-anonymity profile of the (source, lang) quasi-identifier pair
    // (Sweeney 2002) — the governance metric a dataset release publishes:
    // per equivalence class its size and risk flag (size < 10), plus the
    // corpus k (smallest class) and the share of docs living in risky
    // classes. Pure integer counting: one aggregate + a ≤#classes-row
    // window frame. ──
    "q_k_anonymity" -> ((s, dir) => {
      val g = Tables.documents(s, dir)
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(substring(col("source"), 1, 0))
      g.withColumn("k_anon", min("n").over(w))
        .withColumn("total", sum("n").over(w))
        .withColumn("below", sum(when(col("n") < 10, col("n")).otherwise(0L)).over(w))
        .select(col("source"), col("lang"), col("n").as("class_size"),
          when(col("n") < 10, 1).otherwise(0).as("risky"),
          col("k_anon"),
          round(col("below").cast("double") / col("total").cast("double"), 6).as("risk_share"))
    }),

    "q_hill_tail" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("source"), col("n_chars"))
      val cnt = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("source")
      val thr = cnt
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
        .where(col("cum") * 100 >= col("n") * 90)
        .groupBy("source").agg(min("n_chars").as("t"), first("n").as("n_docs"))
      docs.join(thr, "source").where(col("n_chars") > col("t"))
        .groupBy("source").agg(
          first("n_docs").as("n_docs"), first("t").as("threshold"),
          count(lit(1)).as("k_tail"),
          round(count(lit(1)) / sum(log(col("n_chars").cast("double") / col("t"))), 6).as("alpha"))
        .withColumn("infinite_variance", when(col("alpha") <= 2.0, 1).otherwise(0))
    }),

    "q_dataset_card" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars_total"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        countDistinct("lang").as("n_langs"))
      val langs = docs.groupBy("source", "lang").agg(count(lit(1)).as("cl"))
      val wTop = Window.partitionBy("source").orderBy(col("cl").desc, col("lang"))
      val top = langs.withColumn("rk", row_number().over(wTop)).where(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"), col("cl").as("top_lang_n"))
      base.join(top, "source")
        .select(col("source"), col("n_docs"), col("n_chars_total"),
          round(col("n_chars_total").cast("double") / col("n_docs"), 6).as("mean_chars"),
          col("n_langs"), col("top_lang"),
          round(col("top_lang_n").cast("double") / col("n_docs"), 6).as("top_lang_share"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6).as("exact_dup_rate"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_heaps" ->
      """WITH nd AS (SELECT max(doc_id) AS mx FROM documents),
        |toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tk AS (SELECT doc_id, tok FROM toks WHERE regexp_matches(tok, '^[a-z]+$')),
        |fo AS (SELECT tok, min(doc_id) AS fd FROM tk GROUP BY 1),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS nt FROM tk GROUP BY 1),
        |ck AS (SELECT k, ((mx + 1) * k) // 10 AS cdoc
        |       FROM nd, (SELECT unnest(range(1, 11)) AS k)),
        |vk AS (SELECT c.k, c.cdoc, count(f.fd)::BIGINT AS vocab
        |       FROM ck c LEFT JOIN fo f ON f.fd < c.cdoc GROUP BY 1, 2),
        |nk AS (SELECT c.k, c.cdoc, sum(p.nt)::BIGINT AS n_tokens
        |       FROM ck c LEFT JOIN pd p ON p.doc_id < c.cdoc GROUP BY 1, 2),
        |pts AS (SELECT k, cdoc, n_tokens, vocab,
        |    ln(n_tokens::DOUBLE) AS lx, ln(vocab::DOUBLE) AS ly
        |  FROM vk JOIN nk USING (k, cdoc)),
        |fit AS (SELECT *,
        |    count(*) OVER ()::DOUBLE AS np,
        |    round(sum(lx) OVER (), 6) AS sx, round(sum(ly) OVER (), 6) AS sy,
        |    round(sum(lx * lx) OVER (), 6) AS sxx, round(sum(lx * ly) OVER (), 6) AS sxy
        |  FROM pts),
        |bb AS (SELECT *, (np * sxy - sx * sy) / (np * sxx - sx * sx) AS beta FROM fit)
        |SELECT k::INT AS checkpoint, cdoc AS n_docs, n_tokens, vocab,
        |  round(beta, 6) + 0.0E0 AS heaps_beta,
        |  round(exp((sy - beta * sx) / np), 6) AS heaps_k
        |FROM bb""".stripMargin,

    "q_k_anonymity" ->
      """WITH g AS (SELECT source, lang, count(*)::BIGINT AS n FROM documents GROUP BY 1, 2),
        |w AS (SELECT *,
        |    min(n) OVER () AS k_anon,
        |    sum(n) OVER () AS total,
        |    sum(CASE WHEN n < 10 THEN n ELSE 0 END) OVER () AS below
        |  FROM g)
        |SELECT source, lang, n AS class_size,
        |  CASE WHEN n < 10 THEN 1 ELSE 0 END AS risky,
        |  k_anon::BIGINT AS k_anon,
        |  round(below::DOUBLE / total::DOUBLE, 6) AS risk_share
        |FROM w""".stripMargin,

    "q_hill_tail" ->
      """WITH cnt AS (SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
        |w AS (SELECT *,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY source) AS n
        |  FROM cnt),
        |thr AS (SELECT source, min(n_chars) AS t, max(n) AS n_docs
        |        FROM w WHERE cum * 100 >= n * 90 GROUP BY 1)
        |SELECT d.source, max(t2.n_docs)::BIGINT AS n_docs, max(t2.t)::BIGINT AS threshold,
        |  count(*)::BIGINT AS k_tail,
        |  round(count(*) / sum(ln(d.n_chars::DOUBLE / t2.t)), 6) AS alpha,
        |  CASE WHEN round(count(*) / sum(ln(d.n_chars::DOUBLE / t2.t)), 6) <= 2.0
        |       THEN 1 ELSE 0 END AS infinite_variance
        |FROM documents d JOIN thr t2 USING (source)
        |WHERE d.n_chars > t2.t GROUP BY 1""".stripMargin,

    "q_dataset_card" ->
      """WITH base AS (SELECT source, count(*) AS n_docs,
        |    sum(n_chars) AS n_chars_total,
        |    count(DISTINCT md5(text)) AS n_distinct,
        |    count(DISTINCT lang) AS n_langs
        |  FROM documents GROUP BY 1),
        |langs AS (SELECT source, lang, count(*) AS cl FROM documents GROUP BY 1, 2),
        |top AS (SELECT source, lang AS top_lang, cl AS top_lang_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY cl DESC, lang) AS rk
        |    FROM langs) WHERE rk = 1)
        |SELECT b.source, b.n_docs::BIGINT AS n_docs, b.n_chars_total::BIGINT AS n_chars_total,
        |  round(b.n_chars_total::DOUBLE / b.n_docs, 6) AS mean_chars,
        |  b.n_langs::BIGINT AS n_langs, t.top_lang,
        |  round(t.top_lang_n::DOUBLE / b.n_docs, 6) AS top_lang_share,
        |  round(1.0 - b.n_distinct::DOUBLE / b.n_docs, 6) AS exact_dup_rate
        |FROM base b JOIN top t USING (source)""".stripMargin
  )
}

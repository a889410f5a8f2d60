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

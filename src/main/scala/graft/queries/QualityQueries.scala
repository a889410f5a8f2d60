package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** Corpus-quality screens a training-data pipeline runs before mixing —
  * three signals the existing quality battery (q_text_quality /
  * q_text_repetition / q_doc_filter) does not cover:
  *
  *  - `q_code_detect` — code-vs-prose heuristic per document: density of
  *    programming-register keywords, symbol (non-alphanumeric) character
  *    share, and camelCase token rate, combined into a score + flag. The
  *    router that decides whether a doc goes to the code pipeline
  *    (different tokenizer, different quality rules) or the prose one.
  *    All three features are integer-count ratios — identical doubles in
  *    both engines; one codegen'd scan pass, no shuffle at all.
  *  - `q_boilerplate` — per-source boilerplate-phrase detection (the
  *    CCNet/RefinedWeb preprocessing step): a distinct 3-gram that appears
  *    in more than half of a source's documents is boilerplate (headers,
  *    footers, nav text); reports per-source phrase counts and how much
  *    of each doc's shingle set is boilerplate. Document frequency per
  *    (source, shingle) is one exploded groupBy — the q_source_overlap
  *    shape; per-doc coverage ratios are 6-dp-snapped then reduced in
  *    scaled-BIGINT space so the per-source mean is order-free.
  *  - `q_ttr` — lexical-diversity profile per source: type-token ratio
  *    and Guiraud's index R = V/√N per doc (the length-robust variant),
  *    aggregated per source. Low diversity flags template-generated or
  *    keyword-stuffed sources q_gini_vocab's corpus-level view can't
  *    localize. Integer counts + correctly-rounded sqrt — zero
  *    cross-engine drift.
  *
  * Scale: q_code_detect is scan-only; q_boilerplate/q_ttr shuffle once on
  * (source, shingle) / source; nothing touches the driver.
  */
object QualityQueries {

  /** Programming-register keywords (matched as whole tokens). */
  private val CodeWords = Seq(
    "join", "filter", "sort", "merge", "scan", "hash",
    "agg", "query", "group", "window")

  /** Code-score weights + routing threshold. */
  private val WKw = 0.7
  private val WSym = 0.25
  private val WCamel = 0.05
  private val CodeThresh = 0.35

  /** Boilerplate document-frequency cut: df · 2 > source size. */
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_code_detect" -> ((s, dir) => {
      val t = TextFunctions.tokens(col("text"))
      val kw = size(filter(t, x => x.isin(CodeWords: _*))).cast("double") / size(t)
      // symbol share = non-[alnum/space] chars / chars
      val nonAlnum = length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("double") /
        length(col("text")).cast("double")
      val camel = size(filter(t, x => x.rlike("^[a-z]+[A-Z]"))).cast("double") / size(t)
      val score = kw * lit(WKw) + nonAlnum * lit(WSym) + camel * lit(WCamel)
      docs(s, dir).select(col("doc_id"), col("source"),
        round(kw, 6).as("kw_ratio"),
        round(nonAlnum, 6).as("symbol_ratio"),
        round(camel, 6).as("camel_ratio"),
        round(score, 6).as("code_score"),
        (score > lit(CodeThresh)).as("is_code"))
    }),

    "q_boilerplate" -> ((s, dir) => {
      val sh = docs(s, dir)
        .select(col("source"), col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
      val srcN = docs(s, dir).groupBy("source").agg(count(lit(1)).as("n_docs"))
      // document frequency per (source, shingle); boilerplate: df*2 > n_docs
      val df = sh.groupBy("source", "shingle").agg(count(lit(1)).as("df"))
        .join(broadcast(srcN), "source")
        .withColumn("boiler", col("df") * 2 > col("n_docs"))
      val perDoc = sh.join(df.select("source", "shingle", "boiler"), Seq("source", "shingle"))
        .groupBy("source", "doc_id").agg(
          count(lit(1)).as("n_sh"),
          sum(when(col("boiler"), lit(1L)).otherwise(lit(0L))).as("n_boiler"))
        .withColumn("cov", round(col("n_boiler").cast("double") / col("n_sh"), 6))
      perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cov") > 0, lit(1L)).otherwise(lit(0L))).as("n_docs_hit"),
        // order-free mean: 6-dp ratios summed in scaled-BIGINT space
        sum(round(col("cov") * lit(1e6)).cast("long")).as("cov_s"),
        max("cov").as("max_coverage"))
        .join(broadcast(
          df.where(col("boiler")).groupBy("source").agg(count(lit(1)).as("n_boiler_phrases"))),
          Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_boiler_phrases"), lit(0L)).as("n_boiler_phrases"),
          col("n_docs_hit"),
          round(col("cov_s").cast("double") / lit(1e6) / col("n_docs").cast("double"), 6)
            .as("mean_coverage"),
          col("max_coverage"))
    }),

    "q_ttr" -> ((s, dir) => {
      val t = TextFunctions.tokens(col("text"))
      val perDoc = docs(s, dir).select(col("source"),
        size(t).cast("long").as("n_tok"),
        size(array_distinct(t)).cast("long").as("n_typ"))
        .where(col("n_tok") > 0)
        .withColumn("ttr", round(col("n_typ").cast("double") / col("n_tok"), 6))
        .withColumn("guiraud",
          round(col("n_typ").cast("double") / sqrt(col("n_tok").cast("double")), 6))
      perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum(round(col("ttr") * lit(1e6)).cast("long")).as("ttr_s"),
        sum(round(col("guiraud") * lit(1e6)).cast("long")).as("gui_s"),
        min("ttr").as("min_ttr"),
        max("ttr").as("max_ttr"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("ttr_s").cast("double") / lit(1e6) / col("n_docs").cast("double"), 6)
            .as("mean_ttr"),
          round(col("gui_s").cast("double") / lit(1e6) / col("n_docs").cast("double"), 6)
            .as("mean_guiraud"),
          col("min_ttr"), col("max_ttr"))
    })
  )

  private val KwList = CodeWords.map(w => s"'$w'").mkString(", ")

  /** Shared DuckDB fragment: distinct 3-gram shingles per doc. */
  private val ShingleSql =
    """toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, source, unnest(list_distinct(
      |         CASE WHEN len(t) >= 3
      |              THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |              ELSE []::VARCHAR[] END
      |       )) AS shingle FROM toks)""".stripMargin

  val sql: Map[String, String] = Map(

    "q_code_detect" ->
      s"""WITH f AS (SELECT doc_id, source,
         |    len(list_filter(string_split(text, ' '), x -> x IN ($KwList)))::DOUBLE
         |      / len(string_split(text, ' ')) AS kw,
         |    length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
         |      / length(text) AS sym,
         |    len(list_filter(string_split(text, ' '), x -> regexp_matches(x, '^[a-z]+[A-Z]')))::DOUBLE
         |      / len(string_split(text, ' ')) AS camel
         |  FROM documents)
         |SELECT doc_id, source,
         |  round(kw, 6) AS kw_ratio, round(sym, 6) AS symbol_ratio,
         |  round(camel, 6) AS camel_ratio,
         |  round(kw * ${WKw}E0 + sym * ${WSym}E0 + camel * ${WCamel}E0, 6) AS code_score,
         |  (kw * ${WKw}E0 + sym * ${WSym}E0 + camel * ${WCamel}E0) > ${CodeThresh}E0 AS is_code
         |FROM f""".stripMargin,

    "q_boilerplate" ->
      s"""WITH $ShingleSql,
         |srcn AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
         |df AS (SELECT s.source, s.shingle, count(*)::BIGINT AS df, any_value(n.n_docs) AS n_docs
         |  FROM sh s JOIN srcn n ON s.source = n.source GROUP BY 1, 2),
         |bl AS (SELECT source, shingle, (df * 2 > n_docs) AS boiler FROM df),
         |perdoc AS (SELECT s.source, s.doc_id, count(*)::BIGINT AS n_sh,
         |    sum(CASE WHEN b.boiler THEN 1 ELSE 0 END)::BIGINT AS n_boiler
         |  FROM sh s JOIN bl b ON s.source = b.source AND s.shingle = b.shingle
         |  GROUP BY 1, 2),
         |cov AS (SELECT source, doc_id, round(n_boiler::DOUBLE / n_sh, 6) AS cov FROM perdoc),
         |agg AS (SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(CASE WHEN cov > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_hit,
         |    sum(round(cov * 1e6)::BIGINT)::BIGINT AS cov_s,
         |    max(cov) AS max_coverage
         |  FROM cov GROUP BY 1),
         |nb AS (SELECT source, count(*)::BIGINT AS n_boiler_phrases
         |  FROM bl WHERE boiler GROUP BY 1)
         |SELECT a.source, a.n_docs,
         |  coalesce(nb.n_boiler_phrases, 0)::BIGINT AS n_boiler_phrases,
         |  a.n_docs_hit,
         |  round(a.cov_s::DOUBLE / 1e6 / a.n_docs::DOUBLE, 6) AS mean_coverage,
         |  a.max_coverage
         |FROM agg a LEFT JOIN nb ON a.source = nb.source""".stripMargin,

    "q_ttr" ->
      """WITH perdoc AS (SELECT source,
        |    len(string_split(text, ' '))::BIGINT AS n_tok,
        |    len(list_distinct(string_split(text, ' ')))::BIGINT AS n_typ
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |r AS (SELECT source, n_tok,
        |    round(n_typ::DOUBLE / n_tok, 6) AS ttr,
        |    round(n_typ::DOUBLE / sqrt(n_tok::DOUBLE), 6) AS guiraud
        |  FROM perdoc)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |  round(sum(round(ttr * 1e6)::BIGINT)::DOUBLE / 1e6 / count(*)::DOUBLE, 6) AS mean_ttr,
        |  round(sum(round(guiraud * 1e6)::BIGINT)::DOUBLE / 1e6 / count(*)::DOUBLE, 6) AS mean_guiraud,
        |  min(ttr) AS min_ttr, max(ttr) AS max_ttr
        |FROM r GROUP BY 1""".stripMargin
  )
}

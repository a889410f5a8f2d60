package graft.queries

import graft._
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-side training-data operators: source-mixture planning,
  * cross-document duplicated-span detection, and distributed BPE merge
  * learning — the steps between "corpus deduped" and "tokenizer + mixture
  * fixed" in a pretraining pipeline.
  */
object TokenQueries {
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Duplicated-span gram width (tokens) for q_substring_dedup. */
  private val SpanK = 8

  /** Merge rounds learned by q_bpe_learn. */
  private val BpeRounds = 8

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Training-mixture planning: per-source token counts → temperature
    // sampling weights p_i ∝ share_i^(1/T) with T = 2 (the multilingual
    // upsampling rule of XLM-R / mBERT), a token budget of half the
    // corpus, and the per-source sampling rate + epoch count that budget
    // implies. ONE corpus aggregation (map-side partial sums); everything
    // after runs on a #sources-row frame, so the tiny normalization
    // cross-joins broadcast and cost nothing at 100 TB. ──
    "q_mix_weights" -> ((s, dir) => {
      val per = docs(s, dir).groupBy("source")
        .agg(sum(TextFunctions.nTokens(col("text")).cast("long")).as("n_tokens"))
      val tot = per.agg(sum("n_tokens").as("tot"))
      val j = per.crossJoin(broadcast(tot))
        .withColumn("share", col("n_tokens").cast("double") / col("tot"))
        .withColumn("sq", sqrt(col("share")))
      val ssq = j.agg(sum("sq").as("ssq"))
      val rate = floor(col("tot") * 0.5) * col("sq") / col("ssq") / col("n_tokens")
      j.crossJoin(broadcast(ssq)).select(
        col("source"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("sq") / col("ssq"), 6).as("mix_weight"),
        round(floor(col("tot") * 0.5) * col("sq") / col("ssq"), 6).as("target_tokens"),
        round(rate, 6).as("sample_rate"),
        // ceil of the ROUNDED rate so the integer is decided on the
        // 6-digit value both engines agree on, not the raw double
        ceil(round(rate, 6)).cast("int").as("epochs"))
    }),

    // ── Cross-document duplicated spans: the Spark shape of exact
    // substring dedup (Lee et al. 2022, "Deduplicating Training Data
    // Makes Language Models Better" — suffix-array substring dedup
    // re-expressed as positioned k-gram blocking). Every SpanK-token
    // window is keyed by its text; windows whose text occurs in ≥ 2
    // distinct docs are duplicate hits, and overlapping hits merge into
    // maximal spans per doc (cummax island windows). One (gram) shuffle
    // bounded by corpus token count + one doc-keyed window — no
    // self-join, no suffix array, same answer for fixed k. In production
    // the gram key is xxhash64(text); the oracle needs the raw string so
    // both engines join on it directly. ──
    "q_substring_dedup" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("n_tokens", size(col("ws")).cast("long"))
      val grams = base.where(col("n_tokens") >= SpanK)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, int(n_tokens) - $SpanK), i -> array_join(slice(ws, i + 1, $SpanK), ' '))"))
          .as(Seq("pos", "gram")))
      val dup = grams.groupBy("gram")
        .agg(countDistinct("doc_id").as("nd")).where(col("nd") >= 2)
      val hits = grams.join(dup.select("gram"), "gram").select("doc_id", "pos")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val spans = hits
        .withColumn("prev_end",
          max(col("pos") + (SpanK - 1)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk", when(col("prev_end").isNull || col("pos") > col("prev_end"), 1).otherwise(0))
        .withColumn("isl", sum("brk").over(w))
        .groupBy("doc_id", "isl")
        .agg(min("pos").as("sp_start"), (max("pos") + (SpanK - 1)).as("sp_end"))
      val perDoc = spans.groupBy("doc_id").agg(
        count(lit(1)).as("n_dup_spans"),
        sum(col("sp_end") - col("sp_start") + 1).as("dup_tokens"))
      base.select("doc_id", "n_tokens").join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          round(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 6).as("dup_frac"))
    }),

    // ── Corpus encoding under the learned BPE merges: the merges are
    // re-learned (deterministically, same loop as q_bpe_learn) and then
    // applied as PLAN LITERALS through the codegen'd bpe_token_count
    // expression — encoding is one zero-shuffle compiled map pass (the
    // cascade is parsed once per query, not per row; no per-word lambda
    // machinery), followed by one per-source aggregate. Reports the
    // metric a tokenizer pipeline actually tracks: tokens under the
    // vocabulary vs whitespace tokens vs chars (compression). Words
    // outside the trained [a-z]{2,20} alphabet count as 1 symbol. ──
    "q_bpe_encode" -> ((s, dir) => {
      val merges = learnMerges(s, dir).map { case (_, p, _, _) => p }
      docs(s, dir)
        .select(col("source"), length(col("text")).cast("long").as("n_chars"),
          TextFunctions.nTokens(col("text")).cast("long").as("ws_tokens"),
          graft.expressions.bpe_token_count(split(lower(col("text")), " "), merges)
            .as("bpe_tokens"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("ws_tokens").as("ws_tokens"),
          sum("bpe_tokens").as("bpe_tokens"),
          round(sum("bpe_tokens") / sum("ws_tokens").cast("double"), 6).as("bpe_per_word"),
          round(sum("n_chars") / sum("bpe_tokens").cast("double"), 6).as("chars_per_token"))
    }),

    // ── Distributed BPE merge learning (Sennrich et al. 2016): the
    // corpus collapses to a (word, count) histogram in ONE shuffle —
    // everything after runs on vocabulary scale, which is why tokenizer
    // training is feasible at 100 TB. Words start as space-delimited
    // character symbols; each round counts adjacent symbol pairs
    // (explode + weighted sum), picks the argmax (count desc, pair asc —
    // an exact integer decision, so both engines agree), and applies the
    // merge as a space-anchored leftmost replace (' a b ' → ' ab ', a
    // deterministic variant of the reference's greedy application). Only
    // the R merge strings ever reach the driver; each round is one small
    // aggregate job over the histogram. Output = the learned merge
    // table, i.e. the tokenizer. ──
    "q_bpe_learn" -> ((s, dir) => {
      import s.implicits._
      learnMerges(s, dir).toDF("merge_rank", "pair", "merged", "pair_count")
    }),

    // ── Out-of-vocabulary audit: fix the tokenizer vocabulary as the
    // corpus' top-2000 word types (count desc, token asc — an exact
    // integer decision) and measure, per source, the token and type
    // share that falls outside it. The drift screen run before/after a
    // new crawl lands: a source whose OOV rate jumps is shifting
    // vocabulary and will inflate tokenizer fertility. Shapes: one
    // vocab-sized count aggregation, TakeOrderedAndProject top-K (never
    // a global sort), the 2000-row vocab broadcast onto the
    // (source, type) relation — no shuffle scales with corpus tokens
    // beyond the two count aggregations. ──
    "q_oov_rate" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("source"), explode(split(col("text"), " ")).as("w"))
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(OovVocab)
        .select(col("w"), lit(1).as("in_v"))
      toks.groupBy("source", "w").agg(count(lit(1)).as("c"))
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy("source").agg(
          sum("c").as("n_tokens"),
          sum(when(col("in_v").isNull, col("c")).otherwise(lit(0L))).as("oov_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("in_v").isNull, lit(1L)).otherwise(lit(0L))).as("oov_types"))
        .withColumn("oov_rate", round(col("oov_tokens").cast("double") / col("n_tokens"), 6))
        .withColumn("oov_type_rate", round(col("oov_types").cast("double") / col("n_types"), 6))
    })
  )

  /** Vocabulary size fixed by q_oov_rate. */
  private val OovVocab = 2000

  /** The BPE learning loop shared by q_bpe_learn / q_bpe_encode:
    * (merge_rank, pair, merged, pair_count) for BpeRounds rounds.
    * Deterministic — exact-integer argmax with a lexicographic tie-break.
    */
  private def learnMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val words = docs(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]{2,20}$"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .select(trim(regexp_replace(col("word"), "(.)", "$1 ")).as("sym"), col("cnt"))
      .persist()
    words.count() // materialize once; rounds below re-read the cache
    var cur: DataFrame = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (r <- 0 until BpeRounds) {
        val top = cur.where(size(split(col("sym"), " ")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(0, size(split(sym, ' ')) - 2), " +
              "i -> concat(element_at(split(sym, ' '), i + 1), ' ', element_at(split(sym, ' '), i + 2)))"))
            .as("pair"))
          .groupBy("pair").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("pair").asc).limit(1).collect()
        top.headOption.foreach { row =>
          val pair = row.getString(0)
          val merged = pair.replace(" ", "")
          merges += ((r + 1, pair, merged, row.getLong(1)))
          cur = cur.select(
            expr(s"trim(replace(concat(' ', sym, ' '), ' $pair ', ' $merged '))").as("sym"),
            col("cnt"))
        }
      }
    } finally words.unpersist() // a failed round must not leak the cached histogram
    merges.toSeq
  }

  // Unrolled WITH-chain replay of the BPE rounds (the kmChainSql pattern):
  // p_r = weighted pair counts over w_r, m_r = the argmax merge, w_{r+1} =
  // the space-anchored replace. Exact-integer argmax keeps engines aligned.
  // Every w/m layer is AS MATERIALIZED — without the hint DuckDB inlines
  // the chain and the replay blows up exponentially in the round count.
  // w_{r+1} takes m_r via LEFT JOIN ON TRUE with a chr(1) sentinel: a
  // round that runs dry (empty m_r on a tiny corpus) must be a no-op
  // replace, matching the Spark loop's skipped round — a cross join would
  // collapse the whole chain to zero rows instead.
  private def bpeChainSql(rounds: Int): String = {
    val base =
      """words AS (
        |  SELECT word, count(*)::BIGINT AS cnt FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]{2,20}$') GROUP BY 1),
        |w0 AS MATERIALIZED (SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym, cnt FROM words)""".stripMargin
    val layers = (0 until rounds).map { r =>
      s"""p$r AS (SELECT pair, sum(cnt)::BIGINT AS c FROM (
         |  SELECT unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS pair, cnt
         |  FROM (SELECT string_split(sym, ' ') AS a, cnt FROM w$r)) GROUP BY 1),
         |m$r AS MATERIALIZED (SELECT ${r + 1} AS merge_rank, pair, replace(pair, ' ', '') AS merged, c
         |        FROM p$r ORDER BY c DESC, pair LIMIT 1),
         |w${r + 1} AS MATERIALIZED (SELECT trim(replace(' ' || sym || ' ',
         |                 ' ' || coalesce(m$r.pair, chr(1)) || ' ',
         |                 ' ' || coalesce(m$r.merged, '') || ' ')) AS sym, cnt
         |               FROM w$r LEFT JOIN m$r ON TRUE)""".stripMargin
    }
    (base +: layers).mkString(",\n")
  }

  val sql: Map[String, String] = Map(
    "q_oov_rate" ->
      s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
         |vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY 1)
         |          ORDER BY c DESC, w LIMIT $OovVocab),
         |src AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2)
         |SELECT source,
         |  sum(s.c)::BIGINT AS n_tokens,
         |  sum(CASE WHEN v.w IS NULL THEN s.c ELSE 0 END)::BIGINT AS oov_tokens,
         |  count(*)::BIGINT AS n_types,
         |  sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS oov_types,
         |  round(sum(CASE WHEN v.w IS NULL THEN s.c ELSE 0 END)::DOUBLE / sum(s.c), 6) AS oov_rate,
         |  round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS oov_type_rate
         |FROM src s LEFT JOIN vocab v ON s.w = v.w GROUP BY 1""".stripMargin,

    "q_mix_weights" ->
      """WITH per AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |             FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_tokens)::BIGINT AS tot FROM per),
        |j AS (SELECT source, n_tokens, n_tokens::DOUBLE / tot AS share,
        |        sqrt(n_tokens::DOUBLE / tot) AS sq, tot FROM per, t),
        |s2 AS (SELECT sum(sq) AS ssq FROM j)
        |SELECT source, n_tokens,
        |  round(share, 6) AS share,
        |  round(sq / ssq, 6) AS mix_weight,
        |  round(floor(tot * 0.5) * sq / ssq, 6) AS target_tokens,
        |  round(floor(tot * 0.5) * sq / ssq / n_tokens, 6) AS sample_rate,
        |  ceil(round(floor(tot * 0.5) * sq / ssq / n_tokens, 6))::INT AS epochs
        |FROM j, s2""".stripMargin,

    "q_substring_dedup" ->
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws,
         |                len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
         |grams AS (SELECT doc_id, i - 1 AS pos, array_to_string(ws[i:i + ${SpanK - 1}], ' ') AS gram
         |          FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SpanK - 2})) AS i
         |                FROM base WHERE n_tokens >= $SpanK)),
         |dup AS (SELECT gram FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
         |m AS (SELECT doc_id, pos,
         |        max(pos + ${SpanK - 1}) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |      FROM hits),
         |b AS (SELECT doc_id, pos,
         |        CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS brk FROM m),
         |isl AS (SELECT doc_id, pos,
         |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT AS isl FROM b),
         |spans AS (SELECT doc_id, isl, min(pos) AS sp_start, max(pos) + ${SpanK - 1} AS sp_end
         |          FROM isl GROUP BY 1, 2),
         |pd AS (SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
         |         sum(sp_end - sp_start + 1)::BIGINT AS dup_tokens FROM spans GROUP BY 1)
         |SELECT base.doc_id, base.n_tokens,
         |  coalesce(pd.n_dup_spans, 0)::BIGINT AS n_dup_spans,
         |  coalesce(pd.dup_tokens, 0)::BIGINT AS dup_tokens,
         |  round(coalesce(pd.dup_tokens, 0) / base.n_tokens, 6) AS dup_frac
         |FROM base LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q_bpe_learn" ->
      s"""WITH ${bpeChainSql(BpeRounds)}
         |SELECT merge_rank, pair, merged, c AS pair_count
         |FROM (${(0 until BpeRounds).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")})""".stripMargin,

    // re-learns the merges via the same chain, pivots them into one row
    // (mg — scalar subqueries, so a dry round contributes NULL and its
    // replace level no-ops via the chr(1) sentinel, exactly like the Spark
    // side's shorter cascade), and applies the cascade inside a list
    // lambda per word — mirroring the literal-nested expression
    "q_bpe_encode" -> {
      val mgCols = (0 until BpeRounds)
        .map(r => s"(SELECT pair FROM m$r) AS p$r, (SELECT merged FROM m$r) AS g$r").mkString(", ")
      val applied = (0 until BpeRounds).foldLeft("trim(regexp_replace(w, '(.)', '\\1 ', 'g'))") {
        case (x, r) => s"trim(replace(' ' || $x || ' ', " +
          s"' ' || coalesce(p$r, chr(1)) || ' ', ' ' || coalesce(g$r, '') || ' '))"
      }
      s"""WITH ${bpeChainSql(BpeRounds)},
         |mg AS (SELECT $mgCols),
         |enc AS (SELECT d.source, length(d.text)::BIGINT AS n_chars,
         |         len(string_split(d.text, ' '))::BIGINT AS ws_tokens,
         |         list_sum(list_transform(string_split(lower(d.text), ' '),
         |           w -> CASE WHEN regexp_matches(w, '^[a-z]{2,20}$$')
         |                     THEN len(string_split($applied, ' '))
         |                     ELSE 1 END))::BIGINT AS bpe_tokens
         |        FROM documents d CROSS JOIN mg)
         |SELECT source, count(*)::BIGINT AS n_docs, sum(ws_tokens)::BIGINT AS ws_tokens,
         |  sum(bpe_tokens)::BIGINT AS bpe_tokens,
         |  round(sum(bpe_tokens) / sum(ws_tokens)::DOUBLE, 6) AS bpe_per_word,
         |  round(sum(n_chars) / sum(bpe_tokens)::DOUBLE, 6) AS chars_per_token
         |FROM enc GROUP BY 1""".stripMargin
    }
  )
}

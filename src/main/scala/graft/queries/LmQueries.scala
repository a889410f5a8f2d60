package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus language-model operators beyond the Stupid-Backoff trigram LM:
  *
  *  - interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
  *    standard n-gram smoothing) trained on the even-doc_id half and
  *    scoring the odd half — the discount/continuation formulation is
  *    pure integer-count ratios, and per-doc log-probability sums are
  *    carried as 1e6-scaled BIGINTs so document scores are exact
  *    integer sums in both engines;
  *  - TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
  *    the adjacent-token co-occurrence graph via text/TextRank — an
  *    exact integer-scaled iteration whose driver fast path is CAPPED
  *    (TextRank.MaxDriverGraph) and whose beyond-cap path runs the same
  *    recurrence as distributed join+aggregate rounds. The oracle
  *    replays the iteration with the rank vector as recursive-CTE list
  *    state; integer contributions make every sum order-independent.
  */
object LmQueries {
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Kneser-Ney absolute discount. */
  private val KnD = 0.75

  /** TextRank: vocabulary floor and emitted top-k (damping/iterations
    * live in text/TextRank). */
  private val TrMinFreq = 5
  private val TrTopK = 10

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Interpolated Kneser-Ney bigram scoring. Train counts on even
    // doc_ids; score odd docs: P(w2|w1) = max(c12−d,0)/c1 +
    // (d·N1+(w1·)/c1)·Pcont(w2), Pcont = N1+(·w2)/B; unseen contexts
    // back off to the continuation distribution, OOV words to 0.5/B.
    // Everything upstream of ln() is exact integer ratios; per-doc sums
    // are 1e6-scaled BIGINTs. One (doc, bigram) shuffle + vocabulary-
    // sized count joins. ──
    "q_kneser_ney" -> ((s, dir) => {
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), posexplode(expr(
          "filter(transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] as w1, ws[i] as w2)), " +
            "p -> p.w1 rlike '^[a-z]+$' AND p.w2 rlike '^[a-z]+$')")).as(Seq("pos", "bg")))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
      val train = bigrams(docs(s, dir).where(col("doc_id") % 2 === 0))
      val test = bigrams(docs(s, dir).where(col("doc_id") % 2 === 1))
      val c12 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
      val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1p"))
      val b = c12.agg(count(lit(1)).as("bt"))
      val scored = test
        .join(c12, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .join(cont, Seq("w2"), "left")
        .crossJoin(broadcast(b))
        .withColumn("pcont",
          when(col("n1p").isNotNull, col("n1p") / col("bt")).otherwise(lit(0.5) / col("bt")))
        .withColumn("p",
          when(col("c1").isNotNull,
            greatest(coalesce(col("c12"), lit(0L)) - KnD, lit(0.0)) / col("c1") +
              (lit(KnD) * col("n1f") / col("c1")) * col("pcont"))
            .otherwise(col("pcont")))
        .withColumn("ilp", round(log(col("p")) * 1e6).cast("long"))
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("ilp").as("slp"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("slp") / (col("n_bigrams") * 1e6), 6).as("mean_logp"),
          round(exp(-(col("slp") / (col("n_bigrams") * 1e6))), 6).as("ppl"))
    }),

    // ── TextRank keywords: weighted PageRank over the adjacent-token
    // graph (stopwords excluded, vocabulary floored at min frequency 5)
    // via text/TextRank.ranks — exact 1e9-scaled BIGINT iteration, so
    // the capped driver fast path, the distributed join+agg rounds, and
    // the oracle's recursive-CTE replay are bit-identical regardless of
    // summation order. Driver state is bounded by TextRank.MaxDriverGraph
    // (~50 MB); past the cap the rounds are fully distributed. ──
    "q_textrank" -> ((s, dir) => {
      val stops = graft.text.TextFunctions.LangProfiles.toMap.apply("en")
      // the tokenize+regex pass feeds two consumers (vocab and edges) —
      // materialize it once
      val toks = Scratch.materialize(
        docs(s, dir)
          .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
          .where(col("tok").rlike("^[a-z]+$") && !col("tok").isin(stops: _*)),
        "textrank_toks")
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
        .where(col("freq") >= TrMinFreq)
      val wToks = toks.join(vocab.select("tok"), Seq("tok"))
      val wo = Window.partitionBy("doc_id").orderBy("pos")
      val pairs = wToks
        .withColumn("nxt", lead("tok", 1).over(wo))
        .where(col("nxt").isNotNull && col("nxt") =!= col("tok"))
        .select(least(col("tok"), col("nxt")).as("a"), greatest(col("tok"), col("nxt")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      graft.text.TextRank.ranks(vocab, pairs)
        .select(col("tok").as("word"), col("freq"),
          round(col("r") / lit(1e9), 6).as("rank"))
        .orderBy(col("rank").desc, col("word").asc).limit(TrTopK)
    })
  )

  val sql: Map[String, String] = Map(

    "q_kneser_ney" ->
      s"""WITH tk AS (
         |  SELECT doc_id, i AS pos, ws[i] AS w1, ws[i + 1] AS w2
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
         |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))),
         |bg AS (SELECT doc_id, w1, w2 FROM tk
         |       WHERE regexp_matches(w1, '^[a-z]+$$') AND regexp_matches(w2, '^[a-z]+$$')),
         |train AS (SELECT * FROM bg WHERE doc_id % 2 = 0),
         |test AS (SELECT * FROM bg WHERE doc_id % 2 = 1),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY 1, 2),
         |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*) AS n1f FROM c12 GROUP BY 1),
         |cont AS (SELECT w2, count(*) AS n1p FROM c12 GROUP BY 1),
         |b AS (SELECT count(*) AS bt FROM c12),
         |sc AS (SELECT t.doc_id,
         |         CASE WHEN co.n1p IS NOT NULL THEN co.n1p / b.bt ELSE 0.5E0 / b.bt END AS pcont,
         |         c.c1, c.n1f, coalesce(x.c12, 0) AS c12v
         |       FROM test t
         |       LEFT JOIN c12 x ON t.w1 = x.w1 AND t.w2 = x.w2
         |       LEFT JOIN c1 c ON t.w1 = c.w1
         |       LEFT JOIN cont co ON t.w2 = co.w2
         |       CROSS JOIN b),
         |pr AS (SELECT doc_id,
         |         CASE WHEN c1 IS NOT NULL
         |              THEN greatest(c12v - ${KnD}E0, 0.0E0) / c1 + (${KnD}E0 * n1f / c1) * pcont
         |              ELSE pcont END AS p
         |       FROM sc),
         |lp AS (SELECT doc_id, round(ln(p) * 1e6)::BIGINT AS ilp FROM pr)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(sum(ilp)::BIGINT / (count(*) * 1e6), 6) AS mean_logp,
         |  round(exp(-(sum(ilp)::BIGINT / (count(*) * 1e6))), 6) AS ppl
         |FROM lp GROUP BY 1""".stripMargin,

    "q_textrank" -> {
      val stops = graft.text.TextFunctions.LangProfiles.toMap.apply("en")
        .map(t => s"'$t'").mkString(", ")
      val sc = graft.text.TextRank.Scale
      val it = graft.text.TextRank.Iters
      val base = sc * 15L / 100L
      val (dn, dd) = (graft.text.TextRank.DampNum, graft.text.TextRank.DampDen)
      s"""WITH RECURSIVE tk AS (
         |  SELECT doc_id, i - 1 AS pos, ws[i] AS tok
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
         |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))
         |  WHERE regexp_matches(ws[i], '^[a-z]+$$') AND ws[i] NOT IN ($stops)),
         |vocab AS (SELECT tok, count(*) AS freq FROM tk GROUP BY 1 HAVING count(*) >= $TrMinFreq),
         |vt AS (SELECT t.doc_id, t.pos, t.tok,
         |         row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS rn
         |       FROM tk t JOIN vocab v ON t.tok = v.tok),
         |prs AS (SELECT least(a.tok, b.tok) AS a, greatest(a.tok, b.tok) AS b, count(*) AS w
         |        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
         |        WHERE a.tok <> b.tok GROUP BY 1, 2),
         |widx AS (SELECT tok, freq, row_number() OVER (ORDER BY tok) AS i FROM vocab),
         |n AS (SELECT count(*)::BIGINT AS n FROM widx),
         |sym AS (SELECT ia.i AS i, ib.i AS j, p.w FROM prs p
         |          JOIN widx ia ON p.a = ia.tok JOIN widx ib ON p.b = ib.tok
         |        UNION ALL
         |        SELECT ib.i, ia.i, p.w FROM prs p
         |          JOIN widx ia ON p.a = ia.tok JOIN widx ib ON p.b = ib.tok),
         |wout AS (SELECT i, sum(w)::BIGINT AS wo FROM sym GROUP BY 1),
         |adj AS (SELECT w.i,
         |          list(struct_pack(j := s.j,
         |                 pw := round(s.w::DOUBLE / wo2.wo * $sc)::BIGINT) ORDER BY s.j)
         |            FILTER (WHERE s.j IS NOT NULL) AS nb
         |        FROM widx w
         |        LEFT JOIN sym s ON s.i = w.i
         |        LEFT JOIN wout wo2 ON s.j = wo2.i
         |        GROUP BY w.i),
         |adjl AS (SELECT list(nb ORDER BY i) AS al, max(n.n) AS n FROM adj CROSS JOIN n),
         |pi AS (
         |  SELECT 0 AS it, list_transform(range(1, n + 1), x -> $sc // n) AS r, al, n FROM adjl
         |  UNION ALL
         |  SELECT it + 1,
         |    list_transform(range(1, n + 1),
         |      i -> ($base // n + (list_sum(list_concat([0::BIGINT],
         |             list_transform(coalesce(al[i], []), p -> (r[p.j] * p.pw) // $sc)))
         |             * $dn) // $dd)::BIGINT),
         |    al, n
         |  FROM pi WHERE it < $it),
         |fin AS (SELECT r, n FROM pi WHERE it = $it),
         |ranks AS (SELECT unnest(r) AS rr, generate_subscripts(r, 1) AS i FROM fin)
         |SELECT w.tok AS word, w.freq, round(rk.rr / 1e9, 6) AS rank
         |FROM ranks rk JOIN widx w ON rk.i = w.i
         |ORDER BY rank DESC, word ASC LIMIT $TrTopK""".stripMargin
    }
  )
}

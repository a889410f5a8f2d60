package graft.queries

import graft._
import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.7–§2.10 LLM-pipeline operators over `documents` / `embeddings`.
  * Hashes are md5-derived and LSH planes are integer-LCG noise, so the
  * DuckDB oracle reproduces signatures, buckets and similarities exactly.
  */
object LlmQueries {
  private val NumPerms = 64
  private val Bands = 16
  private val Rows = NumPerms / Bands
  private val P = TextFunctions.MinHashPrime
  private val perms = TextFunctions.permParams(NumPerms)

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Shared near-dup cluster table (doc_id, cluster_id, cluster_size):
    * exact-dup star edges ∪ thresholded MinHash-LSH pairs collapsed by
    * connected components. Used by q_dedup_clusters (the cluster view)
    * and q_dedup_keep (the per-source kept-corpus manifest).
    */
  private def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val fp = docs(s, dir).select(col("doc_id"), md5(col("text")).as("fp"))
    val gmin = fp.groupBy("fp")
      .agg(min("doc_id").as("m"), count(lit(1)).as("c")).where(col("c") > 1)
    // star edges (min-id hub per fingerprint group): same components as
    // the m² clique, linear edge count — the 100 TB-safe encoding
    val exactE = fp.join(gmin, "fp").where(col("doc_id") > col("m"))
      .select(col("m").as("i"), col("doc_id").as("j"))
    val nearE = Dedup.minhashLshPairs(docs(s, dir), NumPerms, Bands)
      .where(col("est_jaccard") >= 0.5).select("i", "j")
    val cc = Dedup.connectedComponents(exactE.union(nearE))
    val sizes = cc.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "label")
      .select(col("u").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }
  private def embs(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  private val EnStop = Seq("the", "a", "and", "of", "to", "is", "in", "it")

  // ---- shared SQL fragments --------------------------------------------

  /** tokens / distinct 3-shingles per doc (docs with < 3 tokens emit no
    * shingles — mirrors TextFunctions.shingles' guard exactly). */
  private val shSql =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         CASE WHEN len(t) >= 3
      |              THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |              ELSE []::VARCHAR[] END
      |       )) AS shingle FROM toks)""".stripMargin

  /** df-capped shingles (stop-shingle removal, Dedup.ngramJaccardPairs). */
  private val shCapSql =
    """shc AS (SELECT doc_id, shingle FROM (
      |  SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
      |  WHERE df <= 50)""".stripMargin

  private val h31Sql = s"(('0x' || substr(md5(shingle), 1, 15))::BIGINT % $P)"

  private def minhashAggSql: String =
    perms.zipWithIndex.map { case ((a, b), i) => s"min((h * $a + $b) % $P) AS mh$i" }.mkString(", ")

  private val sigSql =
    s"""hs AS (SELECT doc_id, $h31Sql AS h FROM sh),
       |sig AS (SELECT doc_id, $minhashAggSql FROM hs GROUP BY 1)""".stripMargin

  /** Oracle CTE chain for the near-dup cluster table, ending at
    * `labels(doc_id, cluster_id)` — transitive closure of exact-dup star
    * edges ∪ thresholded MinHash-LSH pairs. Shared by the
    * q_dedup_clusters and q_dedup_keep oracles.
    */
  private lazy val clustersCtes: String = {
    val bandSelects = (0 until Bands).map { b =>
      val cols = (0 until Rows).map(r => s"mh${b * Rows + r}")
      s"SELECT doc_id, $b AS band, concat(${cols.mkString(", '_', ")}) AS bsig FROM sig"
    }.mkString("\nUNION ALL\n")
    val est = (0 until NumPerms).map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""$shSql,
       |$sigSql,
       |banded AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |         FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |near_e AS (SELECT i, j FROM cand JOIN sig sa ON i = sa.doc_id JOIN sig sb ON j = sb.doc_id
       |           WHERE round(($est)::DOUBLE / $NumPerms, 6) >= 0.5),
       |fpc AS (SELECT doc_id, md5(text) AS fp FROM documents),
       |gmin AS (SELECT fp, min(doc_id) AS m FROM fpc GROUP BY 1 HAVING count(*) > 1),
       |exact_e AS (SELECT m AS i, doc_id AS j FROM fpc JOIN gmin USING (fp) WHERE doc_id > m),
       |edges AS (SELECT i, j FROM exact_e UNION SELECT i, j FROM near_e),
       |sym AS (SELECT i AS u, j AS v FROM edges UNION SELECT j AS u, i AS v FROM edges),
       |reach AS (SELECT u, v FROM sym
       |          UNION
       |          SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u),
       |labels AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY 1)""".stripMargin
  }

  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a::DOUBLE[], $b::DOUBLE[]), x -> x[1] * x[2]))"
  private def normSql(v: String) =
    s"sqrt(list_sum(list_transform($v::DOUBLE[], x -> x * x)))"
  private[queries] def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Oracle twin of the ADAPTIVE cosine-LSH banding: the step table is
    * interpolated verbatim from [[Ann.lshStepsValuesSql]] (the single
    * shared literal — editing Ann.LshSteps changes both engines), the
    * applicable (rows, bands) row is picked by the SAME `n ≤ maxN` rule
    * on the oracle's own count(*), and the plane grid (band, r, plane =
    * band·rows + r) is unnested data-driven rather than unrolled — any
    * step size replays without regenerating SQL. Per-plane projection
    * arithmetic is the identical LCG expression LshBandBuckets compiles;
    * bucket bits sum order-free, so the fold order difference is moot.
    * A NULL/empty embedding projects NULL → every CASE is 0 → bucket 0
    * per band, matching the Spark side's coalesce-to-zero buckets.
    */
  private[queries] lazy val adaptiveBandsSql: String =
    s"""lshcnt AS (SELECT count(*) AS n FROM embeddings),
       |lshstep AS (SELECT rows_, bands_ FROM (VALUES ${Ann.lshStepsValuesSql}) t(maxn, rows_, bands_)
       |            WHERE (SELECT n FROM lshcnt) <= maxn ORDER BY maxn LIMIT 1),
       |lshband AS (SELECT rows_, unnest(range(0, bands_))::INT AS band FROM lshstep),
       |lshplane AS (SELECT band, r, band * rows_ + r AS plane FROM (
       |             SELECT rows_, band, unnest(range(0, rows_))::INT AS r FROM lshband)),
       |lshproj AS (SELECT e.vec_id, p.band, p.r,
       |  list_sum(list_transform(list_zip(e.embedding::DOUBLE[], range(0, 64)),
       |    x -> x[1] * ((((p.plane * 64 + x[2]) * 2654435761) % 1000003) / 1000003.0 - 0.5))) AS prj
       |  FROM embeddings e CROSS JOIN lshplane p),
       |bands AS (SELECT vec_id, band, sum(CASE WHEN prj >= 0 THEN (1::BIGINT << r) ELSE 0 END)::BIGINT AS bucket
       |          FROM lshproj GROUP BY 1, 2)""".stripMargin

  /** Oracle twin of the REAL aHash (Multimodal.phashBmp): BMP dims from
    * the asset-key md5 (the 16-bit shared-asset id — docs embedding the
    * same image get byte-identical BMPs), per-cell nearest-pixel index
    * p = ((cell÷8)·h÷8)·w + ((cell%8)·w÷8), BT.601 integer luma from the
    * _px chain bytes, bit set iff 64·luma > Σluma (exact integers). Bit
    * 63 can't be built by `1::BIGINT << 63` (DuckDB raises on the
    * overflow) — the CASE adds −2⁶³ instead, which IS the
    * two's-complement value of that bit, so the HUGEINT sum casts back
    * to the exact signed Long Spark emits. */
  private lazy val aHashCtes: String = {
    def chainByteSql(k: String) =
      s"('0x' || substr(md5(img_key || '_px' || (($k) // 16)::VARCHAR), (($k) % 16) * 2 + 1, 2))::BIGINT"
    s"""dims AS (SELECT doc_id, substr(md5(text), 1, 4) AS img_key,
       |    4 + ('0x' || substr(md5(substr(md5(text), 1, 4)), 1, 2))::INT % 5 AS w,
       |    3 + ('0x' || substr(md5(substr(md5(text), 1, 4)), 3, 2))::INT % 4 AS h
       |  FROM documents),
       |cg AS (SELECT doc_id, img_key, w, h, unnest(range(0, 64)) AS cell FROM dims),
       |cp AS (SELECT doc_id, img_key, cell, (((cell // 8) * h) // 8) * w + ((cell % 8) * w) // 8 AS p FROM cg),
       |lum AS (SELECT doc_id, cell,
       |    299 * ${chainByteSql("3 * p + 2")} + 587 * ${chainByteSql("3 * p + 1")}
       |      + 114 * ${chainByteSql("3 * p")} AS luma
       |  FROM cp),
       |tot AS (SELECT doc_id, sum(luma)::BIGINT AS s FROM lum GROUP BY 1),
       |ph AS (SELECT l.doc_id,
       |    sum(CASE WHEN 64 * l.luma > t.s THEN
       |          CASE WHEN l.cell = 63 THEN (-9223372036854775807)::BIGINT - 1
       |               ELSE (1::BIGINT << l.cell::INT) END
       |        ELSE 0 END)::BIGINT AS phash
       |  FROM lum l JOIN tot t ON l.doc_id = t.doc_id GROUP BY 1)""".stripMargin
  }

  /** Oracle twin of the 256-bit aHash (Multimodal.phash256Bmp): the
    * 16×16 grid generalization of [[aHashCtes]] — cell p-index uses /16,
    * threshold 256·luma > Σluma, and the 256 bits fold into four BIGINT
    * words (bit cell%64 of word cell/64, with the same −2⁶³ trick for
    * each word's top bit). */
  private lazy val aHash256Ctes: String = {
    def chainByteSql(k: String) =
      s"('0x' || substr(md5(img_key || '_px' || (($k) // 16)::VARCHAR), (($k) % 16) * 2 + 1, 2))::BIGINT"
    s"""dims AS (SELECT doc_id, substr(md5(text), 1, 4) AS img_key,
       |    4 + ('0x' || substr(md5(substr(md5(text), 1, 4)), 1, 2))::INT % 5 AS w,
       |    3 + ('0x' || substr(md5(substr(md5(text), 1, 4)), 3, 2))::INT % 4 AS h
       |  FROM documents),
       |cg AS (SELECT doc_id, img_key, w, h, unnest(range(0, 256)) AS cell FROM dims),
       |cp AS (SELECT doc_id, img_key, cell, (((cell // 16) * h) // 16) * w + ((cell % 16) * w) // 16 AS p FROM cg),
       |lum AS (SELECT doc_id, cell,
       |    299 * ${chainByteSql("3 * p + 2")} + 587 * ${chainByteSql("3 * p + 1")}
       |      + 114 * ${chainByteSql("3 * p")} AS luma
       |  FROM cp),
       |tot AS (SELECT doc_id, sum(luma)::BIGINT AS s FROM lum GROUP BY 1),
       |phw AS (SELECT l.doc_id, l.cell // 64 AS wd,
       |    sum(CASE WHEN 256 * l.luma > t.s THEN
       |          CASE WHEN l.cell % 64 = 63 THEN (-9223372036854775807)::BIGINT - 1
       |               ELSE (1::BIGINT << (l.cell % 64)::INT) END
       |        ELSE 0 END)::BIGINT AS w
       |  FROM lum l JOIN tot t ON l.doc_id = t.doc_id GROUP BY 1, 2),
       |ph256 AS (SELECT doc_id,
       |    sum(CASE WHEN wd = 0 THEN w ELSE 0 END)::BIGINT AS ph0,
       |    sum(CASE WHEN wd = 1 THEN w ELSE 0 END)::BIGINT AS ph1,
       |    sum(CASE WHEN wd = 2 THEN w ELSE 0 END)::BIGINT AS ph2,
       |    sum(CASE WHEN wd = 3 THEN w ELSE 0 END)::BIGINT AS ph3
       |  FROM phw GROUP BY 1)""".stripMargin
  }

  private def langScoreSql(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))"

  // ---- deterministic Lloyd replay (shared by q_kmeans / q_ann_ivf) -----

  private def kmD2Sql(v: String, c: String) =
    s"list_sum(list_transform(list_zip($v::DOUBLE[], $c), p -> (p[1] - p[2]) * (p[1] - p[2])))"

  private def kmAssignSql(i: Int) =
    s"""as$i AS (SELECT vec_id, embedding, cell, d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk FROM (
       |    SELECT e.vec_id, e.embedding, c.cell, ${kmD2Sql("e.embedding", "c.centroid")} AS d2
       |    FROM embeddings e CROSS JOIN cents$i c))
       |  WHERE rk = 1)""".stripMargin

  private def kmUpdateSql(i: Int) =
    s"""cents${i + 1} AS (
       |  SELECT cell, list(cx ORDER BY dim) AS centroid FROM (
       |    SELECT cell, dim, avg(x) AS cx FROM (
       |      SELECT a.cell, generate_subscripts(a.embedding, 1) - 1 AS dim, unnest(a.embedding)::DOUBLE AS x
       |      FROM as$i a)
       |    GROUP BY 1, 2) GROUP BY 1)""".stripMargin

  /** cents0 → (assign, update)ⁿ → centsN, then a final assignment asN —
    * exactly [[graft.ann.KMeansDet.fit]] + [[graft.ann.KMeansDet.assign]]. */
  private[queries] def kmChainSql(k: Int, iters: Int): String = {
    val rounds = (0 until iters).map(i => s"${kmAssignSql(i)},\n${kmUpdateSql(i)}").mkString(",\n")
    s"""cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding::DOUBLE[] AS centroid
       |                FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${kmAssignSql(iters)}""".stripMargin
  }

  // ---- queries ----------------------------------------------------------

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        TextFunctions.nTokens(col("text")).cast("long").as("n_tokens"),
        size(array_distinct(TextFunctions.tokens(col("text")))).cast("long").as("n_unique"),
        // BPE-style pre-tokenizer count: alpha runs, digit runs, and
        // single punctuation marks each count as a token (the GPT-2
        // pre-tokenization flavor, RE2 ∩ java.regex safe)
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")
          .as("n_tokens_bpe"))),

    // per-doc novelty: the share of a doc's distinct 3-shingles that
    // appear NOWHERE else in the corpus (df == 1) — low novelty flags
    // boilerplate/template mass that survives near-dedup because no
    // single pair crosses the Jaccard threshold. One shingle shuffle +
    // one df join; integer counts, one exact ratio. Docs under 3 tokens
    // have no shingles and drop out on both engines.
    "q_doc_novelty" -> ((s, dir) => {
      // df as a count-over-shingle window (the ngramJaccardPairs shape):
      // ONE shingle shuffle instead of aggregate + join-back, and the
      // shingle explode runs once instead of twice (r12: 2 Exchange of
      // the exploded shingles -> 1)
      val sh = Dedup.docShingles(docs(s, dir))
      val w = Window.partitionBy("shingle")
      sh.withColumn("df", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast("double") / col("n_shingles"), 6))
    }),

    // tokenizer-efficiency profile per source: chars-per-BPE-token (the
    // compression proxy a tokenizer team tracks per domain) and fertility
    // (BPE tokens per whitespace word — high fertility flags scripts or
    // noise the tokenizer fragments). Ratios derive from summed BIGINTs,
    // so the 6-dp outputs are engine-exact; one aggregation pass.
    "q_tokenizer_fertility" -> ((s, dir) =>
      docs(s, dir).groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        sum(TextFunctions.nTokens(col("text")).cast("long")).as("n_words"),
        sum(regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long"))
          .as("n_tokens_bpe"))
        .withColumn("chars_per_token",
          round(col("n_chars").cast("double") / col("n_tokens_bpe"), 6))
        .withColumn("fertility",
          round(col("n_tokens_bpe").cast("double") / col("n_words"), 6))),

    // the first query a pipeline runs on a new corpus: per-source profile
    // in ONE aggregation pass — volume, token budget, exact-dup rate
    // (count vs distinct content hash), language spread, mean quality
    "q_corpus_stats" -> ((s, dir) =>
      docs(s, dir).groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        sum(TextFunctions.nTokens(col("text")).cast("long")).as("n_tokens"),
        round(avg(TextFunctions.nTokens(col("text")).cast("double")), 6).as("mean_tokens"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        round((count(lit(1)) - countDistinct(md5(col("text")))).cast("double") / count(lit(1)), 6).as("dup_rate"),
        round(avg(TextFunctions.alphaRatio(col("text"))), 6).as("mean_alpha"))),

    "q_text_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        round(TextFunctions.meanTokenLen(col("text")), 6).as("mean_token_len"),
        round(TextFunctions.alphaRatio(col("text")), 6).as("alpha_ratio"),
        round(TextFunctions.stopwordRatio(col("text"), EnStop), 6).as("stopword_ratio"),
        round(
          TextFunctions.alphaRatio(col("text")) * 0.5
            + least(TextFunctions.nTokens(col("text")).cast("double") / 100, lit(1.0)) * 0.3
            + TextFunctions.stopwordRatio(col("text"), EnStop) * 0.2, 6).as("quality_score"))),

    // quality-decile binning (the DCLM/FineWeb-style data-selection step):
    // the q_text_quality composite score deciles each source's docs via
    // ntile; downstream mixing samples by bin (keep the top deciles,
    // down-weight the rest). One source-keyed window shuffle + one
    // aggregate; bin populations are corpus-size/10 regardless of scale.
    "q_quality_bins" -> ((s, dir) => {
      val score = round(
        TextFunctions.alphaRatio(col("text")) * 0.5
          + least(TextFunctions.nTokens(col("text")).cast("double") / 100, lit(1.0)) * 0.3
          + TextFunctions.stopwordRatio(col("text"), EnStop) * 0.2, 6)
      val w = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.nTokens(col("text")).cast("long").as("n_tokens"), score.as("score"))
        .withColumn("bin", ntile(10).over(w))
        .groupBy("source", "bin").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          // sum, not mean: the mean of round-6 scores lands exactly on a
          // .5e-6 rounding boundary whenever the sum's last digit is odd,
          // where Spark (decimal HALF_UP) and DuckDB (binary) disagree;
          // sums of 1e-6 multiples never sit on a boundary
          round(sum("score"), 6).as("sum_score"),
          min("score").as("min_score"), max("score").as("max_score"))
    }),

    // ── Language-ID evaluation: the confusion rollup of q_text_langid's
    // heuristic against the gold lang label — per (true, predicted) cell
    // count, per-class recall/precision and F1, all exact integer ratios
    // with window sums over the ≤#langs² cell frame. The eval a routing
    // pipeline publishes before trusting the router. ──
    "q_langid_eval" -> ((s, dir) => {
      val scored = TextFunctions.LangProfiles.foldLeft(docs(s, dir)) { case (d, (lang, words)) =>
        d.withColumn(s"score_$lang", TextFunctions.wordListHits(col("text"), words).cast("long"))
      }
      val langs = TextFunctions.LangProfiles.map(_._1)
      val best = langs.map(l => struct(col(s"score_$l").as("score"), lit(l).as("lang")))
        .reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
      val cells = scored.withColumn("pred_lang", best.getField("lang"))
        .groupBy(col("lang").as("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val wT = Window.partitionBy("true_lang")
      val wP = Window.partitionBy("pred_lang")
      cells
        .withColumn("n_true", sum("n").over(wT))
        .withColumn("n_pred", sum("n").over(wP))
        .withColumn("recall",
          when(col("true_lang") === col("pred_lang"),
            col("n").cast("double") / col("n_true").cast("double")))
        .withColumn("precision",
          when(col("true_lang") === col("pred_lang"),
            col("n").cast("double") / col("n_pred").cast("double")))
        .select(col("true_lang"), col("pred_lang"), col("n"),
          col("n_true"), col("n_pred"),
          round(col("recall"), 6).as("recall"),
          round(col("precision"), 6).as("precision"),
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6).as("f1"))
    }),

    "q_text_langid" -> ((s, dir) => {
      val scored = TextFunctions.LangProfiles.foldLeft(docs(s, dir)) { case (d, (lang, words)) =>
        d.withColumn(s"score_$lang", TextFunctions.wordListHits(col("text"), words).cast("long"))
      }
      val langs = TextFunctions.LangProfiles.map(_._1)
      val best = langs.map(l => struct(col(s"score_$l").as("score"), lit(l).as("lang")))
        .reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
      scored
        .withColumn("pred_lang", best.getField("lang"))
        .withColumn("is_correct", (col("pred_lang") === col("lang")).cast("int"))
        .select((col("doc_id") +: col("lang") +: langs.map(l => col(s"score_$l")) :+
          col("pred_lang") :+ col("is_correct")): _*)
    }),

    // corpus-trained statistical quality: char-bigram cross-entropy (the
    // perplexity-filter shape of CCNet-style pipelines — train counts in
    // one aggregate over the corpus, broadcast the model, score per doc;
    // junk text scores high, natural text low)
    "q_text_perplexity" -> ((s, dir) => {
      // per-doc bigram COUNTS first: one explosion + one (doc, bg)
      // aggregate, then training, vocab, and scoring all run on the
      // count table — the corpus chars are walked twice total instead of
      // four times (the previous shape branched train/vocab/score off the
      // raw instance explode). Scoring weights by cnt, mathematically the
      // instance average; the oracle mirrors the same weighted shape.
      val dbg = docs(s, dir).select(col("doc_id"), explode(expr(
        """CASE WHEN length(text) >= 2
          |  THEN transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))
          |  ELSE array() END""".stripMargin)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      // bc feeds three branches but they all consume the same columns, so
      // ReuseExchange dedups the aggregate inside the one physical plan —
      // materializing it measured SLOWER (4.3 → 7.3 s warm, r12)
      val bc = dbg.groupBy("bg").agg(sum("cnt").as("nbg"))
      val c1 = bc.groupBy(expr("substring(bg, 1, 1)").as("c1")).agg(sum("nbg").as("nc1"))
      val v = bc.agg(countDistinct(expr("substring(bg, 2, 1)")).as("vv"))
      // per-bigram score table: the log/divide runs once per DISTINCT
      // bigram (vocab-sized), and the scoring pass is a broadcast join
      // picking precomputed scores. Model trained on the corpus being
      // scored, so every bigram hits the table — no smoothing fallback row.
      val sc = bc.join(c1, expr("substring(bg, 1, 1)") === col("c1"))
        .crossJoin(v)
        .select(col("bg"), (-log((col("nbg") + lit(1)).cast("double")
          / (col("nc1") + col("vv")).cast("double"))).as("score"))
      dbg.join(broadcast(sc), Seq("bg"))
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_bigrams"),
          round(sum(col("cnt") * col("score")) / sum("cnt"), 6).as("xent"))
    }),

    // Gopher-style repetition filters (Rae et al. 2021 §A1.1, as used by
    // NeMo-Curator/Dolma): fraction of characters covered by the most
    // frequent word 2-gram (ties → lexicographically smallest gram) and by
    // all duplicated word 5-grams (overlap-naive: count·len/total, the
    // standard open-source approximation). One explode → one (doc, n, gram)
    // aggregation; shuffle is keyed by (doc, gram) so a 100 TB corpus
    // spreads by document, never concentrates.
    "q_text_repetition" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), length(col("text")).as("nc"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 5)
      def grams(n: Int) = base.select(col("doc_id"), col("nc"), lit(n).as("n"),
        explode(expr(s"transform(sequence(0, size(ws) - $n), i -> " +
          s"array_join(slice(ws, i + 1, $n), ' '))")).as("gram"))
      val counts = grams(2).union(grams(5))
        .groupBy("doc_id", "nc", "n", "gram").agg(count(lit(1)).as("cnt"))
      val top2 = counts.where(col("n") === 2)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("cnt").desc, col("gram"))))
        .where(col("rk") === 1)
        .select(col("doc_id"),
          (col("cnt") * length(col("gram")) / col("nc")).as("top2"))
      val dup5 = counts.where(col("n") === 5 && col("cnt") > 1)
        .groupBy("doc_id")
        .agg((sum(col("cnt") * length(col("gram"))) / first(col("nc"))).as("dup5"))
      base.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
        .join(top2, Seq("doc_id"), "left")
        .join(dup5, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          round(coalesce(col("top2"), lit(0.0)), 6).as("top2_char_frac"),
          round(coalesce(least(col("dup5"), lit(1.0)), lit(0.0)), 6).as("dup5_char_frac"))
    }),

    // the end-to-end keep/drop decision a training-data pipeline actually
    // ships: Gopher-inspired rule cascade over the quality signals, with
    // the FIRST failing rule as the drop reason (auditable filtering).
    // One doc scan + one (doc, gram) aggregation; every signal is exact
    // integer-derived arithmetic so the rule outcomes are engine-stable.
    "q_doc_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id"),
        TextFunctions.nTokens(col("text")).cast("long").as("n_words"),
        TextFunctions.meanTokenLen(col("text")).as("mtl"),
        TextFunctions.alphaRatio(col("text")).as("alpha"),
        TextFunctions.stopwordRatio(col("text"), EnStop).as("stop"),
        length(col("text")).as("nc"))
      val top2 = d.select(col("doc_id"), length(col("text")).as("nc"), split(col("text"), " ").as("_ws"))
        .select(col("doc_id"), col("nc"),
          // _ws is a materialized column: an inline split inside the
          // lambda would re-tokenize the doc once per gram
          explode(expr("CASE WHEN size(_ws) >= 2 THEN " +
            "transform(sequence(0, size(_ws) - 2), i -> " +
            "array_join(slice(_ws, i + 1, 2), ' ')) " +
            "ELSE array() END")).as("gram"))
        .groupBy("doc_id", "nc", "gram").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg((max(col("cnt") * length(col("gram"))) / first("nc")).as("rep"))
      base.join(top2, Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("rep"), lit(0.0)))
        .withColumn("fail_reason",
          when(col("n_words") < 10, "too_short")
            .when(col("n_words") > 1000, "too_long")
            .when(col("mtl") < 2.0 || col("mtl") > 12.0, "token_len")
            .when(col("alpha") < 0.5, "low_alpha")
            .when(col("stop") < 0.01, "no_stopwords")
            .when(col("rep") >= 0.15, "repetitive")
            .otherwise("ok"))
        .select(col("doc_id"), col("n_words"),
          round(col("mtl"), 6).as("mean_token_len"),
          round(col("alpha"), 6).as("alpha_ratio"),
          round(col("stop"), 6).as("stopword_ratio"),
          round(col("rep"), 6).as("rep_frac"),
          (col("fail_reason") === "ok").cast("int").as("keep"),
          col("fail_reason"))
    }),

    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))),

    "q_dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),

    // incremental ingest: docs with id >= 300 arrive as the new batch and
    // dedup against the fingerprint store of the first 300 (the only
    // corpus state an ingest pipeline carries forward)
    "q_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incremental(
        d.where(col("doc_id") >= 300),
        d.where(col("doc_id") < 300).select(md5(col("text")).as("fp")))
    }),

    // winnowing fingerprint summary per doc (the selected-hash SET is
    // what a real pipeline would explode and join on)
    "q_winnow" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextFunctions.winnow(col("text")).as("fps"))
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fps"),
          array_min(col("fps")).as("fp_min"), array_max(col("fps")).as("fp_max"))),

    "q_dedup_ngram_jaccard" -> ((s, dir) =>
      // top-20 via orderBy+limit → TakeOrderedAndProject (distributed
      // per-partition top-k + tiny driver merge), NOT a single-partition
      // global window sort of every candidate pair
      Dedup.ngramJaccardPairs(docs(s, dir))
        .orderBy(col("jaccard").desc, col("i"), col("j")).limit(20)
        .select(col("i"), col("j"), col("common"), col("ni"), col("nj"), col("jaccard"))),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), NumPerms)
        .select((col("doc_id") +: (0 until 8).map(i => col(s"mh$i"))): _*)),

    // ── Dedup recall against planted ground truth (the q_detector_eval
    // of the dedup family): every 5th doc gets a clone with every 10th
    // token dropped (~J≈0.57 on 3-shingles), the PRODUCTION MinHash-LSH
    // pair generator runs over base ∪ clones, and recall of the planted
    // pairs is reported at est-Jaccard thresholds 0.3/0.5/0.7 — the
    // measured LSH miss rate (theory: 1−(1−J⁴)¹⁶ ≈ 0.83 at J≈0.57) that
    // q_minhash_calibration's survivor-restricted exactness check cannot
    // see. Shapes: the standard banded pair join; the planted table is
    // #clones rows; thresholds are a 3-row broadcast. ──
    "q_dedup_eval" -> ((s, dir) => {
      import s.implicits._
      val base = docs(s, dir).select("doc_id", "text")
      val clones = base.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          array_join(expr("filter(split(text, ' '), (w, i) -> (i + 1) % 10 != 0)"), " ").as("text"))
      val corpus = base.unionByName(clones)
      val pairs = Dedup.minhashLshPairs(corpus)
      val planted = base.where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("i"), (col("doc_id") + lit(1000000L)).as("j"))
      val th = Seq(0.3, 0.5, 0.7).toDF("threshold")
      planted.join(pairs, Seq("i", "j"), "left")
        .crossJoin(broadcast(th))
        .groupBy("threshold").agg(
          count(lit(1)).as("n_planted"),
          sum(when(col("est_jaccard") >= col("threshold"), 1L).otherwise(0L)).as("n_found"))
        .withColumn("recall", round(col("n_found").cast("double") / col("n_planted"), 6))
    }),

    "q_dedup_minhash_pairs" -> ((s, dir) =>
      // ranked (not thresholded) so the output is stable even if no pair
      // clears a similarity bar; distributed top-k, no global window
      Dedup.minhashLshPairs(docs(s, dir), NumPerms, Bands)
        .orderBy(col("est_jaccard").desc, col("i"), col("j")).limit(20)),

    // MinHash estimator calibration: for every LSH candidate pair, the
    // 64-perm Jaccard ESTIMATE against the EXACT shingle-set Jaccard —
    // the measurement a dedup deployment runs before trusting a
    // signature-only threshold at corpus scale. The exact side restricts
    // the (uncapped) shingle self-join to candidate docs FIRST, so the
    // expensive exact computation touches only the LSH survivors — never
    // the full corpus pair space.
    "q_minhash_calibration" -> ((s, dir) => {
      val d = docs(s, dir)
      // materialize once: FOUR consumers below (candDocs twice, the
      // intersection join, the final est/exact join) would each replay
      // the signature + band-join plan otherwise
      val cand = Scratch.materialize(Dedup.minhashLshPairs(d, NumPerms, Bands), "mh_cal_cand")
      val sh = Dedup.docShingles(d)
      val candDocs = cand.select(col("i").as("doc_id"))
        .union(cand.select(col("j").as("doc_id"))).distinct()
      // materialized (the q_dedup_containment discipline): THREE consumers
      // (sizes + both sides of the intersection join) would each replay
      // the doc scan + shingle explode otherwise
      val shc = Scratch.materialize(
        sh.join(broadcast(candDocs), "doc_id"), "mh_cal_shc")
      // full per-doc set sizes, but computed on the candidate slice only
      val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      // intersection sizes restricted to the CANDIDATE PAIRS, not to all
      // pairs of candidate docs sharing a shingle: explode each pair to
      // i's shingles (pair-bounded), then a (j, shingle) key-equality
      // join keeps the common ones — cost is Σ_pairs |sh(i)|, never the
      // Σ_shingle df² of a shingle self-join
      val common = cand.select("i", "j")
        .join(shc.select(col("doc_id").as("i"), col("shingle")), Seq("i"))
        .join(shc.select(col("doc_id").as("j"), col("shingle")), Seq("j", "shingle"))
        .groupBy("i", "j").agg(count(lit(1)).as("common"))
      cand.join(common, Seq("i", "j"), "left")
        .join(broadcast(sizes.select(col("doc_id").as("i"), col("nsh").as("ni"))), "i")
        .join(broadcast(sizes.select(col("doc_id").as("j"), col("nsh").as("nj"))), "j")
        .withColumn("c0", coalesce(col("common"), lit(0L)))
        .withColumn("exact_jaccard", round(col("c0") / (col("ni") + col("nj") - col("c0")), 6))
        .withColumn("abs_err", round(abs(col("est_jaccard") - col("exact_jaccard")), 6))
        .orderBy(col("est_jaccard").desc, col("i"), col("j")).limit(20)
        .select(col("i"), col("j"), col("est_jaccard"), col("exact_jaccard"), col("abs_err"))
    }),

    // Asymmetric containment near-dup — the quote/subset detector: a doc
    // wholly contained in a much larger one has containment |A∩B|/|A| ≈ 1
    // while Jaccard ≈ |A|/|B| stays far below any dedup threshold, so
    // symmetric near-dup passes keep both copies. Candidates come from
    // the SAME LSH band join as q_dedup_minhash_pairs (banding recalls
    // asymmetric pairs too — the shared shingles still dominate the
    // smaller doc's signature), exact distinct-shingle intersections are
    // computed on the survivors only (the calibration discipline:
    // pair-bounded explode + key-equality join, never a shingle
    // self-join), and both directions are emitted. Integer counts, two
    // exact ratios.
    "q_dedup_containment" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = Scratch.materialize(
        Dedup.minhashLshPairs(d, NumPerms, Bands).select("i", "j"), "cont_cand")
      val sh = Dedup.docShingles(d)
      val candDocs = cand.select(col("i").as("doc_id"))
        .union(cand.select(col("j").as("doc_id"))).distinct()
      // materialized: THREE consumers (sizes + both intersection joins)
      // would each replay the doc scan + shingle explode otherwise
      val shc = Scratch.materialize(
        sh.join(broadcast(candDocs), "doc_id"), "cont_shc")
      val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val common = cand
        .join(shc.select(col("doc_id").as("i"), col("shingle")), Seq("i"))
        .join(shc.select(col("doc_id").as("j"), col("shingle")), Seq("j", "shingle"))
        .groupBy("i", "j").agg(count(lit(1)).as("common"))
      cand.join(common, Seq("i", "j"), "left")
        .join(broadcast(sizes.select(col("doc_id").as("i"), col("nsh").as("ni"))), "i")
        .join(broadcast(sizes.select(col("doc_id").as("j"), col("nsh").as("nj"))), "j")
        .withColumn("common", coalesce(col("common"), lit(0L)))
        .withColumn("cont_i", round(col("common") / col("ni"), 6))
        .withColumn("cont_j", round(col("common") / col("nj"), 6))
        .withColumn("containment", greatest(col("cont_i"), col("cont_j")))
        .orderBy(col("containment").desc, col("i"), col("j")).limit(20)
        .select(col("i"), col("j"), col("ni"), col("nj"), col("common"),
          col("cont_i"), col("cont_j"), col("containment"))
    }),

    "q_dedup_simhash" -> ((s, dir) =>
      // maxHamming (shared literal Dedup.SimhashMaxHamming) is the
      // 4-chunk blocking's pigeonhole recall guarantee — pairs beyond it
      // are not promised, so don't emit them
      Dedup.simhashPairs(docs(s, dir))
        .orderBy(col("hamming"), col("i"), col("j")).limit(20)),

    // the dedup pipeline's END PRODUCT: per-source manifest of what
    // survives near-dup collapse — docs whose id is their cluster's
    // canonical (min) id, plus every unclustered doc. The numbers a
    // pipeline reports after its dedup pass.
    "q_dedup_keep" -> ((s, dir) => {
      val d = docs(s, dir)
      val clustered = dedupClusters(s, dir).select(col("doc_id"), col("cluster_id"))
      d.join(clustered, Seq("doc_id"), "left")
        .withColumn("keep", col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs_in"),
          sum(col("keep").cast("long")).as("docs_kept"),
          sum((!col("keep")).cast("long")).as("docs_dropped"),
          sum(when(!col("keep"), length(col("text"))).otherwise(0)).cast("long").as("chars_dropped"))
    }),

    // cluster collapse: exact-dup star edges ∪ thresholded MinHash-LSH
    // near-dup edges → connected components → (doc, cluster, size). The
    // cluster id is the smallest doc id in the component — the canonical
    // doc a pipeline would keep. Oracle computes the same components via
    // a recursive-CTE transitive closure.
    "q_dedup_clusters" -> ((s, dir) => dedupClusters(s, dir)),

    // quality-aware dedup keeper: production pipelines keep each
    // near-dup cluster's BEST member, not its smallest id — per cluster
    // the 6-dp-snapped q_text_quality composite picks the survivor
    // (ties by id). One row per cluster with the winner, the naive
    // min-id member's score, and the quality lift the smarter policy
    // buys. Scale: rides the cluster table + one cluster-keyed window.
    "q_dedup_keep_best" -> ((s, dir) => {
      val score = round(
        TextFunctions.alphaRatio(col("text")) * 0.5
          + least(TextFunctions.nTokens(col("text")).cast("double") / 100, lit(1.0)) * 0.3
          + TextFunctions.stopwordRatio(col("text"), EnStop) * 0.2, 6)
      val scored = dedupClusters(s, dir).where(col("cluster_size") >= 2)
        .join(docs(s, dir).select(col("doc_id"), score.as("score")), "doc_id")
      // ONE cluster-keyed aggregation replaces the window-top1 + min-id
      // filter + join (r12: that shape evaluated the cluster+score subtree
      // twice and paid a window sort plus an extra shuffle). The winner is
      // max(struct(score, -doc_id)) — score desc then doc_id asc, exactly
      // the old window order; the min-id member's score rides the same
      // pass as max(when(doc_id = cluster_id, score)) (every cluster
      // contains its min-id doc, so it is never null).
      scored.groupBy("cluster_id")
        .agg(max("cluster_size").as("cluster_size"),
          max(struct(col("score"), (-col("doc_id")).as("nid"))).as("b"),
          max(when(col("doc_id") === col("cluster_id"), col("score"))).as("min_id_score"))
        .select(col("cluster_id"), col("cluster_size"),
          (-col("b.nid")).as("kept_doc_id"),
          col("b.score").as("kept_score"), col("min_id_score"),
          ((-col("b.nid")) =!= col("cluster_id")).cast("int").as("beats_min_id"),
          round(col("b.score") - col("min_id_score"), 6).as("quality_lift"))
    }),

    "q_neardup_cosine" -> ((s, dir) =>
      Ann.allPairsCosine(embs(s, dir), threshold = 0.4)),

    // (rows, bands) = Ann.lshStepFor(n) — (3, 16) at gate SFs ⇒ recall
    // ≈ 1-(1-p³)¹⁶ ≈ 0.99 at cos 0.4; the banded schedule continues
    // rows +3 per 8× corpus with recall-compensating band counts
    "q_neardup_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      val st = Ann.lshStepFor(e.count())
      Ann.lshNearDupPairs(e, threshold = 0.4, bands = st.bands, rowsPerBand = st.rows)
    }),

    // embedding-side cluster collapse: the cosine near-dup pair graph
    // (LSH candidates, exact verify at a high threshold) collapsed by the
    // same connected-components machinery as the document clusters —
    // pairs → components → (vec, cluster, size)
    "q_embed_clusters" -> ((s, dir) => {
      val e = embs(s, dir)
      val st = Ann.lshStepFor(e.count())
      val pairs = Ann.lshNearDupPairs(e, threshold = 0.4, bands = st.bands,
          rowsPerBand = st.rows)
        .select(col("i"), col("j"))
      val cc = Dedup.connectedComponents(pairs)
      val sizes = cc.groupBy("label").agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "label")
        .select(col("u").as("vec_id"), col("label").as("cluster_id"), col("cluster_size"))
    }),

    // Hard-negative mining for contrastive training (the DPR/SimCSE
    // negatives shape): per anchor, the 3 most-similar corpus vectors
    // with a DIFFERENT label — the near-miss examples a retrieval or
    // embedding trainer wants in the batch. Same broadcast-probe kernel
    // as kNN (corpus never shuffles, WindowGroupLimit top-k); the label
    // inequality rides the join condition, so wrong-label filtering is
    // map-side.
    "q_hard_negatives" -> ((s, dir) => {
      val e = embs(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"), col("label").as("anchor_label"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("c.vec_id"))
      e.as("c").join(broadcast(probes),
          col("c.vec_id") =!= col("probe_id") && col("c.label") =!= col("anchor_label"))
        .withColumn("cos", graft.expressions.cosine_sim(col("pvec"), col("c.embedding")))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select(col("probe_id"), col("anchor_label"), col("c.vec_id").as("neg_id"),
          col("c.label").as("neg_label"), round(col("cos"), 6).as("cos"), col("rk"))
    }),

    "q_knn_bruteforce" -> ((s, dir) => {
      val e = embs(s, dir)
      Ann.knnBruteForce(e, graft.ann.Ann.probeSample(e), k = 5)
    }),

    "q_knn_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      Ann.knnLsh(e, graft.ann.Ann.probeSample(e), k = 5, planes = 8)
    }),

    // the recall eval every ANN deployment ships: approximate (LSH) top-k
    // joined against exact brute-force top-k on a probe SAMPLE, recall@k
    // per probe. Composes the two proven kNN kernels; the exact side runs
    // only on the sampled probes (broadcast join, corpus never shuffles),
    // which is how offline recall harnesses stay feasible at 100 TB.
    "q_ann_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
      val ex = Ann.knnBruteForce(e, probes, k = 5).select(col("probe_id"), col("neighbor_id"))
      val ap = Ann.knnLsh(e, probes, k = 5, planes = 8).select(col("probe_id"), col("neighbor_id"))
      val ln = ap.groupBy("probe_id").agg(count(lit(1)).as("n_lsh"))
      ex.join(ap.withColumn("hit", lit(1)), Seq("probe_id", "neighbor_id"), "left")
        .groupBy("probe_id").agg(
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
        .join(broadcast(ln), Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("n_lsh"), lit(0L)).as("n_lsh"), col("n_hit"),
          round(col("n_hit") / col("n_exact"), 6).as("recall"))
    }),

    // IVF recall eval — completes the ANN eval family next to
    // q_ann_recall (LSH): exact brute-force top-3 vs learned-cell IVF
    // top-3 (nprobe=2 of 8 Lloyd cells) on the probe sample, recall@3
    // per probe. The miss mass IS the cells the probe didn't scan — the
    // number an IVF deployment tunes nprobe against.
    "q_ivf_recall" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding")).persist()
      val cents = graft.ann.KMeansDet.fit(e, k = 8, iters = 3)
      val assigned = graft.ann.KMeansDet.assign(e, cents)
        .select(col("vec_id"), col("embedding"), col("cell"))
      val probes = graft.ann.Ann.probeSample(assigned)
      val ap = Ann.knnIvf(assigned, probes, cents, cell = "cell", k = 3, nprobe = 2,
        id = "vec_id", vec = "embedding").select(col("probe_id"), col("neighbor_id"))
      val ex = Ann.knnBruteForce(e, graft.ann.Ann.probeSample(e), k = 3)
        .select(col("probe_id"), col("neighbor_id"))
      val out = ex.join(ap.withColumn("hit", lit(1)), Seq("probe_id", "neighbor_id"), "left")
        .groupBy("probe_id").agg(
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
        .join(broadcast(ap.groupBy("probe_id").agg(count(lit(1)).as("n_ivf"))),
          Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("n_ivf"), lit(0L)).as("n_ivf"), col("n_hit"),
          round(col("n_hit") / col("n_exact"), 6).as("recall"))
      e.unpersist()
      out
    }),

    // full IVF: cells LEARNED by deterministic Lloyd (k=8, 3 rounds), probes
    // ranked against the fitted centroids, only the top-2 cells scanned
    "q_ann_ivf" -> ((s, dir) => {
      // persist covers the fit's per-round jobs only; unpersist before
      // returning so no cached blocks outlive the query (the final
      // action rescans the source once — one scan, zero leaked cache)
      val e = embs(s, dir).select(col("vec_id"), col("embedding")).persist()
      val cents = graft.ann.KMeansDet.fit(e, k = 8, iters = 3)
      val assigned = graft.ann.KMeansDet.assign(e, cents)
        .select(col("vec_id"), col("embedding"), col("cell"))
      val out = Ann.knnIvf(assigned, graft.ann.Ann.probeSample(assigned), cents,
        cell = "cell", k = 3, nprobe = 2, id = "vec_id", vec = "embedding")
      e.unpersist()
      out
    }),

    // learned IVF cells: deterministic distributed Lloyd (k=8, 3 rounds),
    // oracle replays the full clustering
    "q_kmeans" -> ((s, dir) =>
      graft.ann.KMeansDet.summary(embs(s, dir), k = 8, iters = 3)),

    // ── External clustering evaluation: purity and NMI of the k=8
    // deterministic Lloyd cells against the gold labels — does the
    // embedding's UNSUPERVISED structure recover the classes? Integer
    // contingency counts (the q_mutual_info telescoped-entropy trick —
    // empty cells can't drop terms), per-cell majority by deterministic
    // (count desc, label) rank; output one row per cell with the corpus
    // purity/NMI as constants. ──
    "q_cluster_purity" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = graft.ann.KMeansDet.fit(e, k = 8, iters = 3)
      val asg = graft.ann.KMeansDet.assign(e, cents).select("vec_id", "cell")
      val cells = asg.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cell", "label").agg(count(lit(1)).as("c"))
      val zk = substring(col("label").cast("string"), 1, 0)
      val wc = Window.partitionBy("cell")
      val wl = Window.partitionBy(zk, col("label"))
      val wAll = Window.partitionBy(zk)
      val t = cells
        .withColumn("csize", sum("c").over(wc))
        .withColumn("lsize", sum("c").over(wl))
        .withColumn("nn", sum("c").over(wAll))
        .withColumn("mi_t", (col("c").cast("double") / col("nn")) *
          log((col("c").cast("double") * col("nn")) / (col("csize").cast("double") * col("lsize"))))
        .withColumn("hc_t", (col("c").cast("double") / col("nn")) *
          log(col("nn").cast("double") / col("csize")))
        .withColumn("hl_t", (col("c").cast("double") / col("nn")) *
          log(col("nn").cast("double") / col("lsize")))
        .withColumn("mi", sum("mi_t").over(wAll))
        .withColumn("hc", sum("hc_t").over(wAll))
        .withColumn("hl", sum("hl_t").over(wAll))
      val rkw = Window.partitionBy("cell").orderBy(col("c").desc, col("label"))
      val maj = t.withColumn("rk", row_number().over(rkw)).where(col("rk") === 1)
      maj
        .withColumn("pur_num", sum("c").over(wAll))
        .select(col("cell"), col("csize").as("cell_size"),
          col("label").as("majority_label"),
          round(col("c").cast("double") / col("csize").cast("double"), 6).as("cell_purity"),
          round(col("pur_num").cast("double") / col("nn").cast("double"), 6).as("purity"),
          round(col("mi") / sqrt(col("hc") * col("hl")), 6).as("nmi"))
    }),

    // Johnson-Lindenstrauss random projection 64→16 dims with the same
    // deterministic hash-derived matrix family as the LSH hyperplanes:
    // entries uniform(−0.5, 0.5) scaled by sqrt(12/k) so projected norms
    // are unbiased. Per-label norm-ratio stats certify the embedding —
    // pure map-side array math, one tiny aggregation, no shuffle of
    // vectors. The dimensionality-reduction front door for downstream
    // clustering/ANN at 100 TB (16 floats/vec moves 4× less than 64).
    "q_embed_rp" -> ((s, dir) => {
      val K = 16; val D = 64
      val proj = expr(
        s"""transform(sequence(0, ${K - 1}), j ->
           |  aggregate(zip_with(embedding, sequence(0, ${D - 1}), (x, d) ->
           |    CAST(x AS DOUBLE) * ((((j * $D + d) * 2654435761) % 1000003) / 1000003.0 - 0.5)),
           |    CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) * sqrt(12.0 / $K))""".stripMargin)
      embs(s, dir)
        .withColumn("proj", proj)
        .withColumn("n2", expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * x)"))
        .withColumn("p2", expr("aggregate(proj, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"))
        .where(col("n2") > 0)
        .withColumn("ratio", sqrt(col("p2") / col("n2")))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg("ratio"), 6).as("mean_ratio"),
          round(stddev_samp(col("ratio")), 6).as("sd_ratio"))
    }),

    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.metadata(Multimodal.withPayload(docs(s, dir)))
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"), col("magic"),
          col("width"), col("height"), col("channels"))),

    // REAL BMP decode (round-10 de-stub): each doc's payload is a genuine
    // 24-bpp Windows BMP (variable 4..8 × 3..6 dims → stride padding
    // exercised); the decoder recovers the pixels only through the real
    // header/stride/bottom-up layout, and the oracle recomputes the
    // expected stats from the md5 pixel chain WITHOUT a parser — a
    // decoder bug fails the hash gate. tl_luma probes row order.
    "q_multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeBmpFeatures(Multimodal.withBmpPayload(docs(s, dir)))
        .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
          round(col("px_mean"), 6).as("px_mean"), round(col("px_std"), 6).as("px_std"),
          round(col("tl_luma"), 6).as("tl_luma"))),

    // REAL RIFF/WAVE decode: 16-bit mono PCM with an unknown LIST chunk
    // the parser must skip; mean/RMS/peak from exact integer sums.
    "q_multimodal_wav" -> ((s, dir) =>
      Multimodal.decodeWavFeatures(Multimodal.withWavPayload(docs(s, dir)))
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          round(col("pcm_mean"), 6).as("pcm_mean"), round(col("pcm_rms"), 6).as("pcm_rms"),
          col("pcm_peak"))),

    // REAL frame demux + sample (round-11 de-stub): each payload is a
    // genuine RIFF multi-frame container (odd-sized LIST chunk to skip,
    // 4..7 `fram` chunks each holding a complete BMP); the demuxer
    // recovers the frame count, samples 4 frames at even stride
    // (idx = i·n/4), and the stats come from DECODED PIXELS — a demux,
    // pad-rule, or sampling bug fails the hash gate.
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSampleBmp(Multimodal.withVideoPayload(docs(s, dir)), k = 4)
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          round(col("frame_mean"), 6).as("frame_mean"), round(col("frame_std"), 6).as("frame_std"))),

    "q_multimodal_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.metadata(Multimodal.withPayload(docs(s, dir))), 128, 128)
        .select(col("doc_id"), col("width"), col("height"),
          round(col("scale"), 6).as("scale"), col("out_w"), col("out_h"))),

    // visual near-dup: REAL aHash (round-11 de-stub) — decode the BMP,
    // 8×8 nearest-pixel luma grid, exact-integer mean threshold — pairs
    // blocked by EXACT phash equality (the degenerate band of a
    // hamming-block scheme — see q_multimodal_neardup for the
    // multi-chunk generalization). The synthesizer keys each doc's image
    // to a 16-bit shared-asset id (docs embedding the same logo/stock
    // image — how identical images actually recur in a web corpus), so
    // byte-identical images exist and MUST collide; the oracle replays
    // the pixel chain WITHOUT a parser.
    "q_multimodal_phash" -> ((s, dir) => {
      val ph = Multimodal.phashBmp(Multimodal.withBmpPayload(
        docs(s, dir).withColumn("img_key", substring(md5(col("text")), 1, 4)), text = "img_key"))
      ph.as("a").join(ph.as("b"),
          col("a.phash") === col("b.phash") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("a.phash").as("phash"))
        .orderBy("i", "j").limit(20)
    }),

    // visual near-dup: Hamming ≤ 3 over the REAL 256-bit aHash (16×16
    // grid, four 64-bit words — r12 width fix, the q_dedup_simhash
    // treatment on the multimodal axis) — a pair differing in ≤ 3 of
    // 256 bits must agree on one FULL 64-bit word (pigeonhole over 4
    // chunks), so candidates come from a word-equality join with a
    // 2⁶⁴-value bucket space (vs 2¹⁶ for 16-bit chunks of a 64-bit
    // hash), never an all-pairs scan; bit_count(xor) over all four
    // words verifies exactly.
    "q_multimodal_neardup" -> ((s, dir) => {
      val ph = Multimodal.phash256Bmp(Multimodal.withBmpPayload(
        docs(s, dir).withColumn("img_key", substring(md5(col("text")), 1, 4)), text = "img_key"))
      val words = (0 until 4).map(c => col(s"ph$c"))
      val chunks = ph.select(col("doc_id") +: words :+
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"), col(s"ph$c").as("v"))): _*)).as("ck"): _*)
        .select(col("doc_id") +: words :+ col("ck.c") :+ col("ck.v"): _*)
      chunks.as("a").join(chunks.as("b"),
          col("a.c") === col("b.c") && col("a.v") === col("b.v")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i") +: col("b.doc_id").as("j") +:
          ((0 until 4).map(c => col(s"a.ph$c").as(s"a$c")) ++
            (0 until 4).map(c => col(s"b.ph$c").as(s"b$c"))): _*)
        .distinct()
        .withColumn("hamming",
          (0 until 4).map(c => bit_count(col(s"a$c").bitwiseXOR(col(s"b$c"))))
            .reduce(_ + _).cast("long"))
        .where(col("hamming") <= Multimodal.PhashMaxHamming)
        .select(col("i"), col("j"), col("hamming"))
        .orderBy("hamming", "i", "j").limit(20)
    }),

    // deterministic stratified sampling for training-data mixing: keep a
    // doc iff the first 16 hash bits of md5(doc_id) land under the
    // stratum's rate. No RNG state, reproducible across engines and
    // re-runs, and the 100 TB mixing pass is ONE map-side filter — no
    // shuffle, no per-stratum scan.
    "q_sample_stratified" -> ((s, dir) => {
      val rate = when(col("lang") === "en", 50)
        .when(col("lang") === "zh", 25).otherwise(100)
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
      docs(s, dir)
        .withColumn("rate_pct", rate)
        .withColumn("keep", (h * 100 < col("rate_pct") * 65536).cast("int"))
        .groupBy("lang")
        .agg(max("rate_pct").as("rate_pct"),
          count(lit(1)).as("n_docs"),
          sum("keep").cast("long").as("n_kept"),
          round(sum("keep").cast("double") / count(lit(1)), 6).as("realized_pct"))
    }),

    // benchmark-contamination check: corpus docs sharing word-3-gram
    // shingles with a held-out probe set (docs standing in for an eval
    // benchmark). The probe shingle set is tiny → broadcast; the corpus
    // side is one shingle explode + map-side hash join, no corpus
    // self-join — the shape that holds when the corpus is 100 TB and the
    // benchmark is kilobytes.
    "q_contamination" -> ((s, dir) => {
      val sh = Dedup.docShingles(docs(s, dir))
      val bench = sh.where(col("doc_id") % 97 === 0)
        .select(col("shingle")).distinct().withColumn("hit", lit(1))
      sh.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("shingle"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
        .where(col("n_hit") > 0)
        .withColumn("contamination", round(col("n_hit").cast("double") / col("n_shingles"), 6))
    })
  )

  val sql: Map[String, String] = Map(
    "q_sample_stratified" ->
      """WITH r AS (SELECT lang,
        |    CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 25 ELSE 100 END AS rate_pct,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT AS h
        |  FROM documents)
        |SELECT lang, max(rate_pct) AS rate_pct, count(*) AS n_docs,
        |  sum(CASE WHEN h * 100 < rate_pct * 65536 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  round(sum(CASE WHEN h * 100 < rate_pct * 65536 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS realized_pct
        |FROM r GROUP BY 1""".stripMargin,

    "q_contamination" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |         CASE WHEN len(t) >= 3
         |              THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |              ELSE []::VARCHAR[] END
         |       )) AS shingle FROM toks),
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
         |corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
         |SELECT corp.doc_id, count(*) AS n_shingles, count(bench.shingle) AS n_hit,
         |  round(count(bench.shingle)::DOUBLE / count(*), 6) AS contamination
         |FROM corp LEFT JOIN bench ON corp.shingle = bench.shingle
         |GROUP BY 1 HAVING count(bench.shingle) > 0""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id, length(text)::BIGINT AS n_chars,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  len(list_distinct(string_split(text, ' ')))::BIGINT AS n_unique,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens_bpe
        |FROM documents""".stripMargin,

    "q_doc_novelty" ->
      s"""WITH $shSql,
         |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
         |SELECT sh.doc_id, count(*) AS n_shingles,
         |  sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
         |  round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS novelty
         |FROM sh JOIN df USING (shingle)
         |GROUP BY 1""".stripMargin,

    "q_tokenizer_fertility" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |    sum(length(text))::BIGINT AS n_chars,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_words,
        |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))::BIGINT AS n_tokens_bpe
        |  FROM documents GROUP BY 1)
        |SELECT source, n_docs, n_chars, n_words, n_tokens_bpe,
        |  round(n_chars::DOUBLE / n_tokens_bpe, 6) AS chars_per_token,
        |  round(n_tokens_bpe::DOUBLE / n_words, 6) AS fertility
        |FROM a""".stripMargin,

    "q_corpus_stats" ->
      """SELECT source,
        |  count(*) AS n_docs,
        |  sum(length(text))::BIGINT AS n_chars,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
        |  round(avg(len(string_split(text, ' '))::DOUBLE), 6) AS mean_tokens,
        |  count(DISTINCT lang)::BIGINT AS n_langs,
        |  round((count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*), 6) AS dup_rate,
        |  round(avg(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)), 6) AS mean_alpha
        |FROM documents GROUP BY 1""".stripMargin,

    "q_text_repetition" ->
      """WITH base AS (SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS ws
        |              FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT doc_id, nc, 2 AS n,
        |        unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS gram
        |      FROM base
        |      UNION ALL
        |      SELECT doc_id, nc, 5 AS n,
        |        unnest(list_transform(range(1, len(ws) - 3),
        |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS gram
        |      FROM base),
        |counts AS (SELECT doc_id, nc, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3, 4),
        |top2 AS (SELECT doc_id, cnt * length(gram) / nc AS top2
        |         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rk
        |               FROM counts WHERE n = 2) WHERE rk = 1),
        |dup5 AS (SELECT doc_id, sum(cnt * length(gram)) / max(nc) AS dup5
        |         FROM counts WHERE n = 5 AND cnt > 1 GROUP BY 1)
        |SELECT b.doc_id, len(b.ws)::BIGINT AS n_words,
        |  round(coalesce(top2, 0.0), 6) AS top2_char_frac,
        |  round(coalesce(least(dup5, 1.0), 0.0), 6) AS dup5_char_frac
        |FROM base b LEFT JOIN top2 ON b.doc_id = top2.doc_id
        |LEFT JOIN dup5 ON b.doc_id = dup5.doc_id""".stripMargin,

    "q_doc_filter" -> {
      val stopList = EnStop.map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (SELECT doc_id,
         |    len(string_split(text, ' '))::BIGINT AS n_words,
         |    length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS mtl,
         |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) AS alpha,
         |    len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::DOUBLE / len(string_split(text, ' ')) AS stop,
         |    length(text) AS nc
         |  FROM documents),
         |g AS (SELECT doc_id, length(text) AS nc,
         |        unnest(list_transform(range(1, len(string_split(text, ' '))),
         |          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
         |      FROM documents),
         |counts AS (SELECT doc_id, nc, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
         |top2 AS (SELECT doc_id, max(cnt * length(gram))::DOUBLE / max(nc) AS rep FROM counts GROUP BY 1),
         |f AS (SELECT b.*, coalesce(rep, 0.0) AS rep FROM base b LEFT JOIN top2 USING (doc_id)),
         |r AS (SELECT doc_id, n_words, mtl, alpha, stop, rep,
         |  CASE WHEN n_words < 10 THEN 'too_short'
         |       WHEN n_words > 1000 THEN 'too_long'
         |       WHEN mtl < 2.0 OR mtl > 12.0 THEN 'token_len'
         |       WHEN alpha < 0.5 THEN 'low_alpha'
         |       WHEN stop < 0.01 THEN 'no_stopwords'
         |       WHEN rep >= 0.15 THEN 'repetitive'
         |       ELSE 'ok' END AS fail_reason FROM f)
         |SELECT doc_id, n_words, round(mtl, 6) AS mean_token_len,
         |  round(alpha, 6) AS alpha_ratio, round(stop, 6) AS stopword_ratio,
         |  round(rep, 6) AS rep_frac,
         |  (fail_reason = 'ok')::INT AS keep, fail_reason
         |FROM r""".stripMargin
    },

    "q_text_quality" -> {
      val stopList = EnStop.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
         |  round(length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')), 6) AS mean_token_len,
         |  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text), 6) AS alpha_ratio,
         |  round(len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::DOUBLE / len(string_split(text, ' ')), 6) AS stopword_ratio,
         |  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) * 0.5
         |    + least(len(string_split(text, ' '))::DOUBLE / 100, 1.0) * 0.3
         |    + len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::DOUBLE / len(string_split(text, ' ')) * 0.2, 6) AS quality_score
         |FROM documents""".stripMargin
    },

    "q_quality_bins" -> {
      val stopList = EnStop.map(w => s"'$w'").mkString(", ")
      s"""WITH sc AS (SELECT source, doc_id,
         |  len(string_split(text, ' '))::BIGINT AS n_tokens,
         |  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) * 0.5
         |    + least(len(string_split(text, ' '))::DOUBLE / 100, 1.0) * 0.3
         |    + len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::DOUBLE
         |        / len(string_split(text, ' ')) * 0.2, 6) AS score
         |  FROM documents),
         |b AS (SELECT *, ntile(10) OVER (PARTITION BY source ORDER BY score DESC, doc_id)::INT AS bin FROM sc)
         |SELECT source, bin, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
         |  round(sum(score), 6) AS sum_score, min(score) AS min_score, max(score) AS max_score
         |FROM b GROUP BY 1, 2""".stripMargin
    },

    "q_langid_eval" -> {
      val scoreCols = TextFunctions.LangProfiles
        .map { case (l, ws) => s"${langScoreSql(ws)}::BIGINT AS score_$l" }.mkString(",\n  ")
      val langs = TextFunctions.LangProfiles.map(_._1)
      val pred = langs.tail.foldLeft(s"struct_pack(score := score_${langs.head}, lang := '${langs.head}')") {
        (acc, l) => s"CASE WHEN struct_pack(score := score_$l, lang := '$l').score > ($acc).score THEN struct_pack(score := score_$l, lang := '$l') ELSE ($acc) END"
      }
      s"""WITH scored AS (SELECT lang, ($pred).lang AS pred_lang
         |  FROM (SELECT lang, text, $scoreCols FROM documents)),
         |cells AS (SELECT lang AS true_lang, pred_lang, count(*)::BIGINT AS n
         |          FROM scored GROUP BY 1, 2),
         |wn AS (SELECT *,
         |    sum(n) OVER (PARTITION BY true_lang)::BIGINT AS n_true,
         |    sum(n) OVER (PARTITION BY pred_lang)::BIGINT AS n_pred
         |  FROM cells),
         |pr AS (SELECT *,
         |    CASE WHEN true_lang = pred_lang THEN n::DOUBLE / n_true::DOUBLE END AS recall,
         |    CASE WHEN true_lang = pred_lang THEN n::DOUBLE / n_pred::DOUBLE END AS precision
         |  FROM wn)
         |SELECT true_lang, pred_lang, n, n_true, n_pred,
         |  round(recall, 6) AS recall, round(precision, 6) AS precision,
         |  round(2.0E0 * precision * recall / (precision + recall), 6) AS f1
         |FROM pr""".stripMargin
    },

    "q_text_langid" -> {
      val scoreCols = TextFunctions.LangProfiles
        .map { case (l, ws) => s"${langScoreSql(ws)}::BIGINT AS score_$l" }.mkString(",\n  ")
      // argmax with ties resolved by profile order (de, en, es, fr, zh)
      val langs = TextFunctions.LangProfiles.map(_._1)
      val pred = langs.tail.foldLeft(s"struct_pack(score := score_${langs.head}, lang := '${langs.head}')") {
        (acc, l) => s"CASE WHEN struct_pack(score := score_$l, lang := '$l').score > ($acc).score THEN struct_pack(score := score_$l, lang := '$l') ELSE ($acc) END"
      }
      s"""WITH scored AS (SELECT doc_id, lang, text, $scoreCols FROM documents)
         |SELECT doc_id, lang, ${langs.map(l => s"score_$l").mkString(", ")},
         |  ($pred).lang AS pred_lang,
         |  CASE WHEN ($pred).lang = lang THEN 1 ELSE 0 END AS is_correct
         |FROM scored""".stripMargin
    },

    "q_fingerprint" -> "SELECT doc_id, md5(lower(text)) AS fp FROM documents",

    "q_winnow" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 3
        |       THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |       ELSE []::VARCHAR[] END AS g FROM toks),
        |hs AS (SELECT doc_id, list_transform(g, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h FROM grams),
        |fps AS (SELECT doc_id,
        |  CASE WHEN len(h) >= 4
        |       THEN list_distinct(list_transform(range(1, len(h) - 2), i -> list_min(h[i:i+3])))
        |       ELSE []::BIGINT[] END AS f FROM hs)
        |SELECT doc_id, len(f)::BIGINT AS n_fps, list_min(f) AS fp_min, list_max(f) AS fp_max FROM fps""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, md5(text) AS fp,
        |  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS keep
        |FROM documents""".stripMargin,

    "q_text_perplexity" ->
      """WITH dbg AS (SELECT doc_id, bg, count(*)::BIGINT AS cnt FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(text)), i -> text[i:i+1])) AS bg
        |    FROM documents) GROUP BY 1, 2),
        |bc AS (SELECT bg, sum(cnt)::BIGINT AS nbg FROM dbg GROUP BY 1),
        |c1 AS (SELECT bg[1:1] AS c1, sum(nbg)::BIGINT AS nc1 FROM bc GROUP BY 1),
        |v AS (SELECT count(DISTINCT bg[2:2]) AS vv FROM bc),
        |sc AS (SELECT bg, -ln((nbg + 1)::DOUBLE / (nc1 + vv)::DOUBLE) AS score
        |       FROM bc JOIN c1 ON bc.bg[1:1] = c1.c1 CROSS JOIN v)
        |SELECT d.doc_id, sum(d.cnt)::BIGINT AS n_bigrams,
        |  round(sum(d.cnt * sc.score) / sum(d.cnt), 6) AS xent
        |FROM dbg d JOIN sc ON d.bg = sc.bg
        |GROUP BY 1""".stripMargin,

    "q_dedup_incremental" ->
      """WITH store AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < 300),
        |batch AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id >= 300)
        |SELECT b.doc_id, b.fp,
        |  CASE WHEN s.fp IS NULL AND b.doc_id = min(b.doc_id) OVER (PARTITION BY b.fp)
        |       THEN 1 ELSE 0 END AS keep
        |FROM batch b LEFT JOIN store s ON b.fp = s.fp""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      s"""WITH $shSql,
         |$shCapSql,
         |sizes AS (SELECT doc_id, count(*) AS nsh FROM shc GROUP BY 1),
         |common AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
         |           FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |           GROUP BY 1, 2),
         |jac AS (SELECT i, j, common, si.nsh AS ni, sj.nsh AS nj,
         |          round(common::DOUBLE / (si.nsh + sj.nsh - common), 6) AS jaccard
         |        FROM common JOIN sizes si ON i = si.doc_id JOIN sizes sj ON j = sj.doc_id),
         |r AS (SELECT *, row_number() OVER (ORDER BY jaccard DESC, i, j) AS rk FROM jac)
         |SELECT i, j, common, ni, nj, jaccard FROM r WHERE rk <= 20""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $shSql,
         |$sigSql
         |SELECT doc_id, ${(0 until 8).map(i => s"mh$i").mkString(", ")} FROM sig""".stripMargin,

    "q_dedup_eval" -> {
      val bandSelects = (0 until Bands).map { b =>
        val cols = (0 until Rows).map(r => s"mh${b * Rows + r}")
        s"SELECT doc_id, $b AS band, concat(${cols.mkString(", '_', ")}) AS bsig FROM sig"
      }.mkString("\nUNION ALL\n")
      val est = (0 until NumPerms).map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH clones AS (SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string(list_filter(string_split(text, ' '), (w, i) -> i % 10 != 0), ' ') AS text
         |  FROM documents WHERE doc_id % 5 = 0),
         |corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM clones),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |         CASE WHEN len(t) >= 3
         |              THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |              ELSE []::VARCHAR[] END
         |       )) AS shingle FROM toks),
         |$sigSql,
         |banded AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |         FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |estp AS (SELECT i, j, round(($est)::DOUBLE / $NumPerms, 6) AS est_jaccard
         |         FROM cand JOIN sig sa ON i = sa.doc_id JOIN sig sb ON j = sb.doc_id),
         |planted AS (SELECT doc_id AS i, doc_id + 1000000 AS j FROM documents WHERE doc_id % 5 = 0),
         |pj AS (SELECT p.i, p.j, e.est_jaccard FROM planted p
         |       LEFT JOIN estp e ON p.i = e.i AND p.j = e.j),
         |th AS (SELECT unnest([0.3E0, 0.5E0, 0.7E0]) AS threshold)
         |SELECT threshold, count(*)::BIGINT AS n_planted,
         |  sum(CASE WHEN est_jaccard >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_found,
         |  round(sum(CASE WHEN est_jaccard >= threshold THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS recall
         |FROM pj, th GROUP BY 1""".stripMargin
    },

    "q_dedup_minhash_pairs" -> {
      val bandSelects = (0 until Bands).map { b =>
        val cols = (0 until Rows).map(r => s"mh${b * Rows + r}")
        s"SELECT doc_id, $b AS band, concat(${cols.mkString(", '_', ")}) AS bsig FROM sig"
      }.mkString("\nUNION ALL\n")
      val est = (0 until NumPerms).map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $shSql,
         |$sigSql,
         |banded AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |         FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |est AS (SELECT i, j, round(($est)::DOUBLE / $NumPerms, 6) AS est_jaccard
         |        FROM cand JOIN sig sa ON i = sa.doc_id JOIN sig sb ON j = sb.doc_id),
         |r AS (SELECT *, row_number() OVER (ORDER BY est_jaccard DESC, i, j) AS rk FROM est)
         |SELECT i, j, est_jaccard FROM r WHERE rk <= 20""".stripMargin
    },

    "q_minhash_calibration" -> {
      val bandSelects = (0 until Bands).map { b =>
        val cols = (0 until Rows).map(r => s"mh${b * Rows + r}")
        s"SELECT doc_id, $b AS band, concat(${cols.mkString(", '_', ")}) AS bsig FROM sig"
      }.mkString("\nUNION ALL\n")
      val est = (0 until NumPerms).map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $shSql,
         |$sigSql,
         |banded AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |         FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |est AS (SELECT i, j, round(($est)::DOUBLE / $NumPerms, 6) AS est_jaccard
         |        FROM cand JOIN sig sa ON i = sa.doc_id JOIN sig sb ON j = sb.doc_id),
         |cd AS (SELECT i AS doc_id FROM cand UNION SELECT j FROM cand),
         |shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cd USING (doc_id)),
         |sz AS (SELECT doc_id, count(*) AS nsh FROM shc GROUP BY 1),
         |cm AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
         |       FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |x AS (SELECT e.i, e.j, e.est_jaccard,
         |        round(coalesce(cm.common, 0) / (si.nsh + sj.nsh - coalesce(cm.common, 0)), 6) AS exact_jaccard
         |      FROM est e LEFT JOIN cm ON e.i = cm.i AND e.j = cm.j
         |      JOIN sz si ON e.i = si.doc_id JOIN sz sj ON e.j = sj.doc_id),
         |r AS (SELECT *, round(abs(est_jaccard - exact_jaccard), 6) AS abs_err,
         |        row_number() OVER (ORDER BY est_jaccard DESC, i, j) AS rk FROM x)
         |SELECT i, j, est_jaccard, exact_jaccard, abs_err FROM r WHERE rk <= 20""".stripMargin
    },

    "q_dedup_containment" -> {
      val bandSelects = (0 until Bands).map { b =>
        val cols = (0 until Rows).map(r => s"mh${b * Rows + r}")
        s"SELECT doc_id, $b AS band, concat(${cols.mkString(", '_', ")}) AS bsig FROM sig"
      }.mkString("\nUNION ALL\n")
      s"""WITH $shSql,
         |$sigSql,
         |banded AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |         FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |cd AS (SELECT i AS doc_id FROM cand UNION SELECT j FROM cand),
         |shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cd USING (doc_id)),
         |sz AS (SELECT doc_id, count(*) AS nsh FROM shc GROUP BY 1),
         |cm AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
         |       FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |x AS (SELECT c.i, c.j, si.nsh::BIGINT AS ni, sj.nsh::BIGINT AS nj,
         |        coalesce(cm.common, 0)::BIGINT AS common
         |      FROM cand c LEFT JOIN cm ON c.i = cm.i AND c.j = cm.j
         |      JOIN sz si ON c.i = si.doc_id JOIN sz sj ON c.j = sj.doc_id),
         |y AS (SELECT i, j, ni, nj, common,
         |        round(common::DOUBLE / ni, 6) AS cont_i,
         |        round(common::DOUBLE / nj, 6) AS cont_j,
         |        greatest(round(common::DOUBLE / ni, 6), round(common::DOUBLE / nj, 6)) AS containment
         |      FROM x),
         |r AS (SELECT *, row_number() OVER (ORDER BY containment DESC, i, j) AS rk FROM y)
         |SELECT i, j, ni, nj, common, cont_i, cont_j, containment FROM r WHERE rk <= 20""".stripMargin
    },

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $clustersCtes,
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY 1)
         |SELECT l.doc_id, l.cluster_id, sz.cluster_size
         |FROM labels l JOIN sz ON l.cluster_id = sz.cluster_id""".stripMargin,

    "q_dedup_keep_best" -> {
      val stopList = EnStop.map(w => s"'$w'").mkString(", ")
      s"""WITH RECURSIVE $clustersCtes,
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY 1),
         |q AS (SELECT doc_id,
         |        round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) * 0.5
         |          + least(len(string_split(text, ' '))::DOUBLE / 100, 1.0) * 0.3
         |          + len(list_filter(string_split(text, ' '), w -> w IN ($stopList)))::DOUBLE
         |            / len(string_split(text, ' ')) * 0.2, 6) AS score
         |      FROM documents),
         |sc AS (SELECT l.doc_id, l.cluster_id, sz.cluster_size, q.score
         |       FROM labels l JOIN sz USING (cluster_id) JOIN q USING (doc_id)
         |       WHERE sz.cluster_size >= 2),
         |best AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |    FROM sc) WHERE rk = 1),
         |ms AS (SELECT cluster_id, score AS min_id_score FROM sc WHERE doc_id = cluster_id)
         |SELECT b.cluster_id, b.cluster_size, b.doc_id AS kept_doc_id, b.score AS kept_score,
         |  ms.min_id_score,
         |  CASE WHEN b.doc_id <> b.cluster_id THEN 1 ELSE 0 END AS beats_min_id,
         |  round(b.score - ms.min_id_score, 6) AS quality_lift
         |FROM best b JOIN ms USING (cluster_id)""".stripMargin
    },

    "q_dedup_keep" ->
      s"""WITH RECURSIVE $clustersCtes
         |SELECT d.source, count(*) AS docs_in,
         |  sum((l.cluster_id IS NULL OR l.cluster_id = d.doc_id)::INT)::BIGINT AS docs_kept,
         |  sum((NOT (l.cluster_id IS NULL OR l.cluster_id = d.doc_id))::INT)::BIGINT AS docs_dropped,
         |  sum(CASE WHEN NOT (l.cluster_id IS NULL OR l.cluster_id = d.doc_id)
         |           THEN length(d.text) ELSE 0 END)::BIGINT AS chars_dropped
         |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |GROUP BY 1""".stripMargin,

    "q_neardup_cosine" ->
      s"""SELECT a.vec_id AS i, b.vec_id AS j,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4""".stripMargin,

    // 128-bit simhash as two UBIGINT words (md5 bytes 0..7 / 8..15 —
    // TextFunctions.simhash128's exact bit layout), 4×32-bit pigeonhole
    // chunks, hamming = bit_count over both words.
    "q_dedup_simhash" ->
      s"""WITH th AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
        |hb AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h1,
        |              ('0x' || substr(md5(tok), 17, 16))::UBIGINT AS h2 FROM th),
        |bits AS (SELECT doc_id, b,
        |           sum(CASE WHEN b < 64 THEN (CASE WHEN (h1 >> b::INT) & 1 = 1 THEN 1 ELSE -1 END)
        |                    ELSE (CASE WHEN (h2 >> (b - 64)::INT) & 1 = 1 THEN 1 ELSE -1 END) END) AS vote
        |         FROM hb CROSS JOIN (SELECT unnest(range(0, 128)) AS b) GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |          sum(CASE WHEN vote > 0 AND b < 64 THEN (1::UBIGINT << b::INT) ELSE 0 END)::UBIGINT AS sh1,
        |          sum(CASE WHEN vote > 0 AND b >= 64 THEN (1::UBIGINT << (b - 64)::INT) ELSE 0 END)::UBIGINT AS sh2
        |        FROM bits GROUP BY 1),
        |chunks AS (SELECT doc_id, sh1, sh2, c,
        |             CASE WHEN c < 2 THEN (sh1 >> ((c % 2) * 32)::INT) & 4294967295
        |                  ELSE (sh2 >> ((c % 2) * 32)::INT) & 4294967295 END AS ck
        |           FROM sig CROSS JOIN (SELECT unnest(range(0, ${Dedup.SimhashChunks})) AS c)),
        |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
        |           a.sh1 AS sa1, a.sh2 AS sa2, b.sh1 AS sb1, b.sh2 AS sb2
        |         FROM chunks a JOIN chunks b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id),
        |ham AS (SELECT i, j, (bit_count(xor(sa1, sb1)) + bit_count(xor(sa2, sb2)))::INT AS hamming
        |        FROM cand WHERE bit_count(xor(sa1, sb1)) + bit_count(xor(sa2, sb2)) <= ${Dedup.SimhashMaxHamming}),
        |r AS (SELECT *, row_number() OVER (ORDER BY hamming, i, j) AS rk FROM ham)
        |SELECT i, j, hamming FROM r WHERE rk <= 20""".stripMargin,

    "q_embed_clusters" -> {
      s"""WITH RECURSIVE $adaptiveBandsSql,
         |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |e AS (SELECT i, j FROM cand JOIN embeddings ea ON i = ea.vec_id JOIN embeddings eb ON j = eb.vec_id
         |      WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.4),
         |sym AS (SELECT i AS u, j AS v FROM e UNION SELECT j AS u, i AS v FROM e),
         |reach AS (SELECT u, v FROM sym
         |          UNION
         |          SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u),
         |labels AS (SELECT u AS vec_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY 1),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY 1)
         |SELECT l.vec_id, l.cluster_id, sz.cluster_size
         |FROM labels l JOIN sz ON l.cluster_id = sz.cluster_id""".stripMargin
    },

    "q_neardup_lsh" -> {
      s"""WITH $adaptiveBandsSql,
         |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |v AS (SELECT i, j, ${cosSql("ea.embedding", "eb.embedding")} AS cos
         |      FROM cand JOIN embeddings ea ON i = ea.vec_id JOIN embeddings eb ON j = eb.vec_id)
         |SELECT i, j, round(cos, 6) AS cos FROM v WHERE cos >= 0.4""".stripMargin
    },

    "q_hard_negatives" ->
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec, label AS anchor_label
         |               FROM embeddings ${Ann.ProbeQualify}),
         |scored AS (SELECT probe_id, anchor_label, c.vec_id AS neg_id, c.label AS neg_label,
         |  ${cosSql("pvec", "c.embedding")} AS cos
         |  FROM probes JOIN embeddings c ON c.vec_id <> probe_id AND c.label <> anchor_label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neg_id) AS rk FROM scored)
         |SELECT probe_id, anchor_label, neg_id, neg_label, round(cos, 6) AS cos, rk::INT AS rk
         |FROM r WHERE rk <= 3""".stripMargin,

    "q_knn_bruteforce" ->
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec FROM embeddings ${Ann.ProbeQualify}),
         |scored AS (SELECT probe_id, c.vec_id AS neighbor_id,
         |  ${cosSql("pvec", "c.embedding")} AS cos
         |  FROM probes JOIN embeddings c ON c.vec_id <> probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk FROM scored)
         |SELECT probe_id, neighbor_id, round(cos, 6) AS cos, rk::INT AS rk FROM r WHERE rk <= 5""".stripMargin,

    "q_knn_lsh" -> {
      def projSql(v: String, p: Int) =
        s"""list_sum(list_transform(list_zip($v::DOUBLE[], range(0, 64)),
           |  x -> x[1] * (((($p * 64 + x[2]) * 2654435761) % 1000003) / 1000003.0 - 0.5)))""".stripMargin
      def bucketSql(v: String) =
        (0 until 8).map(p => s"(CASE WHEN ${projSql(v, p)} >= 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
      s"""WITH be AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |probes AS (SELECT bucket, vec_id AS probe_id, embedding AS pvec FROM be ${Ann.ProbeQualify}),
         |scored AS (SELECT probe_id, c.bucket, c.vec_id AS neighbor_id,
         |  ${cosSql("pvec", "c.embedding")} AS cos
         |  FROM probes JOIN be c ON c.bucket = probes.bucket AND c.vec_id <> probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk FROM scored)
         |SELECT probe_id, bucket, neighbor_id, round(cos, 6) AS cos, rk::INT AS rk FROM r WHERE rk <= 5""".stripMargin
    },

    "q_ann_recall" -> {
      def projSql(v: String, p: Int) =
        s"""list_sum(list_transform(list_zip($v::DOUBLE[], range(0, 64)),
           |  x -> x[1] * (((($p * 64 + x[2]) * 2654435761) % 1000003) / 1000003.0 - 0.5)))""".stripMargin
      def bucketSql(v: String) =
        (0 until 8).map(p => s"(CASE WHEN ${projSql(v, p)} >= 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec FROM embeddings ${Ann.ProbeQualify}),
         |ex0 AS (SELECT probe_id, c.vec_id AS neighbor_id, ${cosSql("pvec", "c.embedding")} AS cos
         |        FROM probes JOIN embeddings c ON c.vec_id <> probe_id),
         |ex AS (SELECT probe_id, neighbor_id FROM (
         |         SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
         |         FROM ex0) WHERE rk <= 5),
         |be AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |lp AS (SELECT bucket, vec_id AS probe_id, embedding AS pvec FROM be ${Ann.ProbeQualify}),
         |ls0 AS (SELECT lp.probe_id, c.vec_id AS neighbor_id, ${cosSql("pvec", "c.embedding")} AS cos
         |        FROM lp JOIN be c ON c.bucket = lp.bucket AND c.vec_id <> lp.probe_id),
         |ls AS (SELECT probe_id, neighbor_id FROM (
         |         SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
         |         FROM ls0) WHERE rk <= 5),
         |ln AS (SELECT probe_id, count(*)::BIGINT AS n_lsh FROM ls GROUP BY 1),
         |j AS (SELECT ex.probe_id, count(*)::BIGINT AS n_exact,
         |        sum(CASE WHEN ls.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
         |      FROM ex LEFT JOIN ls ON ex.probe_id = ls.probe_id AND ex.neighbor_id = ls.neighbor_id
         |      GROUP BY 1)
         |SELECT j.probe_id, j.n_exact, coalesce(ln.n_lsh, 0)::BIGINT AS n_lsh, j.n_hit,
         |  round(j.n_hit / j.n_exact, 6) AS recall
         |FROM j LEFT JOIN ln ON j.probe_id = ln.probe_id""".stripMargin
    },

    // learned-cell IVF: replay the Lloyd chain, rank cells against the
    // FITTED cents3 (not the member means), scan only the top-2 cells of as3
    "q_ivf_recall" ->
      s"""WITH ${kmChainSql(8, 3)},
         |probes AS (SELECT vec_id AS probe_id, embedding AS pvec FROM as3 ${Ann.ProbeQualify}),
         |pc AS (SELECT probe_id, pvec, cents3.cell, ${cosSql("pvec", "centroid")} AS ccos FROM probes CROSS JOIN cents3),
         |chosen AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY ccos DESC, cell) AS crk FROM pc) WHERE crk <= 2),
         |iscored AS (SELECT probe_id, c.vec_id AS neighbor_id,
         |  ${cosSql("pvec", "c.embedding")} AS cos
         |  FROM chosen JOIN as3 c ON c.cell = chosen.cell AND c.vec_id <> probe_id),
         |ap AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM iscored) WHERE rk <= 3),
         |ex0 AS (SELECT probe_id, c.vec_id AS neighbor_id, ${cosSql("pvec", "c.embedding")} AS cos
         |        FROM probes JOIN embeddings c ON c.vec_id <> probe_id),
         |ex AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM ex0) WHERE rk <= 3),
         |nl AS (SELECT probe_id, count(*) AS n_ivf FROM ap GROUP BY 1)
         |SELECT ex.probe_id, count(*) AS n_exact,
         |  coalesce(max(nl.n_ivf), 0)::BIGINT AS n_ivf,
         |  sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
         |  round(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS recall
         |FROM ex
         |LEFT JOIN ap ON ex.probe_id = ap.probe_id AND ex.neighbor_id = ap.neighbor_id
         |LEFT JOIN nl ON ex.probe_id = nl.probe_id
         |GROUP BY 1""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH ${kmChainSql(8, 3)},
         |probes AS (SELECT vec_id AS probe_id, embedding AS pvec FROM as3 ${Ann.ProbeQualify}),
         |pc AS (SELECT probe_id, pvec, cents3.cell, ${cosSql("pvec", "centroid")} AS ccos FROM probes CROSS JOIN cents3),
         |chosen AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY ccos DESC, cell) AS crk FROM pc) WHERE crk <= 2),
         |scored AS (SELECT probe_id, chosen.cell, c.vec_id AS neighbor_id,
         |  ${cosSql("pvec", "c.embedding")} AS cos
         |  FROM chosen JOIN as3 c ON c.cell = chosen.cell AND c.vec_id <> probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk FROM scored)
         |SELECT probe_id, cell, neighbor_id, round(cos, 6) AS cos, rk::INT AS rk FROM r WHERE rk <= 3""".stripMargin,

    "q_kmeans" ->
      s"""WITH ${kmChainSql(8, 3)}
         |SELECT cell, count(*) AS n_members, round(sum(d2), 6) AS inertia FROM as3 GROUP BY 1""".stripMargin,

    "q_cluster_purity" ->
      s"""WITH ${kmChainSql(8, 3)},
         |cells AS (SELECT a.cell, e.label, count(*)::BIGINT AS c
         |          FROM as3 a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
         |t AS (SELECT *,
         |    sum(c) OVER (PARTITION BY cell)::BIGINT AS csize,
         |    sum(c) OVER (PARTITION BY label)::BIGINT AS lsize,
         |    sum(c) OVER ()::BIGINT AS nn
         |  FROM cells),
         |tm AS (SELECT *,
         |    (c::DOUBLE / nn) * ln((c::DOUBLE * nn) / (csize::DOUBLE * lsize)) AS mi_t,
         |    (c::DOUBLE / nn) * ln(nn::DOUBLE / csize) AS hc_t,
         |    (c::DOUBLE / nn) * ln(nn::DOUBLE / lsize) AS hl_t
         |  FROM t),
         |ag AS (SELECT *,
         |    sum(mi_t) OVER () AS mi, sum(hc_t) OVER () AS hc, sum(hl_t) OVER () AS hl
         |  FROM tm),
         |maj AS (SELECT *, row_number() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rk
         |        FROM ag),
         |fin AS (SELECT *, sum(c) OVER ()::BIGINT AS pur_num FROM maj WHERE rk = 1)
         |SELECT cell, csize AS cell_size, label AS majority_label,
         |  round(c::DOUBLE / csize::DOUBLE, 6) AS cell_purity,
         |  round(pur_num::DOUBLE / nn::DOUBLE, 6) AS purity,
         |  round(mi / sqrt(hc * hl), 6) AS nmi
         |FROM fin""".stripMargin,

    "q_embed_rp" ->
      """WITH pr AS (SELECT label,
        |  list_transform(range(0, 16), j ->
        |    list_sum(list_transform(list_zip(embedding::DOUBLE[], range(0, 64)),
        |      x -> x[1] * ((((j * 64 + x[2]) * 2654435761) % 1000003) / 1000003.0 - 0.5)))
        |    * sqrt(12.0 / 16)) AS proj,
        |  list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS n2
        |  FROM embeddings),
        |r AS (SELECT label, sqrt(list_sum(list_transform(proj, x -> x * x)) / n2) AS ratio
        |      FROM pr WHERE n2 > 0)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(ratio), 6) AS mean_ratio,
        |  round(stddev_samp(ratio), 6) AS sd_ratio
        |FROM r GROUP BY 1""".stripMargin,

    // byte-statistics replay of the stubbed decode: the 16 payload bytes
    // are the md5 digest, so the oracle re-derives them from the hex
    "q_multimodal_decode" ->
      """WITH dims AS (SELECT doc_id, text,
        |    4 + ('0x' || substr(md5(text), 1, 2))::INT % 5 AS w,
        |    3 + ('0x' || substr(md5(text), 3, 2))::INT % 4 AS h
        |  FROM documents),
        |pb AS (SELECT doc_id, text, w, h, unnest(range(0, w * h * 3)) AS p FROM dims),
        |pxb AS (SELECT doc_id, w, h, p,
        |    ('0x' || substr(md5(text || '_px' || (p // 16)::VARCHAR), (p % 16) * 2 + 1, 2))::BIGINT AS b
        |  FROM pb),
        |st AS (SELECT doc_id, max(w) AS w, max(h) AS h, count(*)::BIGINT AS n3,
        |    sum(b)::BIGINT AS sb, sum(b * b)::BIGINT AS sbb,
        |    max(CASE WHEN p = 0 THEN b END) AS b0,
        |    max(CASE WHEN p = 1 THEN b END) AS g0,
        |    max(CASE WHEN p = 2 THEN b END) AS r0
        |  FROM pxb GROUP BY 1)
        |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
        |  (54 + ((w * 3 + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
        |  round(sb::DOUBLE / n3, 6) AS px_mean,
        |  round(sqrt(greatest(sbb::DOUBLE / n3 - (sb::DOUBLE / n3) * (sb::DOUBLE / n3), 0.0)), 6) AS px_std,
        |  round((299 * r0 + 587 * g0 + 114 * b0)::DOUBLE / 1000.0, 6) AS tl_luma
        |FROM st""".stripMargin,

    "q_multimodal_wav" ->
      """WITH dims AS (SELECT doc_id, text,
        |    8 + ('0x' || substr(md5(text), 5, 2))::INT % 9 AS n
        |  FROM documents),
        |sj AS (SELECT doc_id, text, n, unnest(range(0, n)) AS j FROM dims),
        |sv AS (SELECT doc_id, n,
        |    ('0x' || substr(md5(text || '_pcm' || ((2 * j) // 16)::VARCHAR), ((2 * j) % 16) * 2 + 1, 2))::BIGINT
        |    + 256 * ('0x' || substr(md5(text || '_pcm' || ((2 * j + 1) // 16)::VARCHAR), ((2 * j + 1) % 16) * 2 + 1, 2))::BIGINT
        |    AS raw
        |  FROM sj),
        |ss AS (SELECT doc_id, n, CASE WHEN raw > 32767 THEN raw - 65536 ELSE raw END AS v FROM sv),
        |st AS (SELECT doc_id, max(n)::BIGINT AS n_samples,
        |    sum(v)::BIGINT AS s, sum(v * v)::BIGINT AS s2, max(abs(v))::BIGINT AS pk
        |  FROM ss GROUP BY 1)
        |SELECT doc_id, 8000::BIGINT AS sample_rate, n_samples,
        |  round(s::DOUBLE / n_samples, 6) AS pcm_mean,
        |  round(sqrt(s2::DOUBLE / n_samples), 6) AS pcm_rms,
        |  pk AS pcm_peak
        |FROM st""".stripMargin,

    // pixel-chain replay of the REAL demux+sample: frame count from the
    // container md5, even-stride sample indices (s·n)//4, per-frame BMP
    // dims and pixel chain keyed text_f<idx> — no parser needed, the
    // Spark side recovers the same numbers only via the real RIFF/BMP
    // layout
    "q_multimodal_frames" ->
      """WITH nf AS (SELECT doc_id, text, 4 + ('0x' || substr(md5(text), 7, 2))::INT % 4 AS n FROM documents),
        |sm AS (SELECT doc_id, text, n, unnest(range(0, 4)) AS s FROM nf),
        |fi AS (SELECT doc_id, text, n, (s * n) // 4 AS frame_idx FROM sm),
        |dims AS (SELECT doc_id, text, n, frame_idx,
        |    4 + ('0x' || substr(md5(text || '_f' || frame_idx), 1, 2))::INT % 5 AS w,
        |    3 + ('0x' || substr(md5(text || '_f' || frame_idx), 3, 2))::INT % 4 AS h
        |  FROM fi),
        |pb AS (SELECT doc_id, text, n, frame_idx, unnest(range(0, w * h * 3)) AS p FROM dims),
        |pxb AS (SELECT doc_id, n, frame_idx,
        |    ('0x' || substr(md5(text || '_f' || frame_idx || '_px' || (p // 16)::VARCHAR), (p % 16) * 2 + 1, 2))::BIGINT AS b
        |  FROM pb),
        |st AS (SELECT doc_id, frame_idx, max(n) AS n, count(*)::BIGINT AS n3,
        |    sum(b)::BIGINT AS sb, sum(b * b)::BIGINT AS sbb
        |  FROM pxb GROUP BY 1, 2)
        |SELECT doc_id, n::BIGINT AS n_frames, frame_idx::INT AS frame_idx,
        |  round(sb::DOUBLE / n3, 6) AS frame_mean,
        |  round(sqrt(greatest(sbb::DOUBLE / n3 - (sb::DOUBLE / n3) * (sb::DOUBLE / n3), 0.0)), 6) AS frame_std
        |FROM st""".stripMargin,

    "q_multimodal_resize" ->
      """WITH m AS (SELECT doc_id,
        |  64 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 192 AS width,
        |  64 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 192 AS height
        |  FROM documents),
        |s AS (SELECT doc_id, width, height,
        |        least(1.0, least(128.0 / width, 128.0 / height)) AS scale FROM m)
        |SELECT doc_id, width, height, round(scale, 6) AS scale,
        |  floor(width * scale)::BIGINT AS out_w, floor(height * scale)::BIGINT AS out_h
        |FROM s""".stripMargin,

    "q_multimodal_phash" ->
      s"""WITH $aHashCtes,
         |p AS (SELECT a.doc_id AS i, bb.doc_id AS j, a.phash
         |      FROM ph a JOIN ph bb ON a.phash = bb.phash AND a.doc_id < bb.doc_id),
         |r AS (SELECT *, row_number() OVER (ORDER BY i, j) AS rk FROM p)
         |SELECT i, j, phash FROM r WHERE rk <= 20""".stripMargin,

    "q_multimodal_neardup" ->
      s"""WITH $aHash256Ctes,
         |ck AS (SELECT doc_id, ph0, ph1, ph2, ph3, c,
         |         CASE c WHEN 0 THEN ph0 WHEN 1 THEN ph1 WHEN 2 THEN ph2 ELSE ph3 END AS v
         |       FROM ph256 CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
         |p AS (SELECT DISTINCT a.doc_id AS i, bb.doc_id AS j,
         |        a.ph0 AS a0, a.ph1 AS a1, a.ph2 AS a2, a.ph3 AS a3,
         |        bb.ph0 AS b0, bb.ph1 AS b1, bb.ph2 AS b2, bb.ph3 AS b3
         |      FROM ck a JOIN ck bb
         |        ON a.c = bb.c AND a.v = bb.v AND a.doc_id < bb.doc_id),
         |h AS (SELECT i, j, (bit_count(xor(a0, b0))::INT + bit_count(xor(a1, b1))::INT
         |        + bit_count(xor(a2, b2))::INT + bit_count(xor(a3, b3))::INT)::BIGINT AS hamming
         |      FROM p),
         |r AS (SELECT *, row_number() OVER (ORDER BY hamming, i, j) AS rk FROM h
         |      WHERE hamming <= ${Multimodal.PhashMaxHamming})
         |SELECT i, j, hamming FROM r WHERE rk <= 20""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(unhex(md5(text)))::BIGINT AS n_bytes,
        |  substr(md5(text), 1, 8) AS magic,
        |  64 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 192 AS width,
        |  64 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 192 AS height,
        |  1 + ('0x' || substr(md5(text), 5, 1))::BIGINT % 3 AS channels
        |FROM documents""".stripMargin
  )
}

package graft.queries

import graft._
import graft.ann.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval + corpus-modeling operators a training-data pipeline runs next
  * to its dedup/quality stages:
  *
  *  - BM25 retrieval (Robertson & Zaragoza 2009, the Lucene idf variant) —
  *    the lexical-search baseline every RAG/decontamination harness needs;
  *  - Stupid Backoff trigram LM scoring (Brants et al. 2007, "Large
  *    Language Models in Machine Translation") — THE distributed n-gram LM:
  *    counts shard by n-gram key, scoring is pure key-equality joins, no
  *    normalization pass; used here as a CCNet-style per-doc quality signal
  *    (train on the English slice, score everything);
  *  - Naive Bayes language classification over hashed unigram buckets —
  *    train and serve in ONE plan: the model is a (lang × bucket) log-prob
  *    table small enough to broadcast at any corpus size;
  *  - int8 scalar quantization of the embedding corpus (the FAISS SQ8
  *    storage format): per-dimension affine codes + reconstruction
  *    error/cosine certification;
  *  - per-source Zipf rank-frequency slope — the corpus-health profile that
  *    flags template/boilerplate-heavy sources (slope far from −1).
  */
object RetrievalQueries {
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def embs(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  /** The n-gram alphabet every text operator in the suite tokenizes to. */
  private val WordRe = "^[a-z]{2,20}$"
  private val WordReSql = "^[a-z]{2,20}$$"

  /** BM25 shape parameters (the Robertson defaults) + probe-set geometry. */
  private val BmK1 = 1.2
  private val BmB = 0.75
  private val BmTopK = 5
  private val BmQTerms = 3

  /** log2 via a SHARED ln(2) literal: both engines divide by this exact
    * double instead of calling their own log2/ln(2). */
  private val Ln2 = math.log(2.0)
  private val BmProbeMod = 97

  /** Stupid Backoff discount (the Brants et al. constant). */
  private val SbAlpha = 0.4

  /** MMR re-rank geometry: BM25 candidate pool and selections kept. */
  private val MmrCand = 20
  private val MmrK = 10

  /** RRF fusion: the canonical k=60 damping and per-arm list depth. */
  private val RrfK = 60
  private val RrfArmN = 10

  /** Naive-Bayes hashed-feature bucket count. */
  private val NbB = 64

  /** Zipf fit depth: the head ranks the log-log line is fitted on. */
  private val ZipfK = 100

  /** int8 quantization levels. */
  private val SqLevels = 255

  /** IDCG@10 for m relevant docs as an engine-shared CASE — each arm the
    * identical left-to-right 1/log2(i+1) sum. */
  private def idcgSql(m: String): String = {
    val arms = (1 to 10).map { mm =>
      val terms = (1 to mm).map(i => s"1.0E0 / (ln(${i + 1}.0E0) / ln(2.0E0))").mkString(" + ")
      s"WHEN $mm THEN $terms"
    }.mkString(" ")
    s"(CASE least($m, 10) WHEN 0 THEN 0.0E0 $arms END)"
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Retrieval-quality evaluation (NDCG@10 / MRR / P@10) of exact
    // cosine retrieval against the label-match relevance oracle — the
    // embedding-quality scoreboard a retrieval pipeline publishes
    // (complements q_ann_recall's index-vs-exact view: this scores the
    // EMBEDDING, that scores the INDEX). DCG terms reduce as 1e6-scaled
    // integers (rank-determined constants, order-free), IDCG is a
    // shared 10-arm CASE, the probe kernel broadcasts — the corpus
    // never shuffles. ──
    "q_retrieval_ndcg" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
      val nn = graft.ann.Ann.knnBruteForce(e, probes, k = 10)
      val labels = e.select(col("vec_id").as("neighbor_id"), col("label").as("nl"))
      val pl = probes.select(col("vec_id").as("probe_id"), col("label").as("tl"))
      val relCnt = e.groupBy("label").agg(count(lit(1)).as("nlab"))
      val scored = nn.join(labels, "neighbor_id").join(broadcast(pl), "probe_id")
        .withColumn("rel", when(col("nl") === col("tl"), 1L).otherwise(0L))
        .withColumn("dcg6",
          expr("CAST(round(rel / (ln(rk + 1.0E0) / ln(2.0E0)) * 1e6) AS BIGINT)"))
        .withColumn("rr6",
          when(col("rel") === 1, expr("CAST(round(1e6 / rk) AS BIGINT)")).otherwise(0L))
      scored.groupBy("probe_id", "tl").agg(
        sum("rel").as("n_rel_at10"),
        sum("dcg6").as("dcg6"),
        max("rr6").as("rr6"))
        .join(broadcast(relCnt.withColumnRenamed("label", "tl")), "tl")
        .withColumn("nrel", col("nlab") - 1)
        .withColumn("idcg", expr(idcgSql("nrel")))
        .select(col("probe_id"), col("tl").as("label"), col("nrel").as("n_relevant"),
          col("n_rel_at10"),
          round(col("dcg6").cast("double") / 1e6 / col("idcg"), 6).as("ndcg_10"),
          round(col("rr6").cast("double") / 1e6, 6).as("mrr"),
          round(col("n_rel_at10").cast("double") / 10.0, 6).as("p_at_10"))
    }),

    // ── BM25 self-retrieval eval: probe docs (doc_id % 97) contribute
    // their top-3 terms (tf desc, term asc — the q_tfidf_terms ranking
    // discipline) as queries; every doc is scored by Σ_t idf·tf·(k1+1) /
    // (tf + k1·(1−b+b·dl/avgdl)) and the top-5 per query are emitted with
    // whether the probe found itself. Plan: one (doc,term) tf shuffle
    // reused for df/dl/query-terms, a key-equality join on term (query
    // side broadcast — it is #probes×3 rows), one (qid,doc) aggregate and
    // a WindowGroupLimit top-k. Nothing is quadratic: the scoring join
    // fans out only to docs CONTAINING a query term, the inverted-index
    // access pattern a search engine has. Scores are rounded to 6 dp
    // BEFORE ranking (doc_id tie-break) so both engines pick identical
    // rows. ──
    "q_bm25" -> ((s, dir) => {
      // tf feeds FOUR downstream aggregations (df, dl, avgdl, query
      // terms) plus the scoring join — materialize it once instead of
      // paying five tokenize+aggregate corpus passes
      val tf = Scratch.materialize(
        docs(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
          .where(col("term").rlike(WordRe))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
        "bm25_tf")
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val nAvg = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
      val qw = Window.partitionBy("qid").orderBy(col("tf").desc, col("term").asc)
      val qterms = tf.where(col("doc_id") % BmProbeMod === 0)
        .select(col("doc_id").as("qid"), col("term"), col("tf"))
        .withColumn("qrk", row_number().over(qw)).where(col("qrk") <= BmQTerms)
        .select("qid", "term")
      val scored = tf.join(broadcast(qterms), "term")
        .join(dft, "term").join(dl, "doc_id").crossJoin(broadcast(nAvg))
        .withColumn("contrib",
          log(lit(1.0) + (col("n_docs") - col("doc_freq") + 0.5) / (col("doc_freq") + 0.5))
            * col("tf") * (BmK1 + 1.0)
            / (col("tf") + lit(BmK1) * (lit(1.0 - BmB) + lit(BmB) * col("dl") / col("avgdl"))))
        .groupBy("qid", "doc_id").agg(round(sum("contrib"), 6).as("score"))
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= BmTopK)
        .select(col("qid"), col("rk"), col("doc_id"), col("score"),
          when(col("doc_id") === col("qid"), 1).otherwise(0).as("is_self"))
    }),

    // Matryoshka truncation certification (Kusupati et al. 2022 MRL; the
    // FAISS/storage question "how much recall does a prefix-dim index
    // lose?"): exact cosine top-5 under 8- and 16-dim PREFIXES of the
    // 64-dim embeddings vs the full-dim top-5, recall@5 per probe.
    // Truncated cosine needs no explicit renorm (dot/norms of the slice).
    // Scale: three broadcast-probe arms over an unshuffled corpus, each
    // compiling to the WindowGroupLimit top-k; the recall joins touch
    // 5·|probes| rows.
    "q_embed_matryoshka" -> ((s, dir) => {
      val e = embs(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
      def arm(dim: Option[Int]): DataFrame = {
        def cut(c: org.apache.spark.sql.Column) = dim.map(d => slice(c, 1, d)).getOrElse(c)
        val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("c.vec_id"))
        e.as("c").join(broadcast(probes), col("c.vec_id") =!= col("probe_id"))
          .withColumn("cos", graft.expressions.cosine_sim(cut(col("pvec")), cut(col("c.embedding"))))
          .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
          .select(col("probe_id"), col("c.vec_id").as("neighbor_id"))
      }
      val full = arm(None)
      def recallOf(dim: Int, name: String) =
        full.join(arm(Some(dim)).withColumn("hit", lit(1)), Seq("probe_id", "neighbor_id"), "left")
          .groupBy("probe_id").agg(round(sum(coalesce(col("hit"), lit(0))) / 5.0, 6).as(name))
      recallOf(8, "recall_d8").join(recallOf(16, "recall_d16"), "probe_id")
    }),

    // Hybrid retrieval: BM25 lexical arm + exact-cosine vector arm over the
    // SAME probe set (doc_id ≡ vec_id in the corpus), fused with reciprocal
    // rank fusion score Σ 1/(60 + rank) (Cormack, Clarke & Büttcher 2009) —
    // the standard lexical+vector blend of a modern RAG stack. Each arm
    // contributes its top-10; fused top-5 per query. Scale: the lexical arm
    // is the proven q_bm25 shape; the vector arm broadcast-joins only the
    // probe slice against the corpus (corpus never shuffles); fusion itself
    // joins two rank lists of ≤10·|probes| rows — negligible.
    "q_rrf_fusion" -> ((s, dir) => {
      val tf = Scratch.materialize(
        docs(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
          .where(col("term").rlike(WordRe))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
        "rrf_tf")
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val nAvg = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
      val qw = Window.partitionBy("qid").orderBy(col("tf").desc, col("term").asc)
      val qterms = tf.where(col("doc_id") % BmProbeMod === 0)
        .select(col("doc_id").as("qid"), col("term"), col("tf"))
        .withColumn("qrk", row_number().over(qw)).where(col("qrk") <= BmQTerms)
        .select("qid", "term")
      val bmW = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
      val bmRk = tf.join(broadcast(qterms), "term")
        .join(dft, "term").join(dl, "doc_id").crossJoin(broadcast(nAvg))
        .withColumn("contrib",
          log(lit(1.0) + (col("n_docs") - col("doc_freq") + 0.5) / (col("doc_freq") + 0.5))
            * col("tf") * (BmK1 + 1.0)
            / (col("tf") + lit(BmK1) * (lit(1.0 - BmB) + lit(BmB) * col("dl") / col("avgdl"))))
        .groupBy("qid", "doc_id").agg(round(sum("contrib"), 6).as("score"))
        .withColumn("bm_rk", row_number().over(bmW)).where(col("bm_rk") <= RrfArmN)
        .select("qid", "doc_id", "bm_rk")
      val e = embs(s, dir)
      val knnW = Window.partitionBy("qid").orderBy(col("cos").desc, col("doc_id").asc)
      val knnRk = e.as("c")
        .join(broadcast(e.where(col("vec_id") % BmProbeMod === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("pvec"))))
        .withColumn("cos", graft.expressions.cosine_sim(col("pvec"), col("c.embedding")))
        .select(col("qid"), col("c.vec_id").as("doc_id"), col("cos"))
        .withColumn("knn_rk", row_number().over(knnW)).where(col("knn_rk") <= RrfArmN)
        .select("qid", "doc_id", "knn_rk")
      val fuseW = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id").asc)
      bmRk.join(knnRk, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(RrfK) + col("bm_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("knn_rk")), lit(0.0)))
        .withColumn("rk", row_number().over(fuseW)).where(col("rk") <= BmTopK)
        .select(col("qid"), col("rk"), col("doc_id"), round(col("rrf"), 6).as("rrf"),
          col("bm_rk"), col("knn_rk"))
    }),

    // ── Stupid Backoff trigram scoring. Train slice = English docs; the
    // model IS three count relations (tri/bi/uni) — no normalization job,
    // which is the whole point of the Brants design: counts shard by
    // n-gram key and stay sharded. Scoring: each doc's trigram INSTANCES
    // collapse to per-doc trigram TYPES with multiplicities (one map-side
    // explode + one (doc,gram) aggregate), then five key-equality hash
    // joins pick up c3/c2/c1 numerators and denominators — join input is
    // types, not tokens. S = c3/c2ctx, else α·c2/c1ctx, else α²·(c1+1)/
    // (N+V) (the add-1 unigram floor makes OOV scoreable; a train trigram
    // hit implies its context bigram exists, so the cascade needs no
    // null-denominator guards). Per-doc mean log S is the quality
    // signal. ──
    "q_lm_backoff" -> ((s, dir) => {
      // NOT materialized (r12 measured): the tokenize is one cheap map —
      // re-running it per explode branch beats a tokenized-corpus
      // write+read-back 4x at bench scale, and at 100 TB the write is
      // corpus-sized while the recompute is a plain scan
      val toks = docs(s, dir).select(col("doc_id"), col("lang"),
        expr(s"filter(split(lower(text), ' '), t -> t rlike '$WordRe')").as("t"))
      val triOf = (src: DataFrame) => src
        .select(col("doc_id"), explode(when(size(col("t")) >= 3, expr(
          "transform(sequence(2, size(t) - 1), i -> struct(t[i-2] AS w2, t[i-1] AS w1, t[i] AS w))"))
          .otherwise(expr("array()").cast("array<struct<w2:string,w1:string,w:string>>"))).as("g"))
        .select(col("doc_id"), col("g.w2"), col("g.w1"), col("g.w"))
      val train = toks.where(col("lang") === "en")
      val trainTri = triOf(train)
      val c3 = trainTri.groupBy("w2", "w1", "w").agg(count(lit(1)).as("c3"))
      // TRUE bigram/unigram counts from the token stream (not trigram
      // marginals — those would miss doc-edge positions)
      val biT = train.select(explode(when(size(col("t")) >= 2, expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w))"))
        .otherwise(expr("array()").cast("array<struct<w1:string,w:string>>"))).as("g"))
        .select(col("g.w1"), col("g.w"))
      val bi = biT.groupBy("w1", "w").agg(count(lit(1)).as("cb"))
      val c2 = bi.select(col("w1"), col("w"), col("cb").as("c2"))
      val c2ctx = bi.select(col("w1").as("d2"), col("w").as("d1"), col("cb").as("c2ctx"))
      val uni = train.select(explode(col("t")).as("w")).groupBy("w").agg(count(lit(1)).as("c1"))
      val c1ctx = uni.select(col("w").as("d1w"), col("c1").as("c1ctx"))
      val nv = uni.agg(sum("c1").as("n_train"), count(lit(1)).as("v_train"))
      val dt = triOf(toks).groupBy("doc_id", "w2", "w1", "w").agg(count(lit(1)).as("cnt"))
      val scoredTypes = dt
        .join(c3, Seq("w2", "w1", "w"), "left")
        .join(c2, Seq("w1", "w"), "left")
        .join(c2ctx, dt("w2") === c2ctx("d2") && dt("w1") === c2ctx("d1"), "left")
        .join(uni.withColumnRenamed("w", "uw"), dt("w") === col("uw"), "left")
        .join(c1ctx, dt("w1") === c1ctx("d1w"), "left")
        .crossJoin(broadcast(nv))
        .withColumn("s",
          when(col("c3").isNotNull, col("c3") / col("c2ctx"))
            .when(col("c2").isNotNull, lit(SbAlpha) * col("c2") / col("c1ctx"))
            .otherwise(lit(SbAlpha * SbAlpha) * (coalesce(col("c1"), lit(0L)) + 1.0)
              / (col("n_train") + col("v_train"))))
      val perDoc = scoredTypes.groupBy("doc_id").agg(
        sum("cnt").as("n_grams"),
        round(sum(col("cnt") * log(col("s"))) / sum("cnt"), 6).as("avg_logs"))
      docs(s, dir).select("doc_id", "lang").join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("avg_logs"), lit(0.0)).as("avg_logs"))
    }),

    // ── Naive Bayes language ID, trained and served in one plan. Features
    // are hash60(term) % 64 buckets (portable to the oracle bit-for-bit);
    // train split = even doc_ids. The model — per-(lang,bucket) add-1
    // log-likelihoods + log priors — is #langs×64 rows, broadcast however
    // big the corpus gets. Serving joins each odd doc's bucket counts to
    // the model and argmaxes over langs on the 6-dp-rounded posterior
    // (lang-asc tie-break). One token shuffle + one broadcast join + one
    // WindowGroupLimit — the linear fastText-style serving shape. ──
    "q_nb_classify" -> ((s, dir) => {
      // NOT materialized (r12 measured): two consumers = two shuffles of
      // the same counts vs one shuffle + write + two reads — recompute won
      val db = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(split(lower(col("text")), " ")).as("term"))
        .where(col("term").rlike(WordRe))
        .withColumn("bucket", TextFunctions.hash60(col("term")) % NbB)
        .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("c_db"))
      val trainB = db.where(col("doc_id") % 2 === 0)
      val cl = trainB.groupBy(col("lang").as("mlang"), col("bucket"))
        .agg(sum("c_db").as("c_lb"))
      val clTot = cl.groupBy("mlang").agg(sum("c_lb").as("n_l"))
      val prior = docs(s, dir).where(col("doc_id") % 2 === 0)
        .groupBy(col("lang").as("mlang")).agg(count(lit(1)).as("n_docs_l"))
      val nTrain = prior.agg(sum("n_docs_l").as("n_train_docs"))
      // dense (lang × bucket) grid so zero-count buckets still contribute
      // their smoothed log-prob — exactly multinomial NB
      val grid = clTot.crossJoin(broadcast(spark_bucket_range(s)))
      val model = grid.join(cl, Seq("mlang", "bucket"), "left")
        .join(prior, "mlang").crossJoin(broadcast(nTrain))
        .select(col("mlang"), col("bucket"),
          log((coalesce(col("c_lb"), lit(0L)) + 1.0) / (col("n_l") + NbB)).as("llh"),
          log(col("n_docs_l") / col("n_train_docs").cast("double")).as("lprior"))
      val serve = db.where(col("doc_id") % 2 === 1)
      val post = serve.join(broadcast(model), Seq("bucket"))
        .groupBy(col("doc_id"), col("lang"), col("mlang"), col("lprior"))
        .agg(sum(col("c_db") * col("llh")).as("lsum"))
        .withColumn("logpost", round(col("lprior") + col("lsum"), 6))
      val w = Window.partitionBy("doc_id").orderBy(col("logpost").desc, col("mlang").asc)
      post.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("doc_id"), col("lang").as("true_lang"), col("mlang").as("pred_lang"),
          col("logpost"),
          when(col("lang") === col("mlang"), 1).otherwise(0).as("correct"))
    }),

    // ── int8 scalar quantization (SQ8): per-dimension global [min,max]
    // from ONE stats aggregate (dim-count rows, broadcast back), affine
    // codes c = round((x−min)/Δ) ∈ [0,255], and the certification a
    // storage pipeline wants: per-vector reconstruction MSE + cosine
    // between the vector and its dequantized self. The vector table is
    // touched twice map-side (encode, certify) with no shuffle beyond the
    // per-vector re-aggregate; at 100 TB the dim-stats table is dims
    // rows, the codes are 1/4 the float32 footprint, and everything is
    // native column math. ──
    "q_embed_sq8" -> ((s, dir) => {
      val dims = embs(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("x", col("x").cast("double"))
      val stats = dims.groupBy("dim").agg(min("x").as("lo"), max("x").as("hi"))
        .withColumn("delta", when(col("hi") > col("lo"), (col("hi") - col("lo")) / SqLevels)
          .otherwise(lit(1.0)))
      val coded = dims.join(broadcast(stats), "dim")
        .withColumn("code", round((col("x") - col("lo")) / col("delta"), 0).cast("int"))
        .withColumn("recon", col("lo") + col("code") * col("delta"))
      coded.groupBy("vec_id").agg(
        round(avg(pow(col("x") - col("recon"), 2)), 6).as("mse"),
        round(sum(col("x") * col("recon"))
          / (sqrt(sum(col("x") * col("x"))) * sqrt(sum(col("recon") * col("recon")))), 6)
          .as("cos_recon"),
        max(abs(col("code") * 2 - SqLevels)).as("max_code_dev"))
    }),

    // ── Zipf rank-frequency slope per source: term histogram → head-100
    // ranks (count desc, term asc) → OLS slope/intercept of ln(count) on
    // ln(rank). One (source,term) shuffle, a WindowGroupLimit head, and a
    // 100-row-per-source regression — corpus-size-free output. Healthy
    // natural text sits near slope −1; template-heavy sources flatten. ──
    "q_corpus_zipf" -> ((s, dir) => {
      val st = docs(s, dir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("term"))
        .where(col("term").rlike(WordRe))
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source").orderBy(col("c").desc, col("term").asc)
      st.withColumn("rnk", row_number().over(w)).where(col("rnk") <= ZipfK)
        .groupBy("source").agg(
          count(lit(1)).as("n_ranks"),
          round(regr_slope(log(col("c")), log(col("rnk"))), 6).as("zipf_slope"),
          round(regr_intercept(log(col("c")), log(col("rnk"))), 6).as("zipf_intercept"))
    }),

    // ── MMR re-ranking (Carbonell & Goldstein 1998 Maximal Marginal
    // Relevance — the diversity re-rank a production retrieval stack
    // applies after BM25/fusion): candidates = BM25 top-20 per query,
    // then greedily select 10 by λ·rel − (1−λ)·max-cosine-to-selected
    // (λ=0.5), using each doc's embedding (doc_id-aligned vectors). The
    // greedy chain runs on 6-dp-ROUNDED BM25 scores and cosines, so both
    // engines argmax over identical doubles; tie-break = candidate-list
    // position (doc_id order). Shapes: the candidate pair-cosine join is
    // (#queries·20²) rows, the greedy kernel runs once per query after a
    // one-row-per-query reduction; the oracle replays it with
    // selected-position list state. ──
    // Ranked-retrieval quality metrics over the embedding corpus: cosine
    // kNN@10 per probe with label-match relevance, then the standard IR
    // battery — precision@10, MRR, nDCG@10 (ideal DCG over the
    // min(n_rel, 10)-term perfect ranking), AP@10. The eval harness a
    // retrieval / hard-negative pipeline certifies its index against
    // (complements q_ann_recall's exact-vs-LSH agreement). The corpus
    // never shuffles for the kNN (probes broadcast); everything after is
    // ≤10 rows per probe. Both engines fold DCG/AP through the same
    // ascending-rank window cumsum and share the JVM ln(2) literal.
    "q_retrieval_eval" -> ((s, dir) => {
      val e = embs(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
      val ranked = graft.ann.Ann.knnBruteForce(e, probes, k = 10)
      val lbl = e.select(col("vec_id"), col("label"))
      val top = ranked
        .join(broadcast(lbl.select(col("vec_id").as("probe_id"), col("label").as("plabel"))), "probe_id")
        .join(broadcast(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel"))), "neighbor_id")
        .withColumn("rel", (col("plabel") === col("nlabel")).cast("int"))
      val wcum = Window.partitionBy("probe_id").orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = top
        .withColumn("cumhits", sum("rel").over(wcum))
        .withColumn("dcg_t", col("rel").cast("double") / (log((col("rk") + 1).cast("double")) / Ln2))
        .withColumn("ap_t", when(col("rel") === 1,
          col("cumhits").cast("double") / col("rk")).otherwise(lit(0.0)))
      val per = terms.groupBy("probe_id").agg(
        sum("rel").cast("long").as("hits"),
        sum("dcg_t").as("dcg"),
        sum("ap_t").as("ap_sum"),
        min(when(col("rel") === 1, col("rk"))).as("first_rel"))
      val corpusRel = e.groupBy("label").agg(count(lit(1)).as("nl"))
      val nRel = probes.select(col("vec_id").as("probe_id"), col("label"))
        .join(broadcast(corpusRel), "label")
        .select(col("probe_id"), (col("nl") - 1).cast("long").as("n_rel"))
      val wid = Window.partitionBy(substring(col("m").cast("string"), 1, 0)).orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ideal = s.range(1, 11).select(col("id").as("m"))
        .withColumn("t", lit(1.0) / (log((col("m") + 1).cast("double")) / Ln2))
        .withColumn("idcg", sum("t").over(wid))
        .select(col("m"), col("idcg"))
      per.join(nRel, "probe_id")
        .withColumn("m", least(col("n_rel"), lit(10L)))
        .join(broadcast(ideal), Seq("m"), "left")
        .select(col("probe_id"), col("n_rel"),
          round(col("hits") / 10.0, 6).as("p_at_10"),
          round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
          round(when(col("m") >= 1, col("dcg") / col("idcg")).otherwise(lit(0.0)), 6).as("ndcg_10"),
          round(when(col("m") >= 1, col("ap_sum") / col("m")).otherwise(lit(0.0)), 6).as("ap_10"))
    }),

    "q_mmr_rerank" -> ((s, dir) => {
      // tf feeds FIVE consumers (dl, avgdl, df, query terms, the scoring
      // join) — the q_bm25 materialization discipline; the before-plan
      // re-tokenized the corpus 34 times without it
      val tf = Scratch.materialize(
        docs(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
          .where(col("term").rlike(WordRe))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
        "mmr_tf")
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val nAvg = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
      val qw = Window.partitionBy("qid").orderBy(col("tf").desc, col("term").asc)
      val qterms = tf.where(col("doc_id") % BmProbeMod === 0)
        .select(col("doc_id").as("qid"), col("term"), col("tf"))
        .withColumn("qrk", row_number().over(qw)).where(col("qrk") <= BmQTerms)
        .select("qid", "term")
      val scored = tf.join(broadcast(qterms), "term")
        .join(dft, "term").join(dl, "doc_id").crossJoin(broadcast(nAvg))
        .withColumn("contrib",
          log(lit(1.0) + (col("n_docs") - col("doc_freq") + 0.5) / (col("doc_freq") + 0.5))
            * col("tf") * (BmK1 + 1.0)
            / (col("tf") + lit(BmK1) * (lit(1.0 - BmB) + lit(BmB) * col("dl") / col("avgdl"))))
        .groupBy("qid", "doc_id").agg(round(sum("contrib"), 6).as("score"))
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
      // cands feeds THREE consumers (both sides of the pair-cosine join +
      // the candidate list) — materialize so the BM25 chain runs once
      val cands = Scratch.materialize(
        scored.withColumn("rk", row_number().over(w)).where(col("rk") <= MmrCand)
          .select("qid", "doc_id", "score"),
        "mmr_cands")
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val pc = cands.as("a").join(cands.as("b"),
          col("a.qid") === col("b.qid") && col("a.doc_id") =!= col("b.doc_id"))
        .join(e.as("ea"), col("a.doc_id") === col("ea.vec_id"))
        .join(e.as("eb"), col("b.doc_id") === col("eb.vec_id"))
        .select(col("a.qid").as("qid"), col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          round(graft.expressions.cosine_sim(col("ea.embedding"), col("eb.embedding")), 6).as("cos"))
      val cl = cands.groupBy("qid")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("score")))).as("cl"))
      val pl = pc.groupBy("qid")
        .agg(collect_list(struct(col("da"), col("db"), col("cos"))).as("pl"))
      // selection runs ENTIRELY on 1e6-scaled integers (rel and cosine are
      // both 6-dp), so the greedy argmax chain cannot diverge between
      // engines; the emitted gain rel − maxsim (λ=0.5 up to the constant
      // factor 2) is a 6-dp-exact value with no rounding boundary
      val fn = udf { (cl: Seq[org.apache.spark.sql.Row], pl: Seq[org.apache.spark.sql.Row]) =>
        val n = cl.length
        val ids = cl.map(_.getLong(0)).toArray
        val rel = cl.map(_.getDouble(1)).toArray
        val irel = rel.map(r => math.round(r * 1e6))
        val pos = ids.zipWithIndex.toMap
        val sim = Array.fill(n, n)(0L)
        pl.foreach { r => sim(pos(r.getLong(0)))(pos(r.getLong(1))) = math.round(r.getDouble(2) * 1e6) }
        val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
        var k = 0
        while (k < MmrK && sel.length < n) {
          var best = Long.MinValue; var bi = -1
          var i = 0
          while (i < n) {
            if (!sel.contains(i)) {
              // clamp at 0: a NEGATIVE max similarity must not become a
              // relevance bonus (the standard nonneg-similarity MMR form)
              val ms = if (sel.isEmpty) 0L else math.max(0L, sel.map(s => sim(i)(s)).max)
              val v = irel(i) - ms
              if (v > best) { best = v; bi = i }
            }
            i += 1
          }
          sel += bi
          out += ((k + 1, ids(bi), rel(bi), best / 1e6))
          k += 1
        }
        out.toArray
      }
      cl.join(pl, Seq("qid"), "left")
        .withColumn("_m", explode(fn(col("cl"), coalesce(col("pl"),
          array().cast("array<struct<da:bigint,db:bigint,cos:double>>")))))
        .select(col("qid"), col("_m._1").as("sel_rank"), col("_m._2").as("doc_id"),
          col("_m._3").as("rel"), round(col("_m._4"), 6).as("mmr_gain"))
    })
  )

  /** The dense bucket spine 0..NbB-1 as a one-column DataFrame. */
  private def spark_bucket_range(s: SparkSession): DataFrame =
    s.range(NbB).select(col("id").cast("long").as("bucket"))

  private val TokSql =
    s"SELECT doc_id, lang, source, list_filter(string_split(lower(text), ' '), t -> regexp_matches(t, '$WordReSql')) AS t FROM documents"

  val sql: Map[String, String] = Map(

    "q_retrieval_ndcg" ->
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec, label AS tl
         |               FROM embeddings ${Ann.ProbeQualify}),
         |sc AS (SELECT p.probe_id, p.tl, c.vec_id AS nid, c.label AS nl,
         |         ${LlmQueries.cosSql("p.pvec", "c.embedding")} AS cos
         |       FROM probes p JOIN embeddings c ON c.vec_id <> p.probe_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cos DESC, nid) AS rk FROM sc),
         |top AS (SELECT probe_id, tl, nl, rk,
         |    CASE WHEN nl = tl THEN 1 ELSE 0 END AS rel FROM rk WHERE rk <= 10),
         |tm AS (SELECT probe_id, tl,
         |    sum(rel)::BIGINT AS n_rel_at10,
         |    sum(round(rel / (ln(rk + 1.0E0) / ln(2.0E0)) * 1e6)::BIGINT)::BIGINT AS dcg6,
         |    max(CASE WHEN rel = 1 THEN round(1e6 / rk)::BIGINT ELSE 0 END) AS rr6
         |  FROM top GROUP BY 1, 2),
         |rc AS (SELECT label AS tl, count(*)::BIGINT AS nlab FROM embeddings GROUP BY 1),
         |fin AS (SELECT tm.*, rc.nlab - 1 AS nrel,
         |    ${idcgSql("rc.nlab - 1")} AS idcg
         |  FROM tm JOIN rc USING (tl))
         |SELECT probe_id, tl AS label, nrel AS n_relevant, n_rel_at10,
         |  round(dcg6::DOUBLE / 1e6 / idcg, 6) AS ndcg_10,
         |  round(rr6::DOUBLE / 1e6, 6) AS mrr,
         |  round(n_rel_at10::DOUBLE / 10.0E0, 6) AS p_at_10
         |FROM fin""".stripMargin,
    "q_bm25" ->
      s"""WITH tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
         |            WHERE regexp_matches(term, '$WordReSql') GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |na AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (SELECT term, count(*)::BIGINT AS doc_freq FROM tf GROUP BY 1),
         |qt AS (SELECT doc_id AS qid, term
         |       FROM (SELECT doc_id, term,
         |               row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS qrk
         |             FROM tf WHERE doc_id % $BmProbeMod = 0)
         |       WHERE qrk <= $BmQTerms),
         |sc AS (SELECT qt.qid, tf.doc_id,
         |         round(sum(ln(1.0 + (na.n_docs - df.doc_freq + 0.5) / (df.doc_freq + 0.5))
         |           * tf.tf * ($BmK1 + 1.0)
         |           / (tf.tf + $BmK1 * (1.0 - $BmB + $BmB * dl.dl / na.avgdl))), 6) AS score
         |       FROM tf JOIN qt USING (term) JOIN df USING (term)
         |         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN na
         |       GROUP BY 1, 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk FROM sc)
         |SELECT qid, rk::INT AS rk, doc_id, score,
         |  CASE WHEN doc_id = qid THEN 1 ELSE 0 END AS is_self
         |FROM rk WHERE rk <= $BmTopK""".stripMargin,

    "q_retrieval_eval" ->
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec, label AS plabel
         |               FROM embeddings ${Ann.ProbeQualify}),
         |r0 AS (SELECT probe_id, plabel, c.vec_id AS neighbor_id, c.label AS nlabel,
         |         ${LlmQueries.cosSql("pvec", "c.embedding")} AS cos
         |       FROM probes JOIN embeddings c ON c.vec_id <> probe_id),
         |top AS (SELECT probe_id, rk, CASE WHEN nlabel = plabel THEN 1 ELSE 0 END AS rel FROM (
         |          SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
         |          FROM r0) WHERE rk <= 10),
         |tt AS (SELECT *, sum(rel) OVER (PARTITION BY probe_id ORDER BY rk
         |                                ROWS UNBOUNDED PRECEDING) AS cumhits FROM top),
         |per AS (SELECT probe_id, sum(rel)::BIGINT AS hits,
         |          sum(rel::DOUBLE / (ln((rk + 1)::DOUBLE) / $Ln2)) AS dcg,
         |          sum(CASE WHEN rel = 1 THEN cumhits::DOUBLE / rk ELSE 0.0E0 END) AS ap_sum,
         |          min(CASE WHEN rel = 1 THEN rk END) AS first_rel
         |        FROM tt GROUP BY 1),
         |cr AS (SELECT label, count(*) AS nl FROM embeddings GROUP BY 1),
         |nr AS (SELECT p.probe_id, (cr.nl - 1)::BIGINT AS n_rel
         |       FROM probes p JOIN cr ON p.plabel = cr.label),
         |ideal AS (SELECT m, sum(t) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS idcg FROM (
         |            SELECT i AS m, 1.0E0 / (ln((i + 1)::DOUBLE) / $Ln2) AS t
         |            FROM (SELECT unnest(range(1, 11)) AS i))),
         |j AS (SELECT per.*, nr.n_rel, least(nr.n_rel, 10) AS m FROM per JOIN nr USING (probe_id))
         |SELECT j.probe_id, j.n_rel,
         |  round(j.hits / 10.0E0, 6) AS p_at_10,
         |  round(coalesce(1.0E0 / j.first_rel, 0.0E0), 6) AS mrr,
         |  round(CASE WHEN j.m >= 1 THEN j.dcg / i.idcg ELSE 0.0E0 END, 6) AS ndcg_10,
         |  round(CASE WHEN j.m >= 1 THEN j.ap_sum / j.m ELSE 0.0E0 END, 6) AS ap_10
         |FROM j LEFT JOIN ideal i ON j.m = i.m""".stripMargin,

    "q_mmr_rerank" ->
      s"""WITH RECURSIVE tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
         |            WHERE regexp_matches(term, '$WordReSql') GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |na AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (SELECT term, count(*)::BIGINT AS doc_freq FROM tf GROUP BY 1),
         |qt AS (SELECT doc_id AS qid, term
         |       FROM (SELECT doc_id, term,
         |               row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS qrk
         |             FROM tf WHERE doc_id % $BmProbeMod = 0)
         |       WHERE qrk <= $BmQTerms),
         |sc AS (SELECT qt.qid, tf.doc_id,
         |         round(sum(ln(1.0 + (na.n_docs - df.doc_freq + 0.5) / (df.doc_freq + 0.5))
         |           * tf.tf * ($BmK1 + 1.0)
         |           / (tf.tf + $BmK1 * (1.0 - $BmB + $BmB * dl.dl / na.avgdl))), 6) AS score
         |       FROM tf JOIN qt USING (term) JOIN df USING (term)
         |         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN na
         |       GROUP BY 1, 2),
         |cands AS (SELECT qid, doc_id, score FROM (
         |            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
         |            FROM sc) WHERE rk <= $MmrCand),
         |cl AS (SELECT qid, list(struct_pack(d := doc_id, s := score) ORDER BY doc_id) AS cl
         |       FROM cands GROUP BY 1),
         |pos_ AS (SELECT qid, i, c.d AS d
         |         FROM (SELECT qid, generate_subscripts(cl, 1) AS i, unnest(cl) AS c FROM cl)),
         |pc AS (SELECT a.qid, a.doc_id AS da, b.doc_id AS db,
         |         round(${LlmQueries.cosSql("ea.embedding", "eb.embedding")}, 6) AS cos
         |       FROM cands a JOIN cands b ON a.qid = b.qid AND a.doc_id <> b.doc_id
         |       JOIN embeddings ea ON a.doc_id = ea.vec_id
         |       JOIN embeddings eb ON b.doc_id = eb.vec_id),
         |simrow AS (SELECT a.qid, a.i, list(coalesce(pc.cos, 0.0E0) ORDER BY b.i) AS row
         |           FROM pos_ a JOIN pos_ b ON a.qid = b.qid
         |           LEFT JOIN pc ON pc.qid = a.qid AND pc.da = a.d AND pc.db = b.d
         |           GROUP BY 1, 2),
         |simm AS (SELECT qid, list(row ORDER BY i) AS sm FROM simrow GROUP BY 1),
         |st AS (SELECT c.qid, c.cl, s.sm, len(c.cl)::BIGINT AS nc
         |       FROM cl c JOIN simm s ON c.qid = s.qid),
         |mmr AS (
         |  SELECT qid, 0 AS k, []::BIGINT[] AS sel,
         |         0::BIGINT AS pick_d, 0.0::DOUBLE AS pick_rel, 0::BIGINT AS pick_v,
         |         cl, sm, nc
         |  FROM st
         |  UNION ALL
         |  SELECT e.qid, e.k + 1, list_append(e.sel, m.pick),
         |         e.cl[m.pick].d, e.cl[m.pick].s, m.v, e.cl, e.sm, e.nc
         |  FROM mmr e, LATERAL (
         |    SELECT list_position(vals, list_max(vals))::BIGINT AS pick, list_max(vals) AS v
         |    FROM (SELECT list_transform(range(1, e.nc + 1), i ->
         |            CASE WHEN list_contains(e.sel, i) THEN -4611686018427387904
         |                 ELSE round(e.cl[i].s * 1e6)::BIGINT -
         |                   (CASE WHEN len(e.sel) = 0 THEN 0::BIGINT
         |                         ELSE greatest(0::BIGINT, list_max(list_transform(e.sel,
         |                                s2 -> round(e.sm[i][s2] * 1e6)::BIGINT))) END)
         |            END) AS vals)
         |  ) m
         |  WHERE e.k < $MmrK AND e.k < e.nc)
         |SELECT qid, k AS sel_rank, pick_d AS doc_id, pick_rel AS rel,
         |  round(pick_v / 1e6, 6) AS mmr_gain
         |FROM mmr WHERE k > 0""".stripMargin,

    "q_embed_matryoshka" -> {
      def armSql(name: String, vec: String) =
        s"""$name AS (SELECT probe_id, neighbor_id FROM (
           |  SELECT p.probe_id, c.vec_id AS neighbor_id,
           |    row_number() OVER (PARTITION BY p.probe_id
           |      ORDER BY ${LlmQueries.cosSql(s"p.pvec$vec", s"c.embedding$vec")} DESC, c.vec_id) AS rk
           |  FROM pr p JOIN embeddings c ON c.vec_id <> p.probe_id) WHERE rk <= 5)""".stripMargin
      s"""WITH pr AS (SELECT vec_id AS probe_id, embedding AS pvec FROM embeddings ${Ann.ProbeQualify}),
         |${armSql("full5", "")},
         |${armSql("d8", "[1:8]")},
         |${armSql("d16", "[1:16]")},
         |r8 AS (SELECT f.probe_id,
         |         round(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / 5.0, 6) AS recall_d8
         |       FROM full5 f LEFT JOIN d8 t USING (probe_id, neighbor_id) GROUP BY 1),
         |r16 AS (SELECT f.probe_id,
         |         round(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / 5.0, 6) AS recall_d16
         |       FROM full5 f LEFT JOIN d16 t USING (probe_id, neighbor_id) GROUP BY 1)
         |SELECT r8.probe_id, r8.recall_d8, r16.recall_d16
         |FROM r8 JOIN r16 USING (probe_id)""".stripMargin
    },

    "q_rrf_fusion" ->
      s"""WITH tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
         |            WHERE regexp_matches(term, '$WordReSql') GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |na AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (SELECT term, count(*)::BIGINT AS doc_freq FROM tf GROUP BY 1),
         |qt AS (SELECT doc_id AS qid, term
         |       FROM (SELECT doc_id, term,
         |               row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS qrk
         |             FROM tf WHERE doc_id % $BmProbeMod = 0)
         |       WHERE qrk <= $BmQTerms),
         |sc AS (SELECT qt.qid, tf.doc_id,
         |         round(sum(ln(1.0 + (na.n_docs - df.doc_freq + 0.5) / (df.doc_freq + 0.5))
         |           * tf.tf * ($BmK1 + 1.0)
         |           / (tf.tf + $BmK1 * (1.0 - $BmB + $BmB * dl.dl / na.avgdl))), 6) AS score
         |       FROM tf JOIN qt USING (term) JOIN df USING (term)
         |         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN na
         |       GROUP BY 1, 2),
         |bm AS (SELECT qid, doc_id, bm_rk FROM (
         |         SELECT qid, doc_id,
         |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS bm_rk
         |         FROM sc) WHERE bm_rk <= $RrfArmN),
         |pr AS (SELECT vec_id AS qid, embedding AS pvec FROM embeddings WHERE vec_id % $BmProbeMod = 0),
         |kn0 AS (SELECT pr.qid, c.vec_id AS doc_id,
         |          ${LlmQueries.cosSql("pr.pvec", "c.embedding")} AS cos
         |        FROM pr, embeddings c),
         |knn AS (SELECT qid, doc_id, knn_rk FROM (
         |          SELECT qid, doc_id,
         |            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS knn_rk
         |          FROM kn0) WHERE knn_rk <= $RrfArmN),
         |fused AS (SELECT qid, doc_id, bm_rk, knn_rk,
         |            coalesce(1.0 / ($RrfK + bm_rk), 0.0) + coalesce(1.0 / ($RrfK + knn_rk), 0.0) AS rrf
         |          FROM bm FULL JOIN knn USING (qid, doc_id))
         |SELECT qid, rk::INT AS rk, doc_id, round(rrf, 6) AS rrf,
         |  bm_rk::INT AS bm_rk, knn_rk::INT AS knn_rk
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rk
         |      FROM fused)
         |WHERE rk <= $BmTopK""".stripMargin,

    "q_lm_backoff" ->
      s"""WITH toks AS ($TokSql),
         |tri AS (SELECT doc_id, t[i-2] AS w2, t[i-1] AS w1, t[i] AS w
         |        FROM (SELECT doc_id, t, unnest(range(3, len(t) + 1))::INT AS i FROM toks)),
         |tr_tri AS (SELECT tri.* FROM tri JOIN toks USING (doc_id) WHERE toks.lang = 'en'),
         |c3 AS (SELECT w2, w1, w, count(*)::BIGINT AS c3 FROM tr_tri GROUP BY 1, 2, 3),
         |bi AS (SELECT t[i-1] AS wa, t[i] AS wb, count(*)::BIGINT AS cb
         |       FROM (SELECT t, unnest(range(2, len(t) + 1))::INT AS i FROM toks WHERE lang = 'en')
         |       GROUP BY 1, 2),
         |c2 AS (SELECT wa AS w1, wb AS w, cb AS c2 FROM bi),
         |c2ctx AS (SELECT wa AS w2, wb AS w1, cb AS c2ctx FROM bi),
         |uni AS (SELECT w, count(*)::BIGINT AS c1
         |        FROM (SELECT unnest(t) AS w FROM toks WHERE lang = 'en') GROUP BY 1),
         |nv AS (SELECT sum(c1)::BIGINT AS n_train, count(*)::BIGINT AS v_train FROM uni),
         |dt AS (SELECT doc_id, w2, w1, w, count(*)::BIGINT AS cnt FROM tri GROUP BY 1, 2, 3, 4),
         |st AS (SELECT dt.doc_id, dt.cnt,
         |         CASE WHEN c3.c3 IS NOT NULL THEN c3.c3 / c2ctx.c2ctx::DOUBLE
         |              WHEN c2.c2 IS NOT NULL THEN $SbAlpha * c2.c2 / u1.c1::DOUBLE
         |              ELSE $SbAlpha * $SbAlpha * (coalesce(u0.c1, 0) + 1.0) / (nv.n_train + nv.v_train)
         |         END AS s
         |       FROM dt
         |       LEFT JOIN c3 ON dt.w2 = c3.w2 AND dt.w1 = c3.w1 AND dt.w = c3.w
         |       LEFT JOIN c2 ON dt.w1 = c2.w1 AND dt.w = c2.w
         |       LEFT JOIN c2ctx ON dt.w2 = c2ctx.w2 AND dt.w1 = c2ctx.w1
         |       LEFT JOIN uni u0 ON dt.w = u0.w
         |       LEFT JOIN uni u1 ON dt.w1 = u1.w
         |       CROSS JOIN nv),
         |pd AS (SELECT doc_id, sum(cnt)::BIGINT AS n_grams,
         |         round(sum(cnt * ln(s)) / sum(cnt), 6) AS avg_logs
         |       FROM st GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |  coalesce(pd.n_grams, 0)::BIGINT AS n_grams,
         |  coalesce(pd.avg_logs, 0.0) AS avg_logs
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q_nb_classify" ->
      s"""WITH db AS (SELECT doc_id, lang, bucket, count(*)::BIGINT AS c_db
         |            FROM (SELECT doc_id, lang,
         |                    ('0x' || substr(md5(term), 1, 15))::BIGINT % $NbB AS bucket
         |                  FROM (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
         |                        FROM documents)
         |                  WHERE regexp_matches(term, '$WordReSql'))
         |            GROUP BY 1, 2, 3),
         |cl AS (SELECT lang AS mlang, bucket, sum(c_db)::BIGINT AS c_lb
         |       FROM db WHERE doc_id % 2 = 0 GROUP BY 1, 2),
         |clt AS (SELECT mlang, sum(c_lb)::BIGINT AS n_l FROM cl GROUP BY 1),
         |pri AS (SELECT lang AS mlang, count(*)::BIGINT AS n_docs_l
         |        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
         |nt AS (SELECT sum(n_docs_l)::BIGINT AS n_train_docs FROM pri),
         |model AS (SELECT clt.mlang, b.bucket,
         |            ln((coalesce(cl.c_lb, 0) + 1.0) / (clt.n_l + $NbB)) AS llh,
         |            ln(pri.n_docs_l / nt.n_train_docs::DOUBLE) AS lprior
         |          FROM clt CROSS JOIN (SELECT unnest(range(0, $NbB)) AS bucket) b
         |          LEFT JOIN cl ON cl.mlang = clt.mlang AND cl.bucket = b.bucket
         |          JOIN pri ON pri.mlang = clt.mlang CROSS JOIN nt),
         |post AS (SELECT db.doc_id, db.lang, m.mlang,
         |           round(any_value(m.lprior) + sum(db.c_db * m.llh), 6) AS logpost
         |         FROM db JOIN model m USING (bucket)
         |         WHERE db.doc_id % 2 = 1
         |         GROUP BY 1, 2, 3),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY logpost DESC, mlang) AS rk
         |       FROM post)
         |SELECT doc_id, lang AS true_lang, mlang AS pred_lang, logpost,
         |  CASE WHEN lang = mlang THEN 1 ELSE 0 END AS correct
         |FROM rk WHERE rk = 1""".stripMargin,

    "q_embed_sq8" ->
      s"""WITH dims AS (SELECT vec_id, dim - 1 AS dim, x::DOUBLE AS x
         |              FROM (SELECT vec_id, unnest(embedding) AS x,
         |                      generate_subscripts(embedding, 1) AS dim
         |                    FROM embeddings)),
         |st AS (SELECT dim, min(x) AS lo, max(x) AS hi,
         |         CASE WHEN max(x) > min(x) THEN (max(x) - min(x)) / $SqLevels ELSE 1.0 END AS delta
         |       FROM dims GROUP BY 1),
         |coded AS (SELECT vec_id, x,
         |            lo + round((x - lo) / delta, 0)::INT * delta AS recon,
         |            round((x - lo) / delta, 0)::INT AS code
         |          FROM dims JOIN st USING (dim))
         |SELECT vec_id,
         |  round(avg((x - recon) * (x - recon)), 6) AS mse,
         |  round(sum(x * recon) / (sqrt(sum(x * x)) * sqrt(sum(recon * recon))), 6) AS cos_recon,
         |  max(abs(code * 2 - $SqLevels))::INT AS max_code_dev
         |FROM coded GROUP BY 1""".stripMargin,

    "q_corpus_zipf" ->
      s"""WITH st AS (SELECT source, term, count(*)::BIGINT AS c
         |            FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents)
         |            WHERE regexp_matches(term, '$WordReSql') GROUP BY 1, 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY c DESC, term) AS rnk
         |       FROM st)
         |SELECT source, count(*)::BIGINT AS n_ranks,
         |  round(regr_slope(ln(c), ln(rnk)), 6) AS zipf_slope,
         |  round(regr_intercept(ln(c), ln(rnk)), 6) AS zipf_intercept
         |FROM rk WHERE rnk <= $ZipfK GROUP BY 1""".stripMargin
  )
}

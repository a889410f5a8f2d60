package graft.queries

import graft._
import graft.ann.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection and embedding-evaluation operators:
  *
  *  - DSIR importance weights (Xie et al. 2023, "Data Selection for
  *    Language Models via Importance Resampling"): hashed-unigram bag
  *    models for a target vs the raw corpus, per-doc log importance
  *    weight Σ c_b·(ln p_t[b] − ln p_r[b]);
  *  - smoothed unigram KL drift per source vs the corpus-wide
  *    distribution — the distribution-shift monitor a mixture pipeline
  *    tracks per ingest source;
  *  - kNN label classification over the embedding corpus — the standard
  *    embedding-quality probe (majority vote of the 5 exact nearest
  *    neighbors vs the held-out label).
  */
object SelectQueries {
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def embs(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  /** DSIR hashed-feature bucket count. */
  private val DsirB = 64

  /** The n-gram alphabet every text operator in the suite tokenizes to. */
  private val WordRe = "^[a-z]{2,20}$"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── DSIR: target = English docs, raw = whole corpus. Unigrams hash
    // into B=64 buckets (the portable md5-derived hash60, so the oracle
    // reproduces buckets exactly); bucket models get add-1 smoothing; the
    // per-doc log weight is Σ_b c_db·λ_b with λ broadcast as a 64-row
    // table. One token shuffle + one broadcast join — the q_text_perplexity
    // shape, linear in corpus tokens at any scale. keep = logw > 0 (doc
    // looks more target-like than raw-like) stays map-side; no global
    // sort or quantile is needed to act on the weights. ──
    "q_dsir_weights" -> ((s, dir) => {
      // ONE corpus tokenize pass: the per-(doc,bucket) counts feed both
      // the bucket models (re-aggregated to 64 rows) and the per-doc
      // scoring join — the corpus is never read twice for the model
      val cdb = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(split(lower(col("text")), " ")).as("term"))
        .where(col("term").rlike(WordRe))
        .withColumn("bucket", TextFunctions.hash60(col("term")) % DsirB)
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("c_db"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_db_t"))
      val bk = cdb.groupBy("bucket").agg(sum("c_db").as("c_r"), sum("c_db_t").as("c_t"))
      val tots = bk.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
      val lam = bk.crossJoin(broadcast(tots))
        .select(col("bucket"),
          (log((col("c_t") + 1.0) / (col("n_t") + DsirB))
            - log((col("c_r") + 1.0) / (col("n_r") + DsirB))).as("lam"))
      val perDoc = cdb.join(broadcast(lam), "bucket")
        .groupBy("doc_id").agg(
          sum("c_db").as("n_tokens"),
          round(sum(col("c_db") * col("lam")), 6).as("logw"))
      docs(s, dir).select(col("doc_id"), when(col("lang") === "en", 1).otherwise(0).as("is_target"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("is_target"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("logw"), lit(0.0)).as("logw"),
          when(coalesce(col("logw"), lit(0.0)) > 0, 1).otherwise(0).as("keep"))
    }),

    // ── Per-source smoothed unigram KL vs the corpus distribution,
    // computed EXACTLY over the full vocabulary without a source×vocab
    // cross join: the absent-term mass folds into closed form
    // p₀·((V−V_s)·ln p₀ − (Lq_all − Lq_s)) using one global scalar
    // (Lq_all = Σ_t ln q_t) — so the plan is one (source,term) shuffle,
    // one vocabulary aggregate, a key-equality join on term, and
    // broadcast scalars. ──
    "q_source_kl" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("term"))
        .where(col("term").rlike(WordRe))
      val st = toks.groupBy("source", "term").agg(count(lit(1)).as("c_st"))
      val gt = st.groupBy("term").agg(sum("c_st").as("c_t"))
      val tot = gt.agg(sum("c_t").as("n"), count(lit(1)).as("v"))
      val qt = gt.crossJoin(broadcast(tot))
        .select(col("term"), ((col("c_t") + 1.0) / (col("n") + col("v"))).as("q_t"))
      val lqAll = qt.agg(sum(log(col("q_t"))).as("lq_all"))
      val ns = st.groupBy("source").agg(sum("c_st").as("n_s"), count(lit(1)).as("v_s"))
      val per = st.join(qt, "term").join(ns, "source").crossJoin(broadcast(tot))
        .withColumn("p_st", (col("c_st") + 1.0) / (col("n_s") + col("v")))
        .groupBy("source").agg(
          sum(col("p_st") * (log(col("p_st")) - log(col("q_t")))).as("part1"),
          sum(log(col("q_t"))).as("lq_s"))
      per.join(ns, "source").crossJoin(broadcast(tot)).crossJoin(broadcast(lqAll))
        .withColumn("p0", lit(1.0) / (col("n_s") + col("v")))
        .select(col("source"), col("n_s").as("n_tokens"), col("v_s").as("n_terms"),
          round(col("part1")
            + col("p0") * ((col("v") - col("v_s")) * log(col("p0")) - (col("lq_all") - col("lq_s"))), 6)
            .as("kl"))
    }),

    // Deterministic training-shard planning: docs fill fixed token-budget
    // shards in doc_id order WITHIN each source (shard_id = exclusive
    // prefix-sum ÷ budget), then per-shard manifests. Per-source running
    // sums keep the plan embarrassingly parallel — no global ordering or
    // single-reducer prefix sum at 100 TB; the doc_id order makes every
    // backfill reproduce the identical shard map.
    "q_shard_plan" -> ((s, dir) => {
      val budget = 2000L
      val w = Window.partitionBy("source").orderBy("doc_id")
      docs(s, dir)
        .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
        .withColumn("cum", sum("toks").over(w))
        .withColumn("shard_id", ((col("cum") - col("toks")) / budget).cast("long"))
        .groupBy("source", "shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    }),

    // Deterministic stratified eval-split carving: per language stratum,
    // the 25 docs with the smallest salted-md5 rank — a balanced,
    // run-reproducible, engine-reproducible held-out set (no RNG state,
    // the hash IS the randomness; the convention of every corpus split
    // that must survive re-runs and backfills). One stratum-keyed window,
    // no shuffle beyond it; scale axis = corpus rows.
    "q_sample_eval" -> ((s, dir) => {
      val w = Window.partitionBy("lang")
        .orderBy(md5(concat(col("doc_id").cast("string"), lit(":evalsplit"))), col("doc_id"))
      docs(s, dir)
        .withColumn("docs_in", count(lit(1)).over(Window.partitionBy("lang")))
        .withColumn("samp_rk", row_number().over(w))
        .where(col("samp_rk") <= 25)
        .select(col("doc_id"), col("source"), col("lang"), col("samp_rk"), col("docs_in"))
    }),

    // ── Nearest-centroid (Rocchio) label classification with exact
    // leave-one-out: per label, the elementwise embedding SUM + count is
    // the only model state (k×dim values — broadcastable at any corpus
    // size, unlike kNN's full-corpus scan per probe: THE scale path for
    // embedding-quality probes); each probe scores against
    // (sum − own·x)/(n − own), so its own vector never inflates its class
    // centroid. One dim-explode aggregation + a broadcast of k rows. ──
    // ── Simplified (centroid) silhouette per label: a = cosine distance
    // to the OWN leave-one-out centroid (the q_embed_outliers
    // convention), b = min distance to any other label's centroid,
    // s = (b−a)/max(a,b) — the clustering-quality report card next to
    // q_kmeans/q_embed_clusters, at O(n·k) instead of silhouette's
    // O(n²). Same k×dim sum vectors, one broadcast, one vec-keyed
    // aggregate. ──
    "q_silhouette" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim").agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .groupBy("label").agg(array_sort(collect_list(struct(col("dim"), col("sx")))).as("cs"),
          first("n").as("n"))
        .select(col("label").as("c_label"), expr("transform(cs, s -> s.sx)").as("sumvec"), col("n"))
      val scored = e.select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("pv"))
        .crossJoin(broadcast(cents))
        .withColumn("own", when(col("c_label") === col("label"), 1.0).otherwise(0.0))
        .withColumn("cent", zip_with(col("sumvec"), col("pv"),
          (sx, x) => (sx - col("own") * x) / (col("n") - col("own"))))
        .withColumn("dot", aggregate(zip_with(col("pv"), col("cent"), _ * _), lit(0.0), _ + _))
        .withColumn("na", sqrt(aggregate(transform(col("pv"), x => x * x), lit(0.0), _ + _)))
        .withColumn("nb", sqrt(aggregate(transform(col("cent"), x => x * x), lit(0.0), _ + _)))
        .withColumn("dist", lit(1.0) - col("dot") / (col("na") * col("nb")))
      val ab = scored.groupBy("vec_id", "label").agg(
        max(when(col("own") === 1.0, col("dist"))).as("a"),
        min(when(col("own") === 0.0, col("dist"))).as("b"))
        .withColumn("sil", (col("b") - col("a")) / greatest(col("a"), col("b")))
      ab.groupBy("label").agg(
        count(lit(1)).as("n_vecs"),
        round(avg("a"), 6).as("mean_own_dist"),
        round(avg("b"), 6).as("mean_other_dist"),
        round(avg("sil"), 6).as("mean_silhouette"),
        sum(when(col("sil") < 0, 1L).otherwise(0L)).as("n_misplaced"))
    }),

    "q_centroid_classify" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim").agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .groupBy("label").agg(array_sort(collect_list(struct(col("dim"), col("sx")))).as("cs"),
          first("n").as("n"))
        .select(col("label").as("c_label"), expr("transform(cs, s -> s.sx)").as("sumvec"), col("n"))
      val probes = graft.ann.Ann.probeSample(e)
        .select(col("vec_id").as("probe_id"), col("label").as("true_label"),
          expr("transform(embedding, x -> cast(x as double))").as("pv"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("c_label").asc)
      probes.crossJoin(broadcast(cents))
        .withColumn("own", when(col("c_label") === col("true_label"), 1.0).otherwise(0.0))
        .withColumn("cent", zip_with(col("sumvec"), col("pv"),
          (sx, x) => (sx - col("own") * x) / (col("n") - col("own"))))
        .withColumn("dot", aggregate(zip_with(col("pv"), col("cent"), _ * _), lit(0.0), _ + _))
        .withColumn("na", sqrt(aggregate(transform(col("pv"), x => x * x), lit(0.0), _ + _)))
        .withColumn("nb", sqrt(aggregate(transform(col("cent"), x => x * x), lit(0.0), _ + _)))
        .withColumn("cos", col("dot") / (col("na") * col("nb")))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("probe_id"), col("true_label"), col("c_label").as("pred_label"),
          round(col("cos"), 6).as("cos"),
          when(col("true_label") === col("c_label"), 1).otherwise(0).as("correct"))
    }),

    // ── Embedding-space data cleaning: per vector, cosine distance to its
    // own label's leave-one-out centroid; vectors beyond mean + 2σ of
    // their label's distance distribution are flagged (the
    // mislabeled/noise sweep run before contrastive training). Same k×dim
    // sums as q_centroid_classify, joined BY LABEL (broadcast, k rows) —
    // map-side math, one label-keyed stats aggregation, no sort. ──
    "q_embed_outliers" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim").agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .groupBy("label").agg(array_sort(collect_list(struct(col("dim"), col("sx")))).as("cs"),
          first("n").as("n"))
        .select(col("label"), expr("transform(cs, s -> s.sx)").as("sumvec"), col("n"))
      val scored = e.select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("pv"))
        .join(broadcast(cents), "label")
        .withColumn("cent", zip_with(col("sumvec"), col("pv"), (sx, x) => (sx - x) / (col("n") - 1)))
        .withColumn("dot", aggregate(zip_with(col("pv"), col("cent"), _ * _), lit(0.0), _ + _))
        .withColumn("na", sqrt(aggregate(transform(col("pv"), x => x * x), lit(0.0), _ + _)))
        .withColumn("nb", sqrt(aggregate(transform(col("cent"), x => x * x), lit(0.0), _ + _)))
        .withColumn("dist", lit(1.0) - col("dot") / (col("na") * col("nb")))
      val stats = scored.groupBy("label")
        .agg(avg("dist").as("mu_d"), stddev_samp("dist").as("sd_d"))
      scored.join(broadcast(stats), "label")
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"),
          (col("dist") > col("mu_d") + lit(2.0) * col("sd_d")).cast("int").as("is_outlier"))
    }),

    // ── kNN label classification: exact 5-NN majority vote (vote-count
    // desc, label asc — an integer decision) on the fixed md5-rank probe sample.
    // Composes the proven broadcast-probe kNN kernel: the corpus never
    // shuffles, votes aggregate 5 rows per probe. ──
    "q_knn_classify" -> ((s, dir) => {
      val e = embs(s, dir)
      val probes = graft.ann.Ann.probeSample(e)
      val nn = graft.ann.Ann.knnBruteForce(e, probes, k = 5).select("probe_id", "neighbor_id")
      val votes = nn
        .join(e.select(col("vec_id").as("neighbor_id"), col("label").as("pred_label")), "neighbor_id")
        .groupBy("probe_id", "pred_label").agg(count(lit(1)).as("n_votes"))
      val w = Window.partitionBy("probe_id").orderBy(col("n_votes").desc, col("pred_label").asc)
      votes.withColumn("rk", row_number().over(w)).where(col("rk") === 1).drop("rk")
        .join(probes.select(col("vec_id").as("probe_id"), col("label").as("true_label")), "probe_id")
        .select(col("probe_id"), col("true_label"), col("pred_label"), col("n_votes"),
          when(col("true_label") === col("pred_label"), 1).otherwise(0).as("correct"))
    }),

    // ── Trained quality classifier (the DCLM / fastText-filter shape):
    // logistic regression of "is this an English doc" on the quality
    // signals (alpha ratio, mean token length, stopword ratio, capped
    // token count), fit by THREE unrolled IRLS iterations. Each
    // iteration is one distributed moment pass (the 5×6 weighted normal
    // equations, every entry 6-dp-snapped so sum order can't leak into
    // the solve) + the shared no-pivot Gauss-Jordan kernel — the oracle
    // replays all three iterations with the identical float sequence.
    // The learned model is FIVE doubles: the selection scorer a
    // pretraining pipeline broadcasts to every ingest worker. ──
    "q_quality_logreg" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .agg(round(first(col("b1")), 6).as("b0"), round(first(col("b2")), 6).as("b_alpha"),
          round(first(col("b3")), 6).as("b_mtl"), round(first(col("b4")), 6).as("b_stop"),
          round(first(col("b5")), 6).as("b_tok"),
          sum("y").cast("long").as("n_pos"),
          (count(lit(1)) - sum("y")).cast("long").as("n_neg"),
          round(avg(when((col("eta") > 0) === (col("y") === 1), 1.0).otherwise(0.0)), 6).as("train_acc"))
    }),

    // ── The serving half of q_quality_logreg: every doc scored with the
    // trained five-double model, rolled up to the per-source quality
    // profile a mixture planner reads (mean selection score, share
    // above the 0.5 keep line — decided as eta > 0, an exact-float
    // identity both engines share). Train + serve in one plan; at scale
    // the five doubles broadcast and scoring is map-side. ──
    "q_quality_score_serve" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("score", expr("1.0E0 / (1.0E0 + exp(-eta))"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("score"), 6).as("mean_score"),
          sum(when(col("eta") > 0, 1L).otherwise(0L)).as("n_keep"),
          round(avg(when(col("eta") > 0, 1.0).otherwise(0.0)), 6).as("keep_share"))
    }),

    // ── Calibration audit of the trained quality classifier: fixed-width
    // probability bins (the standard ECE binning — map-side, NO global
    // sort), per bin the 4-dp-snapped mean predicted probability vs the
    // exact observed positive rate, and the Expected Calibration Error
    // as a 1e6-scaled integer reduction over the ≤10-row bin frame. The
    // ML-monitoring step between q_quality_logreg (fit) and
    // q_quality_score_serve (deploy): a confident-but-wrong scorer
    // passes accuracy checks and fails THIS one. ──
    "q_calibration" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val scored = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("p", expr("1.0E0 / (1.0E0 + exp(-eta))"))
        .withColumn("bin", least(floor(col("p") * 10), lit(9.0)).cast("int"))
      val bins = scored.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum("y").cast("long").as("n_pos"),
        (round(sum("p"), 4) / count(lit(1))).as("mean_pred"))
        .withColumn("obs_rate", col("n_pos").cast("double") / col("n").cast("double"))
        .withColumn("gap", abs(col("obs_rate") - col("mean_pred")))
      val wAll = Window.partitionBy(substring(col("bin").cast("string"), 1, 0))
      bins
        .withColumn("nn", sum("n").over(wAll))
        .withColumn("ece6", sum(round(col("n") * col("gap") * 1e6).cast("long")).over(wAll))
        .select(col("bin"), col("n").as("n_docs"), col("n_pos"),
          round(col("mean_pred"), 6).as("mean_pred"),
          round(col("obs_rate"), 6).as("obs_rate"),
          round(col("gap"), 6).as("gap"),
          round(col("ece6").cast("double") / (col("nn").cast("double") * 1e6), 6).as("ece"))
    }),

    // ── Wilson 95% score intervals on the per-source keep rate (the
    // eta > 0 selection rule): the binomial-monitoring guardrail that
    // stays honest at small n where the Wald interval collapses. A
    // source whose interval excludes the corpus-wide keep rate is
    // flagged as diverging — the statistical version of "this source's
    // filter behavior changed". All inputs are exact integer ratios;
    // z² enters as the shared 1.96E0 * 1.96E0 product. ──
    "q_wilson_keep" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val per = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .groupBy("source").agg(
          count(lit(1)).as("n"),
          sum(when(col("eta") > 0, 1L).otherwise(0L)).as("k"))
      val tot = per.agg(sum("n").as("tn"), sum("k").as("tk"))
      per.crossJoin(broadcast(tot))
        .withColumn("zz", expr("1.96E0 * 1.96E0"))
        .withColumn("phat", col("k").cast("double") / col("n").cast("double"))
        .withColumn("ctr", expr("(phat + zz / (2.0E0 * n)) / (1.0E0 + zz / n)"))
        .withColumn("hw", expr(
          "1.96E0 * sqrt(phat * (1.0E0 - phat) / n + zz / (4.0E0 * n * n)) / (1.0E0 + zz / n)"))
        .withColumn("pr", col("tk").cast("double") / col("tn").cast("double"))
        .select(col("source"), col("n").as("n_docs"), col("k").as("n_keep"),
          round(col("phat"), 6).as("keep_rate"),
          round(greatest(col("ctr") - col("hw"), lit(0.0)), 6).as("ci_lo"),
          round(least(col("ctr") + col("hw"), lit(1.0)), 6).as("ci_hi"),
          when(col("pr") < col("ctr") - col("hw") || col("pr") > col("ctr") + col("hw"), 1)
            .otherwise(0).as("diverges"))
    }),

    // ── ROC analysis of the trained quality classifier: EXACT AUC over
    // the 1e-6-quantized score domain (value-domain counting — the rank
    // machinery runs on the ≤#distinct-scores frame, never a global doc
    // sort) via the Mann-Whitney identity U = Σ_v c1(v)·(2·cum0(<v) +
    // c0(v)), all BIGINTs; plus the Youden-J optimal operating threshold
    // (max TPR − FPR over the same domain, tie → smallest threshold).
    // Completes the classifier-eval battery: q_calibration (is p
    // honest), q_cartography (which docs), THIS (how separable + where
    // to cut). ──
    "q_roc_auc" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val dom = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("p6", expr("CAST(round(1.0E0 / (1.0E0 + exp(-eta)) * 1e6) AS BIGINT)"))
        .groupBy("p6").agg(
          sum("y").cast("long").as("c1"),
          (count(lit(1)) - sum("y")).cast("long").as("c0"))
      val w = Window.partitionBy(substring(col("p6").cast("string"), 1, 0)).orderBy("p6")
      val wAll = Window.partitionBy(substring(col("p6").cast("string"), 1, 0))
      val cum = dom
        .withColumn("cum0lt", coalesce(sum("c0").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("cum1ge", sum("c1").over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("cum0ge", sum("c0").over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("n1", sum("c1").over(wAll))
        .withColumn("n0", sum("c0").over(wAll))
        .withColumn("u2term", col("c1") * (col("cum0lt") * 2 + col("c0")))
      val wJ = Window.partitionBy(substring(col("p6").cast("string"), 1, 0))
        .orderBy((col("cum1ge") * col("n0") - col("cum0ge") * col("n1")).desc, col("p6"))
      cum
        .withColumn("u2", sum("u2term").over(wAll))
        .withColumn("jrk", row_number().over(wJ))
        .where(col("jrk") === 1)
        .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
          round(col("u2").cast("double") / (lit(2.0) * col("n1").cast("double") * col("n0").cast("double")), 6).as("auc"),
          round(col("p6").cast("double") / 1e6, 6).as("best_threshold"),
          round(col("cum1ge").cast("double") / col("n1").cast("double"), 6).as("tpr"),
          round(col("cum0ge").cast("double") / col("n0").cast("double"), 6).as("fpr"),
          round(col("cum1ge").cast("double") / col("n1").cast("double") -
            col("cum0ge").cast("double") / col("n0").cast("double"), 6).as("youden_j"))
    }),

    // ── Per-feature PSI drift of the classifier INPUTS between the
    // first- and second-half corpora (by doc_id): a drifting feature
    // with a stable score means compensating shifts — the input-side
    // monitor that explains WHAT moved when q_calibration says the
    // score did. Fixed-width bins (clamped, map-side), +0.5 Laplace
    // smoothing, industry 0.2 rule; exact integer counts. ──
    "q_feature_drift" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val mid = feats.agg(expr("max(doc_id) DIV 2").as("mid"))
      val base = feats.crossJoin(broadcast(mid))
        .withColumn("half", when(col("doc_id") <= col("mid"), 1).otherwise(2))
      val fcols = Seq("x1", "x2", "x3", "x4")
      val binned = fcols.map { f =>
        base.select(lit(f).as("feature"), col("half"),
          least(floor(col(f) * 10), lit(9.0)).cast("int").as("bin"))
      }.reduce(_ unionAll _)
      val cells = binned.groupBy("feature", "bin").agg(
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("half") === 2, 1L).otherwise(0L)).as("c2"))
      val wf = Window.partitionBy("feature")
      cells
        .withColumn("n1", sum("c1").over(wf))
        .withColumn("n2", sum("c2").over(wf))
        .withColumn("nb", count(lit(1)).over(wf))
        .withColumn("p", expr("(c1 + 0.5E0) / (n1 + 0.5E0 * nb)"))
        .withColumn("q", expr("(c2 + 0.5E0) / (n2 + 0.5E0 * nb)"))
        .withColumn("term", expr("(p - q) * ln(p / q)"))
        .groupBy("feature").agg(
          first("n1").as("n_first"), first("n2").as("n_second"),
          round(sum("term"), 6).as("psi"))
        .withColumn("drifted", when(col("psi") > 0.2, 1).otherwise(0))
    }),

    // ── Intraclass correlation ICC(1) of the quality score by source:
    // how much of score variance is BETWEEN sources — high ICC means
    // filter at the source level (cheap), low ICC means per-doc scoring
    // is unavoidable. One-way ANOVA machinery on the scored scan with
    // the q_anova scaled-BIGINT reduction; k̄ = (N − Σnᵢ²/N)/(g−1) for
    // unbalanced groups (Fisher). ──
    "q_icc_source" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val sc = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("p", expr("1.0E0 / (1.0E0 + exp(-eta))"))
      val grp = sc.groupBy("source").agg(
        count(lit(1)).as("m"),
        round(sum("p"), 4).as("sv"),
        round(sum(col("p") * col("p")), 2).as("svv"))
        .withColumn("ssw_s", round(((col("svv") - col("sv") * col("sv") / col("m")) * lit(1e6))).cast("long"))
        .withColumn("ssb_term_s", round((col("sv") * col("sv") / col("m") * lit(1e6))).cast("long"))
        .withColumn("sv_s", round(col("sv") * lit(1e6)).cast("long"))
        .withColumn("mm_s", col("m") * col("m"))
      grp.groupBy().agg(
        count(lit(1)).as("g"), sum("m").as("n"),
        sum("ssw_s").as("ssw_s"), sum("ssb_term_s").as("ssb_s"),
        sum("sv_s").as("gs_s"), sum("mm_s").as("smm"))
        .withColumn("ssw", col("ssw_s").cast("double") / lit(1e6))
        .withColumn("ssb",
          col("ssb_s").cast("double") / lit(1e6) -
            (col("gs_s").cast("double") / lit(1e6)) * (col("gs_s").cast("double") / lit(1e6)) / col("n").cast("double"))
        .withColumn("msb", expr("ssb / (g - 1)"))
        .withColumn("msw", expr("ssw / (n - g)"))
        .withColumn("kbar", expr("(n - CAST(smm AS DOUBLE) / n) / (g - 1)"))
        .withColumn("icc", expr("(msb - msw) / (msb + (kbar - 1.0E0) * msw)"))
        .select(col("g").as("n_sources"), col("n").as("n_docs"),
          round(col("msb"), 6).as("ms_between"), round(col("msw"), 6).as("ms_within"),
          round(col("kbar"), 6).as("k_bar"), round(col("icc"), 6).as("icc"),
          when(col("icc") > 0.5, 1).otherwise(0).as("source_filterable"))
    }),

    // ── Empirical-Bayes (beta-binomial method-of-moments) shrinkage of
    // the per-source keep rates: small sources' raw rates are noise —
    // each shrinks toward the corpus rate with weight n/(n+M), prior
    // strength M from the MoM fit to the observed between-source spread
    // (Morris 1983 machinery in its simplest form; declared). The rate
    // table a mixture planner should actually read instead of
    // q_wilson_keep's raw point estimates. ──
    "q_eb_shrinkage" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val per = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .groupBy("source").agg(
          count(lit(1)).as("n"),
          sum(when(col("eta") > 0, 1L).otherwise(0L)).as("k"))
        .withColumn("phat", col("k").cast("double") / col("n").cast("double"))
      val zk = substring(col("source"), 1, 0)
      val wAll = Window.partitionBy(zk)
      per
        .withColumn("g", count(lit(1)).over(wAll))
        .withColumn("tk", sum("k").over(wAll))
        .withColumn("tn", sum("n").over(wAll))
        .withColumn("pbar", col("tk").cast("double") / col("tn").cast("double"))
        .withColumn("s2d6",
          sum(expr("CAST(round((phat - tk / CAST(tn AS DOUBLE)) * (phat - tk / CAST(tn AS DOUBLE)) * 1e6) AS BIGINT)"))
            .over(wAll))
        .withColumn("hmean",
          sum(expr("CAST(round(1e6 / n) AS BIGINT)")).over(wAll))
        .withColumn("s2", expr("(s2d6 / 1e6) / (g - 1)"))
        .withColumn("nbar_inv", expr("(hmean / 1e6) / g"))
        .withColumn("tau2", expr("greatest(s2 - pbar * (1.0E0 - pbar) * nbar_inv, 1e-6)"))
        .withColumn("mm", expr("pbar * (1.0E0 - pbar) / tau2"))
        .withColumn("wgt", expr("n / (n + mm)"))
        .select(col("source"), col("n").as("n_docs"), col("k").as("n_keep"),
          round(col("phat"), 6).as("raw_rate"),
          round(expr("wgt * phat + (1.0E0 - wgt) * pbar"), 6).as("shrunk_rate"),
          round(col("wgt"), 6).as("shrink_weight"),
          round(col("mm"), 6).as("prior_strength"))
    }),

    // ── Active-learning batch selection: the 20 docs the quality
    // classifier is LEAST sure about (smallest |eta|), with a
    // 2-per-source diversity cap (window rank inside the uncertainty
    // order) — the labeling batch that moves the decision boundary most
    // per annotation dollar. Deterministic ties by doc_id; two window
    // passes over the scored scan. ──
    "q_uncertainty_sample" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val scored = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("unc", abs(col("eta")))
      val wSrc = Window.partitionBy("source").orderBy(col("unc"), col("doc_id"))
      val zd = substring(col("source"), 1, 0)
      val wAll = Window.partitionBy(zd).orderBy(col("unc"), col("doc_id"))
      scored
        .withColumn("src_rk", row_number().over(wSrc))
        .where(col("src_rk") <= 2)
        .withColumn("rk", row_number().over(wAll))
        .where(col("rk") <= 20)
        .select(col("rk").as("pick_rank"), col("doc_id"), col("source"),
          col("y").as("current_label"), round(col("eta"), 6).as("eta"),
          round(expr("1.0E0 / (1.0E0 + exp(-eta))"), 6).as("score"))
    }),

    // ── Exact logit-scale Shapley attribution of the quality classifier
    // (for a linear logit, the Shapley value of feature i is EXACTLY
    // β_i·(x_i − x̄_i) — no sampling): per source, the mean |contribution|
    // and mean signed contribution of each feature — WHICH signal drives
    // keep/drop decisions where, the interpretability report next to
    // q_roc_auc's aggregate quality. Feature means snapped; contributions
    // reduce as 1e6-scaled BIGINTs. ──
    "q_shap_logit" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val means = feats.agg(
        count(lit(1)).as("nn"),
        round(sum("x1"), 4).as("m1s"), round(sum("x2"), 4).as("m2s"),
        round(sum("x3"), 4).as("m3s"), round(sum("x4"), 4).as("m4s"))
      val contrib = feats.crossJoin(broadcast(beta)).crossJoin(broadcast(means))
      val feats4 = Seq("x1" -> "b2", "x2" -> "b3", "x3" -> "b4", "x4" -> "b5")
        .zipWithIndex.map { case ((x, b), i) =>
          val m = s"m${i + 1}s / nn"
          contrib
            .withColumn("phi", expr(s"$b * ($x - $m)"))
            .groupBy("source").agg(
              count(lit(1)).as("n_docs"),
              sum(expr("CAST(round(abs(phi) * 1e6) AS BIGINT)")).as("sa6"),
              sum(expr("CAST(round(phi * 1e6) AS BIGINT)")).as("ss6"))
            .select(col("source"), lit(x).as("feature"), col("n_docs"),
              round(col("sa6").cast("double") / (col("n_docs").cast("double") * 1e6), 6)
                .as("mean_abs_shap"),
              round(col("ss6").cast("double") / (col("n_docs").cast("double") * 1e6), 6)
                .as("mean_shap"))
        }
      feats4.reduce(_ unionAll _)
    }),

    // ── Cumulative gains of the quality classifier: what share of the
    // positives does the top-k% by score capture, k ∈ {5,10,20,50}? The
    // deployment-facing cousin of q_roc_auc — "skim the top decile" is a
    // budget decision, and this is its exact yield. Cut thresholds come
    // from exact integer-rank order statistics over the 1e-6-quantized
    // score domain (value-domain counting — never a global doc sort). ──
    "q_gains" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      val beta = logregBeta(s, feats)
      val dom = feats.crossJoin(broadcast(beta))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("p6", expr("CAST(round(1.0E0 / (1.0E0 + exp(-eta)) * 1e6) AS BIGINT)"))
        .groupBy("p6").agg(
          count(lit(1)).as("c"), sum("y").cast("long").as("c1"))
      val zd = substring(col("p6").cast("string"), 1, 0)
      val w = Window.partitionBy(zd).orderBy(col("p6").desc)
      val wAll = Window.partitionBy(zd)
      val cum = dom
        .withColumn("cumc", sum("c").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum1", sum("c1").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nn", sum("c").over(wAll))
        .withColumn("n1", sum("c1").over(wAll))
      import s.implicits._
      val ks = Seq(5, 10, 20, 50).toDF("kpct")
      // first domain row whose cumulative count reaches k% of the corpus
      cum.crossJoin(broadcast(ks))
        .where(col("cumc") * 100 >= col("nn") * col("kpct"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("kpct").orderBy(col("p6").desc)))
        .where(col("rk") === 1)
        .select(col("kpct"), col("cumc").as("n_top"),
          col("cum1").as("pos_top"), col("n1").as("n_pos"),
          round(col("p6").cast("double") / 1e6, 6).as("score_cut"),
          round(col("cum1").cast("double") / col("n1").cast("double"), 6).as("capture"),
          round((col("cum1").cast("double") / col("n1").cast("double")) /
            (col("cumc").cast("double") / col("nn").cast("double")), 6).as("lift"))
    }),

    // ── Dataset cartography (Swayamdipta et al. 2020): per-doc mean
    // true-class confidence and variability across the THREE IRLS
    // training checkpoints → easy-to-learn / hard-to-learn / ambiguous
    // regions, rolled up per source. Hard docs are label-noise
    // candidates, ambiguous docs the curriculum frontier — the
    // training-dynamics view the single final model can't give. The
    // three checkpoint models are 3×5 broadcast doubles; the scan is
    // map-side. ──
    "q_cartography" -> ((s, dir) => {
      val feats = logregFeats(s, dir)
      var scored = feats
      logregBetas(s, feats).zipWithIndex.foreach { case (bdf, i) =>
        scored = scored.crossJoin(broadcast(bdf))
          .withColumn(s"p${i + 1}", expr(s"1.0E0 / (1.0E0 + exp(-($EtaExpr)))"))
          .drop("b1", "b2", "b3", "b4", "b5")
      }
      val pt = scored
        .withColumn("t1", expr("CASE WHEN y = 1 THEN p1 ELSE 1.0E0 - p1 END"))
        .withColumn("t2", expr("CASE WHEN y = 1 THEN p2 ELSE 1.0E0 - p2 END"))
        .withColumn("t3", expr("CASE WHEN y = 1 THEN p3 ELSE 1.0E0 - p3 END"))
        .withColumn("conf", expr("(t1 + t2 + t3) / 3.0E0"))
        .withColumn("stdv", expr(
          "sqrt(((t1 - conf) * (t1 - conf) + (t2 - conf) * (t2 - conf) + (t3 - conf) * (t3 - conf)) / 3.0E0)"))
        .withColumn("bucket", expr(
          "CASE WHEN conf >= 0.7E0 AND stdv < 0.1E0 THEN 'easy' " +
            "WHEN conf < 0.3E0 THEN 'hard' ELSE 'ambiguous' END"))
      pt.groupBy("source", "bucket").agg(
        count(lit(1)).as("n_docs"),
        round(round(sum("conf"), 4) / count(lit(1)), 6).as("mean_conf"),
        round(round(sum("stdv"), 4) / count(lit(1)), 6).as("mean_std"))
    })
  )

  /** The q_quality_logreg feature relation (materialized — the IRLS
    * iterations and the scoring pass all reread it). */
  private[queries] def logregFeats(s: SparkSession, dir: String): DataFrame =
    Scratch.materialize(docs(s, dir).select(
      col("doc_id"),
      col("source"),
      (col("lang") === "en").cast("int").as("y"),
      TextFunctions.alphaRatio(col("text")).as("x1"),
      (TextFunctions.meanTokenLen(col("text")) / lit(10.0)).as("x2"),
      TextFunctions.stopwordRatio(col("text"), EnStop).as("x3"),
      least(TextFunctions.nTokens(col("text")).cast("double") / 100, lit(1.0)).as("x4")),
      "logreg_feats")

  /** Three unrolled IRLS iterations from β=0: each one distributed
    * 6-dp-snapped moment pass + the shared no-pivot Gauss-Jordan solve;
    * the solved model (5 doubles) is pinned locally between iterations
    * so iteration k's plan never replays iteration k−1. */
  private[queries] def logregBeta(s: SparkSession, feats: DataFrame): DataFrame =
    logregBetas(s, feats).last

  /** All three IRLS checkpoints (β after iterations 1, 2, 3) — the
    * training dynamics q_cartography reads. */
  private def logregBetas(s: SparkSession, feats: DataFrame): Seq[DataFrame] = {
    import s.implicits._
    def iterate(betaDf: DataFrame): DataFrame = {
      val scored = feats.crossJoin(broadcast(betaDf))
        .withColumn("eta", expr(EtaExpr))
        .withColumn("p", expr("1.0E0 / (1.0E0 + exp(-eta))"))
        .withColumn("w", expr("greatest(p * (1.0E0 - p), 1e-6)"))
        .withColumn("z", expr("eta + (CAST(y AS DOUBLE) - p) / w"))
      val mats = scored.agg(expr(s"array(${IrlsMoments.mkString(", ")})").as("_m"))
      val r = graft.models.GaussJordan.eliminate(mats, "_m", 5, 6)
        .select((1 to 5).map(k => expr(s"_m[${(k - 1) * 6 + 5}]").as(s"b$k")): _*)
        .head()
      Seq((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toDF("b1", "b2", "b3", "b4", "b5")
    }
    val beta0 = Seq((0.0, 0.0, 0.0, 0.0, 0.0)).toDF("b1", "b2", "b3", "b4", "b5")
    val b1 = iterate(beta0)
    val b2 = iterate(b1)
    val b3 = iterate(b2)
    Seq(b1, b2, b3)
  }

  /** Stopword list shared with the quality operators (LlmQueries.EnStop). */
  private[queries] val EnStop = Seq("the", "a", "and", "of", "to", "is", "in", "it")

  /** IRLS fragments shared verbatim by the Spark plan and the oracle:
    * the linear predictor over (1, x1..x4) and the row-major 5×6
    * weighted-normal-equation entries, each 6-dp-snapped. */
  private[queries] val EtaExpr = "b1 + b2 * x1 + b3 * x2 + b4 * x3 + b5 * x4"
  private val IrlsXs = Seq("1.0E0", "x1", "x2", "x3", "x4")
  private val IrlsMoments: Seq[String] =
    for { i <- 0 until 5; j <- 0 to 5 } yield {
      val t = if (j == 5) "z" else IrlsXs(j)
      s"round(sum(w * ${IrlsXs(i)} * $t), 6)"
    }

  val sql: Map[String, String] = Map(
    "q_dsir_weights" ->
      s"""WITH cdb AS (SELECT doc_id, bucket, count(*)::BIGINT AS c_db,
         |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c_db_t
         |             FROM (SELECT doc_id, lang,
         |                     ('0x' || substr(md5(term), 1, 15))::BIGINT % $DsirB AS bucket
         |                   FROM (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
         |                         FROM documents)
         |                   WHERE regexp_matches(term, '$WordRe'))
         |             GROUP BY 1, 2),
         |bk AS (SELECT bucket, sum(c_db)::BIGINT AS c_r, sum(c_db_t)::BIGINT AS c_t
         |       FROM cdb GROUP BY 1),
         |tots AS (SELECT sum(c_r)::BIGINT AS n_r, sum(c_t)::BIGINT AS n_t FROM bk),
         |lam AS (SELECT bucket,
         |          ln((c_t + 1.0) / (n_t + $DsirB)) - ln((c_r + 1.0) / (n_r + $DsirB)) AS lam
         |        FROM bk CROSS JOIN tots),
         |pd AS (SELECT doc_id, sum(c_db)::BIGINT AS n_tokens,
         |         round(sum(c_db * lam), 6) AS logw
         |       FROM cdb JOIN lam USING (bucket) GROUP BY 1)
         |SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_target,
         |  coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
         |  coalesce(pd.logw, 0.0) AS logw,
         |  CASE WHEN coalesce(pd.logw, 0.0) > 0 THEN 1 ELSE 0 END AS keep
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q_source_kl" ->
      s"""WITH toks AS (SELECT source, term
         |              FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS term
         |                    FROM documents)
         |              WHERE regexp_matches(term, '$WordRe')),
         |st AS (SELECT source, term, count(*)::BIGINT AS c_st FROM toks GROUP BY 1, 2),
         |gt AS (SELECT term, sum(c_st)::BIGINT AS c_t FROM st GROUP BY 1),
         |tot AS (SELECT sum(c_t)::BIGINT AS n, count(*)::BIGINT AS v FROM gt),
         |qt AS (SELECT term, (c_t + 1.0) / (n + v) AS q_t FROM gt CROSS JOIN tot),
         |lq AS (SELECT sum(ln(q_t)) AS lq_all FROM qt),
         |ns AS (SELECT source, sum(c_st)::BIGINT AS n_s, count(*)::BIGINT AS v_s FROM st GROUP BY 1),
         |per AS (SELECT st.source,
         |          sum(((st.c_st + 1.0) / (ns.n_s + tot.v))
         |              * (ln((st.c_st + 1.0) / (ns.n_s + tot.v)) - ln(qt.q_t))) AS part1,
         |          sum(ln(qt.q_t)) AS lq_s
         |        FROM st JOIN qt USING (term) JOIN ns USING (source) CROSS JOIN tot
         |        GROUP BY 1)
         |SELECT per.source, ns.n_s AS n_tokens, ns.v_s AS n_terms,
         |  round(per.part1 + (1.0 / (ns.n_s + tot.v))
         |        * ((tot.v - ns.v_s) * ln(1.0 / (ns.n_s + tot.v)) - (lq.lq_all - per.lq_s)), 6) AS kl
         |FROM per JOIN ns USING (source) CROSS JOIN tot CROSS JOIN lq""".stripMargin,

    "q_shard_plan" ->
      """WITH d AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS toks FROM documents),
        |c AS (SELECT *, sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT source, ((cum - toks) // 2000)::BIGINT AS shard_id, count(*) AS n_docs,
        |  sum(toks)::BIGINT AS tokens, min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q_sample_eval" ->
      """SELECT doc_id, source, lang, samp_rk::INT AS samp_rk, docs_in
        |FROM (SELECT doc_id, source, lang,
        |        count(*) OVER (PARTITION BY lang) AS docs_in,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY md5(doc_id::VARCHAR || ':evalsplit'), doc_id) AS samp_rk
        |      FROM documents)
        |WHERE samp_rk <= 25""".stripMargin,

    "q_embed_outliers" ->
      """WITH sums AS (
        |  SELECT label, dim, sum(x) AS sx, count(*) AS n FROM (
        |    SELECT label, generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding)::DOUBLE AS x
        |    FROM embeddings) GROUP BY 1, 2),
        |cents AS (SELECT label, list(sx ORDER BY dim) AS sumvec, max(n) AS n FROM sums GROUP BY 1),
        |sc AS (SELECT e.vec_id, e.label, e.embedding::DOUBLE[] AS pv, c.sumvec, c.n
        |       FROM embeddings e JOIN cents c ON e.label = c.label),
        |sc2 AS (SELECT vec_id, label, pv,
        |          list_transform(list_zip(sumvec, pv), p -> (p[1] - p[2]) / (n - 1)) AS cent
        |        FROM sc),
        |sc3 AS (SELECT vec_id, label,
        |          1.0 - list_sum(list_transform(list_zip(pv, cent), p -> p[1] * p[2]))
        |            / (sqrt(list_sum(list_transform(pv, x -> x * x)))
        |               * sqrt(list_sum(list_transform(cent, x -> x * x)))) AS dist
        |        FROM sc2),
        |st AS (SELECT label, avg(dist) AS mu_d, stddev_samp(dist) AS sd_d FROM sc3 GROUP BY 1)
        |SELECT s.vec_id, s.label, round(s.dist, 6) AS dist,
        |  CASE WHEN s.dist > st.mu_d + 2.0 * st.sd_d THEN 1 ELSE 0 END AS is_outlier
        |FROM sc3 s JOIN st ON s.label = st.label""".stripMargin,

    "q_silhouette" ->
      """WITH sums AS (
        |  SELECT label, dim, sum(x) AS sx, count(*) AS n FROM (
        |    SELECT label, generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding)::DOUBLE AS x
        |    FROM embeddings) GROUP BY 1, 2),
        |cents AS (SELECT label AS c_label, list(sx ORDER BY dim) AS sumvec, max(n) AS n FROM sums GROUP BY 1),
        |sc AS (SELECT e.vec_id, e.label, c.c_label, c.sumvec, c.n,
        |         e.embedding::DOUBLE[] AS pv,
        |         CASE WHEN c.c_label = e.label THEN 1.0 ELSE 0.0 END AS own
        |       FROM embeddings e CROSS JOIN cents c),
        |sc2 AS (SELECT vec_id, label, own,
        |          list_transform(list_zip(sumvec, pv), p -> (p[1] - own * p[2]) / (n - own)) AS cent,
        |          pv
        |        FROM sc),
        |sc3 AS (SELECT vec_id, label, own,
        |          list_sum(list_transform(list_zip(pv, cent), p -> p[1] * p[2])) AS dot,
        |          sqrt(list_sum(list_transform(pv, x -> x * x))) AS na,
        |          sqrt(list_sum(list_transform(cent, x -> x * x))) AS nb
        |        FROM sc2),
        |dist AS (SELECT vec_id, label, own, 1.0 - dot / (na * nb) AS dist FROM sc3),
        |ab AS (SELECT vec_id, label,
        |         max(CASE WHEN own = 1.0 THEN dist END) AS a,
        |         min(CASE WHEN own = 0.0 THEN dist END) AS b
        |       FROM dist GROUP BY 1, 2),
        |sil AS (SELECT *, (b - a) / greatest(a, b) AS sil FROM ab)
        |SELECT label, count(*)::BIGINT AS n_vecs,
        |  round(avg(a), 6) AS mean_own_dist,
        |  round(avg(b), 6) AS mean_other_dist,
        |  round(avg(sil), 6) AS mean_silhouette,
        |  sum(CASE WHEN sil < 0 THEN 1 ELSE 0 END)::BIGINT AS n_misplaced
        |FROM sil GROUP BY 1""".stripMargin,

    "q_centroid_classify" ->
      s"""WITH sums AS (
        |  SELECT label, dim, sum(x) AS sx, count(*) AS n FROM (
        |    SELECT label, generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding)::DOUBLE AS x
        |    FROM embeddings) GROUP BY 1, 2),
        |cents AS (SELECT label AS c_label, list(sx ORDER BY dim) AS sumvec, max(n) AS n FROM sums GROUP BY 1),
        |pr AS (SELECT vec_id AS probe_id, label AS true_label, embedding::DOUBLE[] AS pv
        |       FROM embeddings ${Ann.ProbeQualify}),
        |sc AS (SELECT probe_id, true_label, c_label, sumvec, pv, n,
        |         CASE WHEN c_label = true_label THEN 1.0 ELSE 0.0 END AS own
        |       FROM pr CROSS JOIN cents),
        |sc2 AS (SELECT probe_id, true_label, c_label, pv,
        |          list_transform(list_zip(sumvec, pv), p -> (p[1] - own * p[2]) / (n - own)) AS cent
        |        FROM sc),
        |sc3 AS (SELECT probe_id, true_label, c_label,
        |          list_sum(list_transform(list_zip(pv, cent), p -> p[1] * p[2]))
        |            / (sqrt(list_sum(list_transform(pv, x -> x * x)))
        |               * sqrt(list_sum(list_transform(cent, x -> x * x)))) AS cos
        |        FROM sc2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, c_label) AS rk FROM sc3)
        |SELECT probe_id, true_label, c_label AS pred_label, round(cos, 6) AS cos,
        |  CASE WHEN true_label = c_label THEN 1 ELSE 0 END AS correct
        |FROM r WHERE rk = 1""".stripMargin,

    "q_knn_classify" ->
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec, label AS true_label
         |                FROM embeddings ${Ann.ProbeQualify}),
         |scored AS (SELECT probe_id, c.vec_id AS neighbor_id, c.label AS pred_label,
         |  ${LlmQueries.cosSql("pvec", "c.embedding")} AS cos
         |  FROM probes JOIN embeddings c ON c.vec_id <> probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
         |      FROM scored),
         |votes AS (SELECT probe_id, pred_label, count(*)::BIGINT AS n_votes
         |          FROM r WHERE rk <= 5 GROUP BY 1, 2),
         |win AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY n_votes DESC, pred_label) AS vr
         |        FROM votes)
         |SELECT w.probe_id, p.true_label, w.pred_label, w.n_votes,
         |  CASE WHEN p.true_label = w.pred_label THEN 1 ELSE 0 END AS correct
         |FROM win w JOIN probes p ON w.probe_id = p.probe_id WHERE w.vr = 1""".stripMargin,

    "q_quality_logreg" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |st AS (SELECT sum(y)::BIGINT AS n_pos, (count(*) - sum(y))::BIGINT AS n_neg,
         |         round(avg(CASE WHEN (eta > 0) = (y = 1) THEN 1.0E0 ELSE 0.0E0 END), 6) AS train_acc
         |       FROM fs)
         |SELECT round(b.b1[1], 6) AS b0, round(b.b1[2], 6) AS b_alpha,
         |  round(b.b1[3], 6) AS b_mtl, round(b.b1[4], 6) AS b_stop, round(b.b1[5], 6) AS b_tok,
         |  st.n_pos, st.n_neg, st.train_acc
         |FROM st CROSS JOIN k3beta b""".stripMargin,

    "q_quality_score_serve" ->
      s"""WITH RECURSIVE $LogregChainSql
         |SELECT source, count(*) AS n_docs,
         |  round(avg(1.0E0 / (1.0E0 + exp(-eta))), 6) AS mean_score,
         |  sum(CASE WHEN eta > 0 THEN 1 ELSE 0 END)::BIGINT AS n_keep,
         |  round(avg(CASE WHEN eta > 0 THEN 1.0E0 ELSE 0.0E0 END), 6) AS keep_share
         |FROM fs GROUP BY 1""".stripMargin,

    "q_calibration" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |sc AS (SELECT y, 1.0E0 / (1.0E0 + exp(-eta)) AS p FROM fs),
         |bn AS (SELECT least(floor(p * 10), 9.0E0)::INT AS bin, y, p FROM sc),
         |bins AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
         |    round(sum(p), 4) / count(*) AS mean_pred
         |  FROM bn GROUP BY 1),
         |gp AS (SELECT *, n_pos::DOUBLE / n::DOUBLE AS obs_rate,
         |    abs(n_pos::DOUBLE / n::DOUBLE - mean_pred) AS gap FROM bins),
         |wn AS (SELECT *, sum(n) OVER () AS nn,
         |    sum(round(n * gap * 1e6)::BIGINT) OVER () AS ece6 FROM gp)
         |SELECT bin, n AS n_docs, n_pos,
         |  round(mean_pred, 6) AS mean_pred, round(obs_rate, 6) AS obs_rate,
         |  round(gap, 6) AS gap,
         |  round(ece6::DOUBLE / (nn::DOUBLE * 1e6), 6) AS ece
         |FROM wn""".stripMargin,

    "q_wilson_keep" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |per AS (SELECT source, count(*)::BIGINT AS n,
         |    sum(CASE WHEN eta > 0 THEN 1 ELSE 0 END)::BIGINT AS k
         |  FROM fs GROUP BY 1),
         |tot AS (SELECT sum(n)::BIGINT AS tn, sum(k)::BIGINT AS tk FROM per),
         |st AS (SELECT per.*, tot.tn, tot.tk,
         |    1.96E0 * 1.96E0 AS zz, k::DOUBLE / n::DOUBLE AS phat
         |  FROM per, tot),
         |ci AS (SELECT *,
         |    (phat + zz / (2.0E0 * n)) / (1.0E0 + zz / n) AS ctr,
         |    1.96E0 * sqrt(phat * (1.0E0 - phat) / n + zz / (4.0E0 * n * n)) / (1.0E0 + zz / n) AS hw,
         |    tk::DOUBLE / tn::DOUBLE AS pr
         |  FROM st)
         |SELECT source, n AS n_docs, k AS n_keep, round(phat, 6) AS keep_rate,
         |  round(greatest(ctr - hw, 0.0E0), 6) AS ci_lo,
         |  round(least(ctr + hw, 1.0E0), 6) AS ci_hi,
         |  CASE WHEN pr < ctr - hw OR pr > ctr + hw THEN 1 ELSE 0 END AS diverges
         |FROM ci""".stripMargin,

    "q_feature_drift" -> {
      val unions = Seq("x1", "x2", "x3", "x4").map { f =>
        s"SELECT doc_id, '$f' AS feature, least(floor($f * 10), 9.0E0)::INT AS bin FROM f"
      }.mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE $LogregChainSql,
         |mid AS (SELECT max(doc_id) // 2 AS mid FROM f),
         |binned AS ($unions),
         |hb AS (SELECT b.feature, b.bin,
         |    CASE WHEN b.doc_id <= m.mid THEN 1 ELSE 2 END AS half
         |  FROM binned b, mid m),
         |cells AS (SELECT feature, bin,
         |    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
         |    sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)::BIGINT AS c2
         |  FROM hb GROUP BY 1, 2),
         |wn AS (SELECT *,
         |    sum(c1) OVER (PARTITION BY feature)::BIGINT AS n1,
         |    sum(c2) OVER (PARTITION BY feature)::BIGINT AS n2,
         |    count(*) OVER (PARTITION BY feature)::BIGINT AS nb
         |  FROM cells),
         |tm AS (SELECT *,
         |    (c1 + 0.5E0) / (n1 + 0.5E0 * nb) AS p,
         |    (c2 + 0.5E0) / (n2 + 0.5E0 * nb) AS q
         |  FROM wn),
         |agg AS (SELECT feature, max(n1) AS n_first, max(n2) AS n_second,
         |    round(sum((p - q) * ln(p / q)), 6) AS psi
         |  FROM tm GROUP BY 1)
         |SELECT *, CASE WHEN psi > 0.2E0 THEN 1 ELSE 0 END AS drifted FROM agg""".stripMargin
    },

    "q_icc_source" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |sc AS (SELECT source, 1.0E0 / (1.0E0 + exp(-eta)) AS p FROM fs),
         |grp AS (SELECT source, count(*)::BIGINT AS m,
         |    round(sum(p), 4) AS sv, round(sum(p * p), 2) AS svv
         |  FROM sc GROUP BY 1),
         |g2 AS (SELECT *,
         |    round((svv - sv * sv / m) * 1e6)::BIGINT AS ssw_s,
         |    round(sv * sv / m * 1e6)::BIGINT AS ssb_term_s,
         |    round(sv * 1e6)::BIGINT AS sv_s,
         |    m * m AS mm_s
         |  FROM grp),
         |agg AS (SELECT count(*)::BIGINT AS g, sum(m)::BIGINT AS n,
         |    sum(ssw_s)::BIGINT AS ssw_s, sum(ssb_term_s)::BIGINT AS ssb_s,
         |    sum(sv_s)::BIGINT AS gs_s, sum(mm_s)::BIGINT AS smm FROM g2),
         |st AS (SELECT g, n, smm, ssw_s::DOUBLE / 1e6 AS ssw,
         |    ssb_s::DOUBLE / 1e6
         |      - (gs_s::DOUBLE / 1e6) * (gs_s::DOUBLE / 1e6) / n::DOUBLE AS ssb
         |  FROM agg),
         |ms AS (SELECT *, ssb / (g - 1) AS msb, ssw / (n - g) AS msw,
         |    (n - CAST(smm AS DOUBLE) / n) / (g - 1) AS kbar FROM st),
         |icc AS (SELECT *, (msb - msw) / (msb + (kbar - 1.0E0) * msw) AS icc FROM ms)
         |SELECT g AS n_sources, n AS n_docs,
         |  round(msb, 6) AS ms_between, round(msw, 6) AS ms_within,
         |  round(kbar, 6) AS k_bar, round(icc, 6) AS icc,
         |  CASE WHEN icc > 0.5E0 THEN 1 ELSE 0 END AS source_filterable
         |FROM icc""".stripMargin,

    "q_eb_shrinkage" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |per AS (SELECT source, count(*)::BIGINT AS n,
         |    sum(CASE WHEN eta > 0 THEN 1 ELSE 0 END)::BIGINT AS k
         |  FROM fs GROUP BY 1),
         |p2 AS (SELECT *, k::DOUBLE / n::DOUBLE AS phat FROM per),
         |wn AS (SELECT *,
         |    count(*) OVER ()::BIGINT AS g,
         |    sum(k) OVER ()::BIGINT AS tk, sum(n) OVER ()::BIGINT AS tn,
         |    sum(round((phat - tk2 / tn2) * (phat - tk2 / tn2) * 1e6)::BIGINT) OVER ()::BIGINT AS s2d6,
         |    sum(round(1e6 / n)::BIGINT) OVER ()::BIGINT AS hmean
         |  FROM (SELECT *, sum(k) OVER ()::DOUBLE AS tk2, sum(n) OVER ()::DOUBLE AS tn2 FROM p2)),
         |st AS (SELECT *, tk::DOUBLE / tn::DOUBLE AS pbar,
         |    (s2d6 / 1e6) / (g - 1) AS s2, (hmean / 1e6) / g AS nbar_inv FROM wn),
         |tt AS (SELECT *, greatest(s2 - pbar * (1.0E0 - pbar) * nbar_inv, 1e-6) AS tau2 FROM st),
         |mm AS (SELECT *, pbar * (1.0E0 - pbar) / tau2 AS mm FROM tt),
         |wg AS (SELECT *, n / (n + mm) AS wgt FROM mm)
         |SELECT source, n AS n_docs, k AS n_keep, round(phat, 6) AS raw_rate,
         |  round(wgt * phat + (1.0E0 - wgt) * pbar, 6) AS shrunk_rate,
         |  round(wgt, 6) AS shrink_weight, round(mm, 6) AS prior_strength
         |FROM wg""".stripMargin,

    "q_uncertainty_sample" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |sc AS (SELECT doc_id, source, y, eta, abs(eta) AS unc FROM fs),
         |sr AS (SELECT *, row_number() OVER (PARTITION BY source
         |         ORDER BY unc, doc_id) AS src_rk FROM sc),
         |cap AS (SELECT * FROM sr WHERE src_rk <= 2),
         |rk AS (SELECT *, row_number() OVER (ORDER BY unc, doc_id) AS rk FROM cap)
         |SELECT rk AS pick_rank, doc_id, source, y AS current_label,
         |  round(eta, 6) AS eta,
         |  round(1.0E0 / (1.0E0 + exp(-eta)), 6) AS score
         |FROM rk WHERE rk <= 20""".stripMargin,

    "q_shap_logit" -> {
      val unions = Seq("x1" -> "2", "x2" -> "3", "x3" -> "4", "x4" -> "5")
        .zipWithIndex.map { case ((x, b), i) =>
          s"""SELECT source, '$x' AS feature, count(*)::BIGINT AS n_docs,
             |  round(sum(round(abs(bb.b1[$b] * ($x - m.m${i + 1}s / m.nn)) * 1e6)::BIGINT)::BIGINT::DOUBLE
             |    / (count(*)::DOUBLE * 1e6), 6) AS mean_abs_shap,
             |  round(sum(round((bb.b1[$b] * ($x - m.m${i + 1}s / m.nn)) * 1e6)::BIGINT)::BIGINT::DOUBLE
             |    / (count(*)::DOUBLE * 1e6), 6) AS mean_shap
             |FROM f CROSS JOIN k3beta bb CROSS JOIN means m GROUP BY 1""".stripMargin
        }.mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE $LogregChainSql,
         |means AS (SELECT count(*)::BIGINT AS nn,
         |    round(sum(x1), 4) AS m1s, round(sum(x2), 4) AS m2s,
         |    round(sum(x3), 4) AS m3s, round(sum(x4), 4) AS m4s
         |  FROM f)
         |$unions""".stripMargin
    },

    "q_gains" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |sc AS (SELECT y, round(1.0E0 / (1.0E0 + exp(-eta)) * 1e6)::BIGINT AS p6 FROM fs),
         |dom AS (SELECT p6, count(*)::BIGINT AS c, sum(y)::BIGINT AS c1 FROM sc GROUP BY 1),
         |cum AS (SELECT *,
         |    sum(c) OVER (ORDER BY p6 DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cumc,
         |    sum(c1) OVER (ORDER BY p6 DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum1,
         |    sum(c) OVER ()::BIGINT AS nn, sum(c1) OVER ()::BIGINT AS n1
         |  FROM dom),
         |ks AS (SELECT unnest([5, 10, 20, 50]) AS kpct),
         |hit AS (SELECT c.*, k.kpct,
         |    row_number() OVER (PARTITION BY k.kpct ORDER BY c.p6 DESC) AS rk
         |  FROM cum c CROSS JOIN ks k WHERE c.cumc * 100 >= c.nn * k.kpct)
         |SELECT kpct::INT AS kpct, cumc AS n_top, cum1 AS pos_top, n1 AS n_pos,
         |  round(p6::DOUBLE / 1e6, 6) AS score_cut,
         |  round(cum1::DOUBLE / n1::DOUBLE, 6) AS capture,
         |  round((cum1::DOUBLE / n1::DOUBLE) / (cumc::DOUBLE / nn::DOUBLE), 6) AS lift
         |FROM hit WHERE rk = 1""".stripMargin,

    "q_roc_auc" ->
      s"""WITH RECURSIVE $LogregChainSql,
         |sc AS (SELECT y, round(1.0E0 / (1.0E0 + exp(-eta)) * 1e6)::BIGINT AS p6 FROM fs),
         |dom AS (SELECT p6, sum(y)::BIGINT AS c1, (count(*) - sum(y))::BIGINT AS c0
         |        FROM sc GROUP BY 1),
         |cum AS (SELECT *,
         |    coalesce(sum(c0) OVER (ORDER BY p6
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum0lt,
         |    sum(c1) OVER (ORDER BY p6
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS cum1ge,
         |    sum(c0) OVER (ORDER BY p6
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS cum0ge,
         |    sum(c1) OVER ()::BIGINT AS n1,
         |    sum(c0) OVER ()::BIGINT AS n0
         |  FROM dom),
         |u AS (SELECT *, sum(c1 * (cum0lt * 2 + c0)) OVER ()::BIGINT AS u2 FROM cum),
         |j AS (SELECT *, row_number() OVER (
         |    ORDER BY (cum1ge * n0 - cum0ge * n1) DESC, p6) AS jrk FROM u)
         |SELECT n1 AS n_pos, n0 AS n_neg,
         |  round(u2::DOUBLE / (2.0E0 * n1::DOUBLE * n0::DOUBLE), 6) AS auc,
         |  round(p6::DOUBLE / 1e6, 6) AS best_threshold,
         |  round(cum1ge::DOUBLE / n1::DOUBLE, 6) AS tpr,
         |  round(cum0ge::DOUBLE / n0::DOUBLE, 6) AS fpr,
         |  round(cum1ge::DOUBLE / n1::DOUBLE - cum0ge::DOUBLE / n0::DOUBLE, 6) AS youden_j
         |FROM j WHERE jrk = 1""".stripMargin,

    "q_cartography" -> {
      def eta(a: String) =
        s"$a.b1[1] + $a.b1[2] * x1 + $a.b1[3] * x2 + $a.b1[4] * x3 + $a.b1[5] * x4"
      s"""WITH RECURSIVE $LogregChainSql,
         |es AS (SELECT f.source, f.y,
         |    1.0E0 / (1.0E0 + exp(-(${eta("bb1")}))) AS p1,
         |    1.0E0 / (1.0E0 + exp(-(${eta("bb2")}))) AS p2,
         |    1.0E0 / (1.0E0 + exp(-(${eta("bb3")}))) AS p3
         |  FROM f CROSS JOIN k1beta bb1 CROSS JOIN k2beta bb2 CROSS JOIN k3beta bb3),
         |pt AS (SELECT source,
         |    CASE WHEN y = 1 THEN p1 ELSE 1.0E0 - p1 END AS t1,
         |    CASE WHEN y = 1 THEN p2 ELSE 1.0E0 - p2 END AS t2,
         |    CASE WHEN y = 1 THEN p3 ELSE 1.0E0 - p3 END AS t3
         |  FROM es),
         |cf AS (SELECT source, t1, t2, t3, (t1 + t2 + t3) / 3.0E0 AS conf FROM pt),
         |sv AS (SELECT source, conf,
         |    sqrt(((t1 - conf) * (t1 - conf) + (t2 - conf) * (t2 - conf)
         |      + (t3 - conf) * (t3 - conf)) / 3.0E0) AS stdv
         |  FROM cf),
         |bk AS (SELECT source, conf, stdv,
         |    CASE WHEN conf >= 0.7E0 AND stdv < 0.1E0 THEN 'easy'
         |         WHEN conf < 0.3E0 THEN 'hard' ELSE 'ambiguous' END AS bucket
         |  FROM sv)
         |SELECT source, bucket, count(*)::BIGINT AS n_docs,
         |  round(round(sum(conf), 4) / count(*), 6) AS mean_conf,
         |  round(round(sum(stdv), 4) / count(*), 6) AS mean_std
         |FROM bk GROUP BY 1, 2""".stripMargin
    }
  )

  /** The shared IRLS oracle chain: features → 3 unrolled iterations →
    * `k3beta` (the trained 5-list) and `fs` (every doc with its final
    * eta). Mirrors logregFeats/logregBeta float-for-float. */
  private[queries] lazy val LogregChainSql: String = {
    val stopList = EnStop.map(t => s"'$t'").mkString(", ")
    def etaFrom(betaCte: String) =
      s"bb.b1[1] + bb.b1[2] * x1 + bb.b1[3] * x2 + bb.b1[4] * x3 + bb.b1[5] * x4"
    def iterBlock(k: Int, prevBeta: String): String =
      s"""k${k}e AS (SELECT f.*, ${etaFrom(prevBeta)} AS eta FROM f CROSS JOIN $prevBeta bb),
         |k${k}p AS (SELECT *, 1.0E0 / (1.0E0 + exp(-eta)) AS p FROM k${k}e),
         |k${k}w AS (SELECT *, greatest(p * (1.0E0 - p), 1e-6) AS w FROM k${k}p),
         |k${k}z AS (SELECT *, eta + (CAST(y AS DOUBLE) - p) / w AS z FROM k${k}w),
         |k${k}mats AS (SELECT 'all' AS event_type, [${IrlsMoments.mkString(", ")}] AS m FROM k${k}z),
         |${graft.models.GaussJordan.sqlAug(5, 1, s"k$k")}""".stripMargin
    s"""f AS (SELECT doc_id, source, (lang = 'en')::INT AS y,
       |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) AS x1,
       |    (length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' '))) / 10.0E0 AS x2,
       |    len(list_filter(string_split(text, ' '), t -> t IN ($stopList)))::DOUBLE
       |      / len(string_split(text, ' ')) AS x3,
       |    least(len(string_split(text, ' '))::DOUBLE / 100, 1.0E0) AS x4
       |  FROM documents),
       |b0 AS (SELECT 'all' AS event_type, [0.0E0, 0.0E0, 0.0E0, 0.0E0, 0.0E0] AS b1),
       |${iterBlock(1, "b0")},
       |${iterBlock(2, "k1beta")},
       |${iterBlock(3, "k2beta")},
       |fs AS (SELECT f.*, ${etaFrom("k3beta")} AS eta FROM f CROSS JOIN k3beta bb)""".stripMargin
  }
}

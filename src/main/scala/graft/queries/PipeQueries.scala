package graft.queries

import graft._
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 LLM-pipeline additions: training-sequence packing, PII
  * scrubbing, and bloom-prefiltered incremental dedup — the ingest-side
  * operators a pretraining data pipeline runs between "corpus cleaned"
  * and "tokens on the trainer".
  */
object PipeQueries {
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Tokens per training sequence for q_pack_sequences. */
  private val SeqLen = 512L

  // PII patterns shared verbatim by both engines AND by PipeSpec's
  // crafted-PII cases (private[graft] so the spec cannot drift from the
  // product patterns). Kept inside the RE2 ∩ java.util.regex common
  // subset (char classes, bounded repeats, non-capturing groups, \b) so
  // Spark and DuckDB match identically.
  private[graft] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Pat = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[graft] val PhonePat = "\\+\\d(?:[ -]?\\d){7,14}"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Training-sequence packing (concat-then-chunk): documents are
    // concatenated per source in deterministic doc_id order and cut into
    // fixed SeqLen-token training sequences — the standard GPT-style
    // packing that wastes zero tokens on padding. Pure window cumsum: one
    // shuffle keyed by the pack stream. At 100 TB the pack stream key is
    // (source, shard) with a hash-derived shard, which this plan supports
    // by adding the column to the partition key — parallelism then scales
    // with shard count, not source count. ──
    "q_pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.nTokens(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum_before",
          coalesce(sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_before"),
          expr(s"cum_before DIV $SeqLen").as("seq_id"),
          expr(s"cum_before % $SeqLen").as("seq_off"),
          expr(s"((cum_before + n_tokens - 1) DIV $SeqLen) - (cum_before DIV $SeqLen) + 1")
            .as("n_seqs_spanned"))
    }),

    // ── Document-boundary packing audit: the OTHER standard packing
    // scheme (no doc ever spans a sequence — no cross-doc attention),
    // greedy first-fit in doc_id order with over-length docs truncated
    // to SeqLen. Emits the per-source efficiency report a packing run
    // ships: bins used, kept tokens, utilization vs bins×SeqLen, and
    // the truncation loss. The whole recursion is INTEGER state, so the
    // oracle replay is exact by construction; scale axis = sources
    // (shard the pack key like q_pack_sequences_sharded at 100 TB). ──
    "q_pack_boundary" -> ((s, dir) => {
      val fn = udf { ns: Array[Long] =>
        var fill = 0L; var bins = 0L; var tok = 0L; var trunc = 0L
        var i = 0
        while (i < ns.length) {
          var n = ns(i)
          if (n > SeqLen) { trunc += n - SeqLen; n = SeqLen }
          if (bins == 0L || fill + n > SeqLen) { bins += 1; fill = n }
          else fill += n
          tok += n
          i += 1
        }
        (bins, tok, trunc)
      }
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.nTokens(col("text")).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("transform(array_sort(collect_list(struct(doc_id, n_tokens))), x -> x.n_tokens)")
            .as("ns"))
        .withColumn("_r", fn(col("ns")))
        .select(col("source"), col("n_docs"), col("_r._1").as("n_bins"),
          col("_r._2").as("n_tokens_kept"), col("_r._3").as("n_tokens_truncated"),
          round(col("_r._2").cast("double") / (col("_r._1") * SeqLen), 6).as("utilization"))
    }),

    // ── Sharded packing: the 100 TB form of q_pack_sequences. The pack
    // stream key gains a deterministic md5-derived shard (the
    // q_sample_stratified hash trick, reproducible across engines), so
    // window parallelism scales with #sources × #shards instead of
    // #sources, at the cost of per-(source, shard) instead of per-source
    // contiguity — exactly the trade production packing makes. ──
    "q_pack_sequences_sharded" -> ((s, dir) => {
      val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 4).as("shard")
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      docs(s, dir)
        .select(col("source"), shard, col("doc_id"),
          TextFunctions.nTokens(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum_before",
          coalesce(sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("shard"), col("doc_id"), col("n_tokens"), col("cum_before"),
          expr(s"cum_before DIV $SeqLen").as("seq_id"),
          expr(s"cum_before % $SeqLen").as("seq_off"))
    }),

    // ── PII scrub: redact emails / IPv4s / phone numbers, report match
    // counts and the scrubbed-text fingerprint. The synthetic corpus
    // carries no PII, so deterministic markers derived from doc_id are
    // appended first — both engines build the identical augmented text,
    // making the oracle exercise the actual regex + replacement parity
    // rather than a vacuous all-zeros pass. One map-side scan: at 100 TB
    // this is a zero-shuffle rewrite. ──
    "q_text_scrub" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact"), col("doc_id").cast("string"), lit("@mail.example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" host 10.0."), (col("doc_id") % 200).cast("string"), lit(".25 up")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("t"))
      // email → ip → phone: the marker grammars are disjoint (only phones
      // carry '+', only ips dotted digit quads), so order only matters for
      // determinism, not semantics
      val scrubbed = regexp_replace(
        regexp_replace(
          regexp_replace(col("t"), lit(EmailPat), lit("<EMAIL>")),
          lit(Ipv4Pat), lit("<IP>")),
        lit(PhonePat), lit("<PHONE>"))
      aug.select(col("doc_id"),
        regexp_count(col("t"), lit(EmailPat)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(Ipv4Pat)).cast("long").as("n_ips"),
        regexp_count(col("t"), lit(PhonePat)).cast("long").as("n_phones"),
        (length(col("t")) - length(scrubbed)).cast("long").as("chars_removed"),
        md5(scrubbed).as("scrub_fp"))
    }),

    // ── The whole ingest chain as ONE composed Catalyst plan: stateless
    // quality cascade (the streaming qualityGate rules) → within-batch
    // exact dedup (min-doc_id per fingerprint) → sequence packing of the
    // surviving docs. Declarative end to end, so Catalyst fuses the
    // quality filters into the scan, the dedup is one fingerprint
    // shuffle, and packing is one window shuffle — three logical stages,
    // two exchanges, zero materialization barriers. The oracle replays
    // the identical chain. ──
    "q_ingest_e2e" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the repetition signal runs as the codegen'd dup_bigram_frac
      // expression — one hash pass per doc instead of the HOF gram
      // construction (measured 11× cheaper on the ingest hot path)
      val kept = docs(s, dir)
        .withColumn("_ws", split(col("text"), " "))
        .withColumn("n_tokens", size(col("_ws")).cast("long"))
        .withColumn("mtl", TextFunctions.meanTokenLen(col("text")))
        .withColumn("alpha", TextFunctions.alphaRatio(col("text")))
        .withColumn("rep", graft.expressions.dup_bigram_frac(col("_ws")))
        .where(col("n_tokens") >= 10 && col("n_tokens") <= 1000 &&
          col("mtl") >= 2.0 && col("mtl") <= 12.0 &&
          col("alpha") >= 0.5 && col("rep") < 0.5)
      val unique = kept
        .withColumn("fp", md5(col("text")))
        .withColumn("_rk", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .where(col("_rk") === 1)
      val w = Window.partitionBy("source").orderBy("doc_id")
      unique
        .withColumn("cum_before",
          coalesce(sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_before"),
          expr(s"cum_before DIV $SeqLen").as("seq_id"),
          expr(s"cum_before % $SeqLen").as("seq_off"))
    }),

    // ── Cross-source overlap matrix: for every source pair, how many
    // distinct word-3-gram shingles they share, and what fraction of each
    // side's shingle vocabulary that is — the diagnostic a pipeline runs
    // to quantify cross-source contamination before choosing mixing
    // weights. One (source, shingle) distinct + one key-equality
    // self-join on shingle: a shingle present in k sources contributes
    // C(k,2) ≤ C(#sources,2) pair rows, so the join is bounded by the
    // source count, never by corpus size. ──
    "q_source_overlap" -> ((s, dir) => {
      // THREE consumers (per-source counts + both sides of the shingle
      // self-join) — materialize the distinct set so the explode+distinct
      // runs once (r12; the same ≥3-consumer rule as q_minhash_calibration)
      val sh = Scratch.materialize(
        docs(s, dir)
          .select(col("source"), explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
          .distinct(),
        "srcov_sh")
      val cnt = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
      sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared_shingles"))
        .join(broadcast(cnt.select(col("source").as("src_a"), col("n_sh").as("n_a"))), "src_a")
        .join(broadcast(cnt.select(col("source").as("src_b"), col("n_sh").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("shared_shingles"),
          round(col("shared_shingles") / col("n_a"), 6).as("share_a"),
          round(col("shared_shingles") / col("n_b"), 6).as("share_b"))
    }),

    // ── Bloom-prefiltered incremental dedup: the corpus fingerprint set
    // is aggregated into a bloom filter (bloom_filter_agg — a few MB of
    // bits standing in for billions of fingerprints), broadcast, and the
    // ingest batch probes it MAP-SIDE. Definitely-new docs (bloom
    // negative — no false negatives possible) skip the exact join
    // entirely; only bloom-positive candidates shuffle to the fingerprint
    // store to confirm, which squeezes false positives out of the final
    // answer. Result is EXACT (oracle is the plain semi-join); the bloom
    // only prunes. At 100 TB the confirm join shrinks from |batch| to
    // |batch ∩ corpus| + ε rows — the standard ingest-dedup accelerator. ──
    "q_dedup_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      val hist = d.where(col("doc_id") < 300).select(md5(col("text")).as("fp"))
      val batch = d.where(col("doc_id") >= 300)
        .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
      // ONE distributed pass builds the filter (map-side partial bloom
      // merge), and only the finished bits — KBs here, MBs for a billion
      // fingerprints — come to the driver. In production the bloom is
      // persisted alongside the fingerprint store and re-enters each
      // ingest run as a constant, exactly as it does here via lit();
      // might_contain requires a constant/scalar-subquery build side.
      val bfBytes = hist
        .agg(graft.expressions.bloom_filter_build(xxhash64(col("fp")), 1000L, 8192L).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      // bloom_filter_agg over ZERO rows is NULL, and a NULL filter would
      // make might_contain NULL — dropping every batch row from both the
      // maybe and !maybe branches. An empty corpus means nothing can be a
      // duplicate: probe constant-false.
      val probe =
        if (bfBytes == null) lit(false)
        else graft.expressions.bloom_might_contain(lit(bfBytes), xxhash64(col("fp")))
      val probed = batch.withColumn("maybe", probe)
      val seen = hist.distinct().withColumn("_seen", lit(1))
      val confirmed = probed.where(col("maybe")).join(seen, Seq("fp"), "left")
      val fresh = probed.where(!col("maybe")).withColumn("_seen", lit(null).cast("int"))
      confirmed.unionByName(fresh)
        .select(col("doc_id"), col("source"),
          col("_seen").isNotNull.cast("int").as("dup_vs_corpus"))
    })
  )

  val sql: Map[String, String] = Map(
    "q_pack_boundary" ->
      s"""WITH RECURSIVE d AS (SELECT source, doc_id,
         |    least(len(string_split(text, ' '))::BIGINT, $SeqLen) AS n,
         |    greatest(len(string_split(text, ' '))::BIGINT - $SeqLen, 0) AS tr,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS nd
         |  FROM documents),
         |rec AS (
         |  SELECT source, 1 AS i, nd, n AS fill, 1::BIGINT AS bins, n AS tok, tr AS trunc
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT r.source, r.i + 1, r.nd,
         |    CASE WHEN r.fill + o.n > $SeqLen THEN o.n ELSE r.fill + o.n END,
         |    CASE WHEN r.fill + o.n > $SeqLen THEN r.bins + 1 ELSE r.bins END,
         |    r.tok + o.n, r.trunc + o.tr
         |  FROM rec r JOIN d o ON o.source = r.source AND o.rn = r.i + 1
         |  WHERE r.i + 1 <= r.nd)
         |SELECT source, nd AS n_docs, bins AS n_bins, tok AS n_tokens_kept,
         |  trunc AS n_tokens_truncated,
         |  round(tok::DOUBLE / (bins * $SeqLen), 6) AS utilization
         |FROM rec WHERE i = nd""".stripMargin,

    "q_pack_sequences" ->
      s"""WITH d AS (SELECT source, doc_id,
         |             len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
         |c AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before FROM d)
         |SELECT source, doc_id, n_tokens, cum_before,
         |  (cum_before // $SeqLen)::BIGINT AS seq_id,
         |  (cum_before % $SeqLen)::BIGINT AS seq_off,
         |  (((cum_before + n_tokens - 1) // $SeqLen) - (cum_before // $SeqLen) + 1)::BIGINT AS n_seqs_spanned
         |FROM c""".stripMargin,

    "q_pack_sequences_sharded" ->
      s"""WITH d AS (SELECT source,
         |             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 4 AS shard,
         |             doc_id,
         |             len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
         |c AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before FROM d)
         |SELECT source, shard, doc_id, n_tokens, cum_before,
         |  (cum_before // $SeqLen)::BIGINT AS seq_id,
         |  (cum_before % $SeqLen)::BIGINT AS seq_off
         |FROM c""".stripMargin,

    "q_text_scrub" ->
      s"""WITH aug AS (SELECT doc_id, text
         |    || CASE WHEN doc_id % 5 = 0 THEN ' contact' || doc_id || '@mail.example.com' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.' || (doc_id % 200) || '.25 up' ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
         |    AS t FROM documents),
         |sc AS (SELECT doc_id, t,
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '$EmailPat', '<EMAIL>', 'g'),
         |      '$Ipv4Pat', '<IP>', 'g'),
         |      '$PhonePat', '<PHONE>', 'g') AS s FROM aug)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$EmailPat'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(t, '$Ipv4Pat'))::BIGINT AS n_ips,
         |  len(regexp_extract_all(t, '$PhonePat'))::BIGINT AS n_phones,
         |  (length(t) - length(s))::BIGINT AS chars_removed,
         |  md5(s) AS scrub_fp
         |FROM sc""".stripMargin,

    "q_ingest_e2e" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source, text,
         |    len(string_split(text, ' '))::BIGINT AS n_tokens,
         |    length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS mtl,
         |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) AS alpha,
         |    CASE WHEN len(string_split(text, ' ')) >= 2 THEN
         |      1.0 - len(list_distinct(list_transform(range(1, len(string_split(text, ' '))),
         |            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])))::DOUBLE
         |          / len(list_transform(range(1, len(string_split(text, ' '))), i -> i))
         |    ELSE 0.0 END AS rep
         |  FROM documents),
         |kept AS (SELECT * FROM scored
         |         WHERE n_tokens >= 10 AND n_tokens <= 1000
         |           AND mtl >= 2.0 AND mtl <= 12.0 AND alpha >= 0.5 AND rep < 0.5),
         |uniq AS (SELECT *, md5(text) AS fp,
         |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
         |         FROM kept QUALIFY rk = 1),
         |packed AS (SELECT source, doc_id, n_tokens,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
         |  FROM uniq)
         |SELECT source, doc_id, n_tokens, cum_before,
         |  (cum_before // $SeqLen)::BIGINT AS seq_id,
         |  (cum_before % $SeqLen)::BIGINT AS seq_off
         |FROM packed""".stripMargin,

    "q_source_overlap" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh0 AS (SELECT doc_id, source, unnest(list_distinct(
        |          CASE WHEN len(t) >= 3
        |               THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |               ELSE []::VARCHAR[] END
        |        )) AS shingle FROM toks),
        |sh AS (SELECT DISTINCT source, shingle FROM sh0),
        |cnt AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_shingles
        |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.shared_shingles,
        |  round(p.shared_shingles / ca.n_sh, 6) AS share_a,
        |  round(p.shared_shingles / cb.n_sh, 6) AS share_b
        |FROM p JOIN cnt ca ON p.src_a = ca.source JOIN cnt cb ON p.src_b = cb.source""".stripMargin,

    "q_dedup_bloom" ->
      """WITH hist AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < 300),
        |b AS (SELECT doc_id, source, md5(text) AS fp FROM documents WHERE doc_id >= 300)
        |SELECT b.doc_id, b.source,
        |  CASE WHEN hist.fp IS NULL THEN 0 ELSE 1 END AS dup_vs_corpus
        |FROM b LEFT JOIN hist ON b.fp = hist.fp""".stripMargin
  )
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines, built from native
  * (codegen'd) Spark functions — no UDFs on the hot path, so these run
  * inside whole-stage codegen over billions of documents. All hashes are
  * md5-derived so an external engine (the DuckDB oracle) reproduces them
  * bit-exactly.
  */
object TextFunctions {

  /** Space tokenization (the corpus is space-joined). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles: "w1 w2 w3" strings (set semantics).
    * Documents shorter than k tokens emit NO shingles (they carry no
    * k-gram signal) — the DuckDB oracle mirrors this guard exactly.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      array_distinct(transform(
        sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Portable 60-bit hash: first 15 hex chars of md5 as a long — computed
    * digest-bytes→long by the native Hash60 expression (VALUE-identical
    * to `conv(substring(md5(c), 1, 15), 16, 10)`, which the oracles use;
    * ExpressionSpec proves the equivalence). Per-shingle hot path.
    */
  def hash60(c: Column): Column = {
    graft.expressions.ensureRegistered(org.apache.spark.sql.SparkSession.active)
    call_function("hash60", c)
  }

  /** hash60 reduced into the Mersenne-ish prime field used by MinHash. */
  val MinHashPrime = 2147483647L
  def hash31(c: Column): Column = hash60(c) % MinHashPrime

  /** Deterministic MinHash permutation parameters (a, b) — generated from
    * a fixed LCG so the DuckDB oracle can inline identical literals.
    */
  def permParams(numPerms: Int): Seq[(Long, Long)] = {
    var state = 88172645463325252L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; math.abs(state) % (MinHashPrime - 1) }
    Seq.fill(numPerms)((next() | 1L, next()))
  }

  /** English-ish quality heuristics (length, ratios). */
  def nTokens(text: Column): Column = size(tokens(text))
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / nTokens(text)
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text)
  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text)

  /** Count of tokens present in the given word list. */
  def wordListHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** Stopword share of tokens for a given word list. */
  def stopwordRatio(text: Column, words: Seq[String]): Column =
    wordListHits(text, words).cast("double") / nTokens(text)

  /** Language stopword profiles for the n-gram language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "es" -> Seq("el", "los", "las", "y", "es", "en", "que", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que", "des", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不")
  )

  /** Normalized-document fingerprint (md5 of lowercased text). */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 re-derived):
    * positional word-k-gram hashes, then the minimum hash of every
    * window of `w` consecutive k-grams, deduplicated. Guarantees a match
    * for any shared run of ≥ w+k-1 tokens; hashes are md5-derived so an
    * external engine reproduces the selection exactly.
    */
  def winnow(text: Column, k: Int = 3, w: Int = 4): Column = {
    val t = tokens(text)
    val grams = when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val hs = transform(grams, g => hash60(g))
    when(size(hs) >= w,
      array_distinct(transform(sequence(lit(0), size(hs) - w),
        i => array_min(slice(hs, i + 1, lit(w))))))
      .otherwise(array().cast("array<long>"))
  }

  /** 64-bit SimHash over distinct tokens (bit-vote on md5-derived token
    * hashes). Kernel form — applied to the token array per document.
    */
  def simhash64(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    for (t <- tokens.distinct) {
      val md = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** 128-bit SimHash as two 64-bit words: word 0 votes on the token's
    * first md5 word (bytes 0..7 big-endian — what the 64-bit kernel
    * used), word 1 on bytes 8..15. The full digest was always computed;
    * the wide fingerprint just stops throwing half of it away, buying a
    * 2³²-bucket pigeonhole chunk space (vs 2¹⁶ for 4×16-bit chunks of a
    * 64-bit hash) at ~2× the vote-loop cost. Oracle twin:
    * `('0x' || substr(md5(tok), 1, 16))::UBIGINT` /
    * `('0x' || substr(md5(tok), 17, 16))::UBIGINT`.
    */
  def simhash128(tokens: Seq[String]): Array[Long] = {
    val votes = new Array[Int](128)
    for (t <- tokens.distinct) {
      val md = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      var w = 0
      while (w < 2) {
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (md(8 * w + i) & 0xffL); i += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(64 * w + b) += 1 else votes(64 * w + b) -= 1
          b += 1
        }
        w += 1
      }
    }
    val out = new Array[Long](2)
    var b = 0
    while (b < 128) { if (votes(b) > 0) out(b / 64) |= (1L << (b % 64)); b += 1 }
    out
  }
}

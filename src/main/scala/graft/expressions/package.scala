package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** Column wrappers for graft's native Catalyst expressions. The expressions
  * are registered in the session's FunctionRegistry by [[GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) or lazily by
  * [[expressions.ensureRegistered]]; the wrappers then resolve through
  * `call_function`, which is fully public API.
  */
package object expressions {

  /** Idempotently register graft's native functions on an already-built
    * session (for sessions not created with the extensions config).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("ewma_array")) GraftExtensions.registerOn(spark)

  /** Adjusted exponentially-weighted mean over an ordered array; runs inside
    * whole-stage codegen (see [[EwmaArray]]).
    */
  def ewma_array(xs: Column, alpha: Double): Column = {
    ensureRegistered(SparkSession.active)
    call_function("ewma_array", xs, lit(alpha))
  }

  /** Generalized pandas-ewm over an ordered array: alpha, min_periods mask,
    * adjusted/recursive form, NaN-skip (see [[EwmArray]]); the building
    * block of the nowcasting technical-indicator chains (MACD/TRIX/TSI/RSI).
    */
  def ewm_array(xs: Column, alpha: Double, minPeriods: Int, adjust: Boolean): Column = {
    ensureRegistered(SparkSession.active)
    call_function("ewm_array", xs, lit(alpha), lit(minPeriods), lit(adjust))
  }

  /** Allocation-free cosine similarity of two float vectors (see
    * [[CosineSim]]); the pair-heavy ANN/dedup hot path.
    */
  def cosine_sim(a: Column, b: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("cosine_sim", a, b)
  }

  /** Duplicated-consecutive-2-gram fraction of a word array (see
    * [[DupBigramFrac]]); the ingest-hot-path repetition signal.
    */
  def dup_bigram_frac(words: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("dup_bigram_frac", words)
  }

  /** Full MinHash signature (all perm minima) of a shingle-hash array in
    * one compiled pass (see [[MinhashSignature]]); the per-row signature
    * cost of the streaming ingest path.
    */
  def minhash_signature(shingleHashes: Column, numPerms: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("minhash_signature", shingleHashes, lit(numPerms))
  }

  /** All random-hyperplane LSH band buckets of a vector in one compiled
    * pass (see [[LshBandBuckets]]); bit-identical to the per-plane HOF
    * projections — the signature hot path of the near-dup/KNN family.
    */
  def lsh_band_buckets(vec: Column, bands: Int, rowsPerBand: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("lsh_band_buckets", vec, lit(bands), lit(rowsPerBand))
  }

  /** Token count of a word array under an ordered BPE merge cascade
    * (tab-separated pairs; see [[BpeTokenCount]]) — the map-side encode
    * hot path of q_bpe_encode.
    */
  def bpe_token_count(words: Column, mergePairs: Seq[String]): Column = {
    ensureRegistered(SparkSession.active)
    call_function("bpe_token_count", words, lit(mergePairs.mkString("\t")))
  }

  /** Build side of Spark's bloom-filter pair: aggregates xxhash64 values
    * into a serialized bloom filter sized for `expectedItems` / `numBits`.
    */
  def bloom_filter_build(xxhash64Value: Column, expectedItems: Long, numBits: Long): Column = {
    ensureRegistered(SparkSession.active)
    call_function("bloom_filter_build", xxhash64Value, lit(expectedItems), lit(numBits))
  }

  /** Probe side of Spark's bloom-filter pair (tests membership of an
    * xxhash64 value). Codegen'd — no UDF boxing on the per-row
    * pre-filter path.
    */
  def bloom_might_contain(bloom: Column, xxhash64Value: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("bloom_might_contain", bloom, xxhash64Value)
  }

  /** KMV (bottom-k) distinct-count estimate of a hash60 column — a
    * mergeable ≤ k-long sketch state per group (see [[KmvSketchAgg]]).
    */
  def kmv_sketch(hash60Value: Column, k: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("kmv_sketch", hash60Value, lit(k))
  }

  /** The k smallest distinct hash60 values (ascending array) — the
    * composable form of the KMV sketch (see [[KmvHashesAgg]]): union =
    * bottom-k of the concat, so set-overlap estimates need only the
    * sketches.
    */
  def kmv_hashes(hash60Value: Column, k: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("kmv_hashes", hash60Value, lit(k))
  }

  /** HyperLogLog (m = 64) distinct-count estimate of a hash60 column —
    * 64 bytes of mergeable state per group (see [[HllSketchAgg]]).
    */
  def hll_sketch(hash60Value: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("hll_sketch", hash60Value)
  }

  /** Count-Min frequency sketch of a hash31 column: depth×width counter
    * array, mergeable by elementwise add (see [[CmsSketchAgg]]); probe
    * with `element_at(sketch, j*width + cms_pos(j, h) + 1)` minima.
    */
  def cms_sketch(hash31Value: Column, depth: Int, width: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("cms_sketch", hash31Value, lit(depth), lit(width))
  }

  /** Misra–Gries heavy-hitter candidate set of a string column: ≤ capacity
    * keys of mergeable state; every key with frequency > N/(capacity+1) is
    * guaranteed present (see [[MisraGriesAgg]]). Confirm candidates with an
    * exact second pass — membership beyond the guarantee is partition-order
    * dependent.
    */
  def mg_candidates(key: Column, capacity: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("mg_candidates", key, lit(capacity))
  }

  /** Fixed-width histogram counter aggregate over a precomputed long
    * bucket-index column — `buckets` longs of mergeable state (see
    * [[HistSketchAgg]]); out-of-range indices clamp into the edges.
    */
  def hist_sketch(bucketIdx: Column, buckets: Int): Column = {
    ensureRegistered(SparkSession.active)
    call_function("hist_sketch", bucketIdx, lit(buckets))
  }
}

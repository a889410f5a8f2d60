package graft

import graft.expressions.{BpeTokenCount, CmsSketchAgg, CosineSim, DupBigramFrac, EwmArray, EwmaArray, Hash60, HistSketchAgg, HllSketchAgg, KmvHashesAgg, KmvSketchAgg, LshBandBuckets, MinhashSignature, MisraGriesAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.FunctionShim
import org.apache.spark.sql.types.Decimal

/** Session extension wiring: register graft's native expressions as SQL
  * functions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — then
  * `SELECT ewma_array(xs, 0.2)` works from plain SQL. For sessions built
  * without the config, [[GraftExtensions.registerOn]] registers the same
  * functions post-hoc.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def toDouble(e: Expression): Double = e.eval() match {
    case d: Double  => d
    case f: Float   => f.toDouble
    case d: Decimal => d.toDouble
    case i: Int     => i.toDouble
    case l: Long    => l.toDouble
    case other      => throw new IllegalArgumentException(s"expected numeric literal, got $other")
  }

  private def toBoolean(e: Expression): Boolean = e.eval() match {
    case b: Boolean => b
    case other      => throw new IllegalArgumentException(s"expected boolean literal, got $other")
  }

  private def toInt(e: Expression): Int = e.eval() match {
    case i: Int   => i
    case l: Long  => l.toInt
    case s: Short => s.toInt
    case b: Byte  => b.toInt
    case other    => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  /** (name, info, builder) for every graft-native SQL function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("ewma_array",
      new ExpressionInfo(classOf[EwmaArray].getName, "ewma_array"),
      (exprs: Seq[Expression]) => EwmaArray(exprs.head, toDouble(exprs(1)))),
    ("ewm_array",
      new ExpressionInfo(classOf[EwmArray].getName, "ewm_array"),
      (exprs: Seq[Expression]) => {
        arity("ewm_array", exprs, 4)
        EwmArray(exprs.head, toDouble(exprs(1)), toInt(exprs(2)), toBoolean(exprs(3)))
      }),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))),
    ("dup_bigram_frac",
      new ExpressionInfo(classOf[DupBigramFrac].getName, "dup_bigram_frac"),
      (exprs: Seq[Expression]) => {
        arity("dup_bigram_frac", exprs, 1)
        DupBigramFrac(exprs.head)
      }),
    ("hash60",
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (exprs: Seq[Expression]) => {
        arity("hash60", exprs, 1)
        Hash60(exprs.head)
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        arity("minhash_signature", exprs, 2)
        MinhashSignature(exprs.head, toInt(exprs(1)))
      }),
    ("lsh_band_buckets",
      new ExpressionInfo(classOf[LshBandBuckets].getName, "lsh_band_buckets"),
      (exprs: Seq[Expression]) => {
        arity("lsh_band_buckets", exprs, 3)
        LshBandBuckets(exprs.head, toInt(exprs(1)), toInt(exprs(2)))
      }),
    ("bpe_token_count",
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => {
        arity("bpe_token_count", exprs, 2)
        BpeTokenCount(exprs.head, exprs(1))
      }),
    // Spark ships BloomFilterMightContain for its own runtime join
    // filtering but does not expose it in the FunctionRegistry (the
    // bloom_filter_agg side IS registered). Registering the probe side
    // makes the classic bloom pre-filter pattern — aggregate a corpus
    // key-set into a few MB of bits, broadcast, prune a stream/batch
    // map-side before the exact join — writable as plain codegen'd SQL.
    ("bloom_might_contain",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        arity("bloom_might_contain", exprs, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs.head, exprs(1))
      }),
    ("bloom_filter_build",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_build"),
      (exprs: Seq[Expression]) => {
        arity("bloom_filter_build", exprs, 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1), exprs(2))
      }),
    ("kmv_sketch",
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => {
        arity("kmv_sketch", exprs, 2)
        KmvSketchAgg(exprs.head, toInt(exprs(1)))
      }),
    ("kmv_hashes",
      new ExpressionInfo(classOf[KmvHashesAgg].getName, "kmv_hashes"),
      (exprs: Seq[Expression]) => {
        arity("kmv_hashes", exprs, 2)
        KmvHashesAgg(exprs.head, toInt(exprs(1)))
      }),
    ("hll_sketch",
      new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_sketch"),
      (exprs: Seq[Expression]) => {
        arity("hll_sketch", exprs, 1)
        HllSketchAgg(exprs.head)
      }),
    ("cms_sketch",
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => {
        arity("cms_sketch", exprs, 3)
        CmsSketchAgg(exprs.head, toInt(exprs(1)), toInt(exprs(2)))
      }),
    ("mg_candidates",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_candidates"),
      (exprs: Seq[Expression]) => {
        arity("mg_candidates", exprs, 2)
        MisraGriesAgg(exprs.head, toInt(exprs(1)))
      }),
    ("hist_sketch",
      new ExpressionInfo(classOf[HistSketchAgg].getName, "hist_sketch"),
      (exprs: Seq[Expression]) => {
        arity("hist_sketch", exprs, 2)
        HistSketchAgg(exprs.head, toInt(exprs(1)))
      }))

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${exprs.length}")

  /** Register all graft functions on an already-built session. */
  def registerOn(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      FunctionShim.register(spark, name, info, builder)
    }
}

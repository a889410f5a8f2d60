package graft

import graft.queries.TokenQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer-side pack: mixture planning, duplicated-span detection, BPE
  * merge learning.
  */
class TokenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("q_mix_weights: weights normalize, budget is conserved, temperature flattens") {
    val out = TokenQueries.defs("q_mix_weights")(spark, sf).cache()
    val agg = out.agg(sum("mix_weight").as("wsum"), sum("share").as("ssum"),
      sum("target_tokens").as("tsum"), (sum("n_tokens") * 0.5).as("budget")).head()
    assert(math.abs(agg.getDouble(0) - 1.0) < 1e-4)
    assert(math.abs(agg.getDouble(1) - 1.0) < 1e-4)
    // targets re-assemble the budget (up to per-row rounding)
    assert(math.abs(agg.getDouble(2) - agg.getDouble(3)) < 1.0)
    // T=2 temperature flattens: the upweighting ratio mix_weight/share =
    // (1/sqrt(share))/Σsqrt is strictly decreasing in share, so sorting by
    // share must sort the ratio the other way
    val ratios = out.orderBy("share").collect()
      .map(r => r.getAs[Double]("mix_weight") / r.getAs[Double]("share"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => b <= a + 1e-6 })
    assert(out.where(col("epochs") < 1).count() === 0)
    out.unpersist()
  }

  test("q_substring_dedup: crafted cross-doc duplicate span is found and merged") {
    import spark.implicits._
    val span = (1 to 12).map(i => s"tok$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta", "en", "s0", 0L),
      (2L, s"one two three four five six seven $span", "en", "s0", 0L),
      (3L, "completely unrelated words nine ten eleven twelve thirteen fourteen fifteen sixteen", "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // the query reads $dir/documents.parquet — point it at a crafted corpus
    val dir = java.nio.file.Files.createTempDirectory("tokenspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TokenQueries.defs("q_substring_dedup")(spark, dir).cache()
    val r1 = out.where(col("doc_id") === 1).head()
    val r2 = out.where(col("doc_id") === 2).head()
    val r3 = out.where(col("doc_id") === 3).head()
    // the 12-token shared run is one merged span of 12 tokens in both docs
    assert(r1.getAs[Long]("n_dup_spans") === 1L && r1.getAs[Long]("dup_tokens") === 12L)
    assert(r2.getAs[Long]("n_dup_spans") === 1L && r2.getAs[Long]("dup_tokens") === 12L)
    assert(r3.getAs[Long]("n_dup_spans") === 0L && r3.getAs[Long]("dup_tokens") === 0L)
    out.unpersist()
  }

  test("q_substring_dedup: real corpus — every doc present, spans within bounds") {
    val out = TokenQueries.defs("q_substring_dedup")(spark, sf).cache()
    assert(out.count() === Tables.documents(spark, sf).count())
    assert(out.where(col("dup_tokens") > col("n_tokens") || col("dup_frac") > 1.0).count() === 0)
    assert(out.where(col("n_dup_spans") > 0 && col("dup_tokens") < 8).count() === 0)
    out.unpersist()
  }

  test("q_bpe_encode: symbol counts bounded by chars below and words above") {
    val out = TokenQueries.defs("q_bpe_encode")(spark, sf).cache()
    // every word is at least one symbol; merges can only shrink the
    // char-split, so bpe tokens sit between word count and char count
    assert(out.where(col("bpe_tokens") < col("ws_tokens")).count() === 0)
    assert(out.where(col("bpe_per_word") < 1.0 || col("chars_per_token") < 1.0).count() === 0)
    // the learned merges actually fire: strictly fewer symbols than the
    // raw char-split of the in-alphabet words would give (chars_per_token
    // > 1 means at least one multi-char symbol survived somewhere)
    assert(out.where(col("chars_per_token") <= 1.0).count() === 0)
    out.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("q_bpe_learn: ranks complete, merges well-formed, argmax counts non-increasing") {
    val rows = TokenQueries.defs("q_bpe_learn")(spark, sf)
      .orderBy("merge_rank").collect()
    assert(rows.length === 8)
    assert(rows.map(_.getAs[Int]("merge_rank")).toSeq === (1 to 8))
    rows.foreach { r =>
      val pair = r.getAs[String]("pair")
      assert(pair.count(_ == ' ') === 1)
      assert(r.getAs[String]("merged") === pair.replace(" ", ""))
      assert(r.getAs[Long]("pair_count") > 0L)
    }
    // merging can only shrink or preserve the best pair count: new pairs
    // created by a merge occur at most as often as the merge itself
    val counts = rows.map(_.getAs[Long]("pair_count")).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    // no persisted blocks left behind by the learning loop
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

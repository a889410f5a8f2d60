package graft.text

import graft.Scratch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an undirected token co-occurrence graph
  * (Mihalcea & Tarau 2004, "TextRank: Bringing Order into Texts") with
  * BOUNDED driver state at any corpus size.
  *
  * The whole iteration is exact 1e9-scaled BIGINT arithmetic, so the two
  * execution paths are bit-identical and order-independent:
  *
  *  - normalized edge weight pw(j→i) = round(w_ij / wout_j · 1e9) — one
  *    IEEE divide+multiply+round on exact integer counts, computed once;
  *  - contribution = (r_j · pw) div 1e9 (pw ≤ 1e9 and r_j ≤ 1e9, so the
  *    product stays < 1e18 — no overflow at any corpus size);
  *  - r'_i = base + (Σ contributions · 17) div 20 with
  *    base = (1e9·15/100) div n — the 0.15/n + 0.85·Σ update in integers.
  *
  * Because every per-edge value is an integer, the Σ is order-independent
  * and a distributed groupBy-sum equals the driver loop exactly — unlike
  * a float PageRank, whose sum order differs between engines.
  *
  * Path choice (the Dedup.connectedComponents discipline): when
  * #vocab + #edges ≤ `maxDriverGraph` (default 2M entries ≈ 50 MB heap)
  * the graph is collected and iterated on the driver — one job, no
  * per-round shuffles. Beyond the cap the SAME recurrence runs as
  * `Iters` distributed join+aggregate rounds over (src, dst, pw),
  * lineage truncated by scratch materialization every 5 rounds; driver
  * state is then O(1). TextRankSpec proves the two paths bit-equal by
  * forcing the cap to 0.
  */
object TextRank {

  /** Rank fixed-point scale; damping 0.85 is the exact ratio 17/20. */
  val Scale = 1000000000L
  val DampNum = 17L
  val DampDen = 20L
  val Iters = 30

  /** Driver fast-path bound: collected (words + edges) entries. */
  val MaxDriverGraph = 2000000L

  /** vocab: (tok, freq); pairs: (a, b, w) undirected with a < b.
    * Returns (tok, freq, r) with r the 1e9-scaled final rank. */
  def ranks(vocab0: DataFrame, pairs0: DataFrame,
            maxDriverGraph: Long = MaxDriverGraph): DataFrame = {
    val vocab = Scratch.materialize(vocab0, "textrank_vocab")
    val pairs = Scratch.materialize(pairs0, "textrank_pairs")
    val n = vocab.count()
    val nE = pairs.count()
    val init = Scale / math.max(n, 1L)
    val base = (Scale * 15L / 100L) / math.max(n, 1L)
    val sym = pairs.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(pairs.select(col("b"), col("a"), col("w")).toDF("src", "dst", "w"))
    val wout = sym.groupBy("src").agg(sum("w").as("wo"))
    val edges = sym.join(wout, "src").select(col("src"), col("dst"),
      round(col("w").cast("double") / col("wo") * Scale).cast("long").as("pw"))

    val ranksDf =
      if (n + nE <= maxDriverGraph) {
        val spark = vocab.sparkSession
        import spark.implicits._
        val words = vocab.select("tok").collect().map(_.getString(0)).sorted
        val idx = words.zipWithIndex.toMap
        val nn = words.length
        val adj = Array.fill(nn)(scala.collection.mutable.ArrayBuffer.empty[(Int, Long)])
        edges.collect().foreach { r =>
          adj(idx(r.getString(1))) += ((idx(r.getString(0)), r.getLong(2)))
        }
        var rk = Array.fill(nn)(init)
        var it = 0
        while (it < Iters) {
          val next = new Array[Long](nn)
          var i = 0
          while (i < nn) {
            var acc = 0L
            adj(i).foreach { case (j, pw) => acc += rk(j) * pw / Scale }
            next(i) = base + acc * DampNum / DampDen
            i += 1
          }
          rk = next
          it += 1
        }
        words.zipWithIndex.map { case (w, i) => (w, rk(i)) }.toSeq.toDF("tok", "r")
      } else {
        val edgesM = Scratch.materialize(edges, "textrank_edges")
        var rk = vocab.select(col("tok"), lit(init).as("r"))
        var it = 0
        while (it < Iters) {
          val contrib = edgesM.join(rk.withColumnRenamed("tok", "src"), "src")
            .select(col("dst").as("tok"), expr(s"(r * pw) div $Scale").as("c"))
            .groupBy("tok").agg(sum("c").as("sc"))
          rk = vocab.select("tok").join(contrib, Seq("tok"), "left")
            .select(col("tok"),
              (lit(base) + expr(s"(coalesce(sc, CAST(0 AS BIGINT)) * $DampNum) div $DampDen"))
                .as("r"))
          if (it % 5 == 4 && it < Iters - 1) rk = Scratch.materialize(rk, s"textrank_r$it")
          it += 1
        }
        rk
      }
    vocab.join(ranksDf, "tok").select(col("tok"), col("freq"), col("r"))
  }
}

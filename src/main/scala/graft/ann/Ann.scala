package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Three tiers, by corpus size:
  *  - brute force: broadcast the (small) probe set against the full
  *    corpus — exact, one scan, no shuffle of the corpus side;
  *  - LSH: random-hyperplane bucketing — candidates meet through a
  *    key-equality join on the bucket id;
  *  - IVF: coarse cells (here the pre-assigned label; k-means centroids
  *    in general), probe the nearest cells only.
  *
  * Dot products run in double precision: the native zip_with/aggregate
  * form for one-shot compares, a tight allocation-free UDF (identical
  * arithmetic) on pair-heavy paths where the higher-order functions'
  * per-pair array allocation dominates.
  */
object Ann {

  /** Σ aᵢbᵢ in double precision via zip_with + aggregate (codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity between two array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Same arithmetic as [[cosine]] (left-to-right double accumulation) as
    * a tight while-loop UDF. On pair-heavy paths (all-pairs near-dup,
    * top-k scans) this is ~20× faster than the zip_with/aggregate form,
    * which allocates an intermediate array per pair — here the inner loop
    * is allocation-free. Results are bit-identical to the native form.
    */
  val cosineFast = udf { (a: Seq[Float], b: Seq[Float]) =>
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All-pairs cosine near-duplicates above a threshold. One side is
    * collected and broadcast as plain float arrays (all-pairs requires one
    * side in memory, exactly like Spark's own BroadcastNestedLoopJoin —
    * but as primitive arrays deserialized ONCE, not per pair); the corpus
    * side streams through flatMap. For corpora beyond broadcast size use
    * the LSH/IVF blocked variants — all-pairs is O(n²) by definition.
    */
  def allPairsCosine(corpus: DataFrame, threshold: Double,
                     id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val side = corpus.select(col(id), col(vec)).as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(side)
    corpus.select(col(id), col(vec)).as[(Long, Array[Float])]
      .flatMap { case (i, v) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var nv = 0.0
        var t = 0
        while (t < v.length) { val x = v(t).toDouble; nv += x * x; t += 1 }
        val nvs = math.sqrt(nv)
        for ((j, w) <- bc.value if j > i) {
          var d = 0.0; var nw = 0.0
          var p = 0
          while (p < v.length) {
            val x = v(p).toDouble; val y = w(p).toDouble
            d += x * y; nw += y * y
            p += 1
          }
          val c = d / (nvs * math.sqrt(nw))
          if (c >= threshold) out += ((i, j, c))
        }
        out
      }.toDF("i", "j", "_cos")
      .select(col("i"), col("j"), round(col("_cos"), 6).as("cos"))
  }

  /** Exact top-k cosine neighbors of each probe row. The probe side is
    * broadcast; the corpus side streams — no corpus shuffle.
    */
  def knnBruteForce(corpus: DataFrame, probes: DataFrame, k: Int,
                    id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(probes.select(col(id).as("probe_id"), col(vec).as("pvec"))),
        col(s"c.$id") =!= col("probe_id"))
      .withColumn("cos", cosineFast(col("pvec"), col(s"c.$vec")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(s"c.$id"))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col(s"c.$id").as("neighbor_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  /** Projection of `vec` on a deterministic pseudo-random hyperplane:
    * the (plane, dim) weight is integer-arithmetic LCG noise in
    * [-0.5, 0.5), so any engine reproduces the same planes bit-exactly.
    */
  def planeProjection(vec: Column, plane: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x.cast("double") *
          ((((lit(plane.toLong) * 64 + d.cast("long")) * lit(2654435761L)) % 1000003).cast("double") / 1000003.0 - 0.5)),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket id from `planes` sign bits. */
  def lshBucket(vec: Column, planes: Int): Column =
    (0 until planes).map(p =>
      when(planeProjection(vec, p) >= 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)

  /** Top-k within LSH buckets: probes only compare against their bucket. */
  def knnLsh(corpus: DataFrame, probes: DataFrame, k: Int, planes: Int = 8,
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val bc = corpus.withColumn("bucket", lshBucket(col(vec), planes))
    val bp = probes.withColumn("bucket", lshBucket(col(vec), planes))
      .select(col("bucket"), col(id).as("probe_id"), col(vec).as("pvec"))
    val joined = bc.join(bp, Seq("bucket")).where(col(id) =!= col("probe_id"))
      .withColumn("cos", cosineFast(col("pvec"), col(vec)))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(id))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col("bucket"), col(id).as("neighbor_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  /** Elementwise mean vector per cell (array avg via posexplode). */
  def centroids(corpus: DataFrame, cell: String, vec: String = "embedding"): DataFrame =
    corpus.select(col(cell), posexplode(col(vec)).as(Seq("dim", "x")))
      .groupBy(cell, "dim").agg(avg(col("x").cast("double")).as("cx"))
      .groupBy(cell).agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("cs"))
      .select(col(cell), expr("transform(cs, s -> s.cx)").as("centroid"))

  /** IVF search: rank cells by probe→centroid cosine, scan the top
    * `nprobe` cells only, return top-k per probe.
    */
  def knnIvf(corpus: DataFrame, probes: DataFrame, cell: String, k: Int, nprobe: Int = 2,
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val cents = centroids(corpus, cell, vec)
    val probeCells = probes.select(col(id).as("probe_id"), col(vec).as("pvec"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("pvec"), col("centroid")))
    val wCell = Window.partitionBy("probe_id").orderBy(col("ccos").desc, col(cell))
    val chosen = probeCells.withColumn("crk", row_number().over(wCell)).where(col("crk") <= nprobe)
      .select(col("probe_id"), col("pvec"), col(cell), col("crk"))
    val joined = chosen.join(corpus, Seq(cell)).where(col(id) =!= col("probe_id"))
      .withColumn("cos", cosineFast(col("pvec"), col(vec)))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(id))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("probe_id"), col(cell), col(id).as("neighbor_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }
}

package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed, MERGEABLE sketch aggregates as native Catalyst
  * `TypedImperativeAggregate`s — the production shape for cardinality /
  * frequency profiling at 100 TB: each task folds its partition into a
  * few-KB fixed-size state, partial states merge associatively across the
  * shuffle (one row per group moves, never the data), and the driver sees
  * only the final estimate. All randomness is md5-derived ([[Hash60]]), so
  * the DuckDB oracles replay every estimate BIT-exactly in SQL — the
  * estimator arithmetic sticks to doubles that are exact in IEEE754
  * (powers of two, small-int products) or rounds once at a deterministic
  * point, never over an order-dependent float sum.
  *
  * Reference points (public literature, not reference-repo code):
  * KMV/bottom-k per Bar-Yossef et al. 2002; HyperLogLog per Flajolet
  * et al. 2007 (m=64, alpha=0.709, linear-counting small-range
  * correction); Count-Min per Cormode & Muthukrishnan 2005.
  */
object Sketches {
  /** 2^60 — hash60 values are uniform on [0, 2^60). Exact as a double. */
  val HashSpace: Double = 1152921504606846976.0

  /** HLL geometry: m = 64 registers (6-bit index), 54-bit rank field. */
  val HllM: Int = 64
  val HllRankBits: Int = 54
  /** alpha_64 * m^2 * 2^55, folded EXACTLY as written in the oracle SQL:
    * `0.709 * 64.0 * 64.0 * 36028797018963968.0` (left-assoc IEEE mults —
    * both engines produce the identical double). */
  val HllAm2: Double = 0.709 * 64.0 * 64.0 * 36028797018963968.0

  /** rank = position of the leftmost 1-bit in the 54-bit field w,
    * counting from 1; 55 when w = 0 (all-zeros). */
  def hllRank(w: Long): Int =
    if (w == 0L) HllRankBits + 1
    else HllRankBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))

  def serializeLongs(xs: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * xs.length)
    xs.foreach(bb.putLong)
    bb.array()
  }

  def deserializeLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Shared bottom-k state machinery for the two KMV aggregates (estimate
    * and hashes forms differ only in eval/dataType). */
  def bottomKAdd(buf: java.util.TreeSet[Long], h: Long, k: Int): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast() // drop the largest; keeps k smallest
  }

  def bottomKMerge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long], k: Int): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) bottomKAdd(a, it.next(), k)
    a
  }

  /** Ascending array copy (TreeSet iterates in sorted order). */
  def treeSetToArray(buf: java.util.TreeSet[Long]): Array[Long] = {
    val xs = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { xs(i) = it.next(); i += 1 }
    xs
  }
}

/** KMV (k-minimum-values / bottom-k) distinct-count estimate of a LONG
  * hash column (hash60 output): keep the k smallest DISTINCT hashes seen;
  * with fewer than k survivors the count is exact, otherwise
  * `(k-1) * 2^60 / h_(k)` (Bar-Yossef et al.). State: ≤ k longs, merge =
  * set-union-then-truncate — associative and duplicate-proof, so partial
  * aggregation across 1000 executors is lossless.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a long hash column, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) Sketches.bottomKAdd(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] =
    Sketches.bottomKMerge(a, b, k)

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * Sketches.HashSpace / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] =
    Sketches.serializeLongs(Sketches.treeSetToArray(buf))

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = createAggregationBuffer()
    Sketches.deserializeLongs(bytes).foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** The k smallest DISTINCT hash60 values themselves (ascending array) —
  * [[KmvSketchAgg]]'s state exposed as a value, which is what makes KMV
  * sketches an ALGEBRA: the bottom-k of a union is computable from two
  * bottom-k arrays alone (k smallest distinct of their concat), so
  * per-partition sketches compose into union/intersection/Jaccard
  * estimates without ever revisiting the data (Beyer et al. 2007).
  */
case class KmvHashesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, s"kmv_hashes needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_hashes requires a long hash column, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_hashes"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) Sketches.bottomKAdd(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] =
    Sketches.bottomKMerge(a, b, k)

  override def eval(buf: java.util.TreeSet[Long]): Any =
    new GenericArrayData(Sketches.treeSetToArray(buf))

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] =
    Sketches.serializeLongs(Sketches.treeSetToArray(buf))

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = createAggregationBuffer()
    Sketches.deserializeLongs(bytes).foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvHashesAgg =
    copy(child = newChildren.head)
}

/** HyperLogLog distinct-count estimate of a LONG hash column (hash60
  * output): m = 64 byte registers, register = low 6 hash bits, rank =
  * leftmost-1 position of the remaining 54 bits. State: 64 bytes, merge =
  * elementwise max. The estimator avoids an order-dependent float sum by
  * accumulating `Z * 2^55` as an EXACT integer (each term `2^(55-M_r)`,
  * bounded by 64 * 2^55 = 2^61), so the single rounding point — the final
  * long→double division — is deterministic; the DuckDB oracle replays it
  * with the same integer sum. Small-range (linear-counting) correction
  * per the HLL paper: E = m·ln(m/V) when E_raw ≤ 2.5m and V > 0.
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import Sketches._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a long hash column, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllM)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h & (HllM - 1)).toInt
      val rank = hllRank(h >>> 6)
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllM) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var zInt = 0L // sum of 2^(55 - M_r): exact, order-independent
    var zeros = 0
    var i = 0
    while (i < HllM) {
      zInt += 1L << (55 - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = HllAm2 / zInt.toDouble
    if (raw <= 2.5 * HllM && zeros > 0) HllM.toDouble * math.log(HllM.toDouble / zeros)
    else raw
  }

  // defensive copies: the contract doesn't promise the returned bytes are
  // written before the buffer mutates again (or that storage bytes won't
  // be reused), and 64 B makes the copy free
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

/** Count-Min frequency sketch over a 31-bit hash column ([[Hash60]]
  * reduced mod 2^31−1, so the row-hash products stay in 63 bits): depth
  * rows × width counters, row hashes `(a_j·h + b_j) mod P mod width` with
  * the same deterministic LCG (a, b) stream MinHash uses. State:
  * depth·width longs (a few KB), merge = elementwise add. Evaluates to
  * the raw counter array; point estimates are `min_j counters[j·w +
  * pos_j(h)]` — plain `element_at` arithmetic the query (and the DuckDB
  * oracle, via per-row bucket GROUP BYs) computes identically. Estimates
  * never undercount; overcounts are collision mass (Cormode &
  * Muthukrishnan).
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 2, s"cms_sketch needs depth >= 1, width >= 2; got ($depth, $width)")

  private val params: Array[(Long, Long)] =
    graft.text.TextFunctions.permParams(depth).toArray
  private val P: Long = graft.text.TextFunctions.MinHashPrime

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires a long hash column, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        val (a, b) = params(j)
        buf(j * width + (((a * h + b) % P) % width).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Sketches.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Sketches.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

/** Fixed-width histogram counter aggregate over a precomputed bucket-index
  * column: `buckets` longs of state, merge = elementwise add (the CMS
  * discipline applied to equi-width quantile estimation). Callers compute
  * the bucket index from a broadcast (lo, hi) range store — the two-pass
  * q_sketch_quantiles shape — and derive p50/p90/p99 from the counts
  * array with one fold; indices outside [0, buckets) clamp into the edge
  * buckets so no mass is dropped. Exact integer counts: merge order is
  * irrelevant and cross-engine replays are bit-exact.
  */
case class HistSketchAgg(
    child: Expression,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(buckets >= 1, s"hist_sketch needs buckets >= 1, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hist_sketch requires a long bucket-index column, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = v.asInstanceOf[Long]
      val clamped = if (idx < 0L) 0 else if (idx >= buckets) buckets - 1 else idx.toInt
      buf(clamped) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Sketches.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Sketches.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistSketchAgg =
    copy(child = newChildren.head)
}

/** Misra–Gries heavy-hitter CANDIDATE sketch over a string column: at most
  * `capacity` (key, counter) pairs of state; any key whose true frequency
  * exceeds N / (capacity + 1) is GUARANTEED to survive (Misra & Gries
  * 1982), and the summaries are mergeable with the same guarantee
  * (Agarwal et al. 2012, "Mergeable summaries": merge = sum counters, then
  * subtract the (capacity+1)-th largest counter from all and keep the
  * positive remainder). Evaluates to the ASCENDING-sorted candidate key
  * array — a superset of the true heavy hitters whose exact membership
  * depends on partition/merge order, so callers MUST confirm with an exact
  * second pass restricted to the candidates (the two-pass top-k pattern:
  * sketch finds ≤ capacity candidates in one map-side pass, the confirm
  * groupBy shuffles only candidate rows). Update amortizes O(1): each
  * decrement-all pass removes ≥ capacity+1 units of total counter mass,
  * and mass only enters one unit per row.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity >= 1, s"mg_candidates needs capacity >= 1, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_candidates requires a string column, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1L)
      else if (buf.size < capacity) buf.put(key, 1L)
      else decrementAll(buf, 1L) // the arriving key absorbs the -1 implicitly
    }
    buf
  }

  /** Subtract `d` from every counter, evicting non-positives. */
  private def decrementAll(buf: java.util.HashMap[String, Long], d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - d
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter value from all
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(a, counts(a.size - capacity - 1))
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  // length-prefixed UTF-8 (writeUTF's 64 KB-per-string limit would make a
  // pathological token a task failure instead of a counted key)
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

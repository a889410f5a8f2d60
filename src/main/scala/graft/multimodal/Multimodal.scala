package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media travel as opaque `binary` columns
  * with typed metadata alongside. The pattern at 100 TB:
  *
  *   raw bytes (binary) ──mapPartitions (batched)──► decoded features
  *
  * The decode itself is STUBBED here (no image/audio codecs in this
  * container): `fakeDecode` derives deterministic "pixel stats" from the
  * bytes. Everything around it — schema, per-partition batching, null
  * handling, feature schema — is the real production shape; swapping the
  * stub for libjpeg/ffmpeg is a one-function change.
  */
object Multimodal {

  /** Synthesize an opaque binary payload column from a text column
    * (stand-in for real image bytes; md5-derived so oracles reproduce it).
    */
  def withPayload(df: DataFrame, text: String = "text"): DataFrame =
    df.withColumn("payload", unhex(md5(col(text))))

  /** Typed metadata extracted without decoding: byte length, magic
    * prefix, and header-derived (stubbed) dimensions — all computable by
    * any engine from the same bytes.
    */
  def metadata(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")))
      .withColumn("magic", lower(hex(substring(col("payload"), 1, 4))))
      .withColumn("width", lit(64) + conv(substring(md5(col("text")), 1, 2), 16, 10).cast("long") % 192)
      .withColumn("height", lit(64) + conv(substring(md5(col("text")), 3, 2), 16, 10).cast("long") % 192)
      .withColumn("channels", lit(1) + conv(substring(md5(col("text")), 5, 1), 16, 10).cast("long") % 3)

  /** STUB frame sampling: treat the payload as an opaque video and emit
    * `k` deterministically-sampled frames per document (the frame payload
    * is an md5 chain off the container bytes, standing in for demuxed
    * frames). The Spark-side shape is the production one: explode to one
    * row per (doc, frame), then batched mapPartitions feature extraction
    * with per-partition decoder init. Swap the chain for an ffmpeg seek +
    * decode and nothing else changes.
    */
  def frameSample(df: DataFrame, k: Int = 4, id: String = "doc_id"): DataFrame = {
    val frames = df
      .withColumn("frame_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("frame_payload", unhex(md5(concat(hex(col("payload")), lit("_"), col("frame_idx")))))
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("frame_idx", IntegerType),
      StructField("frame_mean", DoubleType), StructField("frame_std", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    frames.select(col(id), col("frame_idx"), col("frame_payload")).mapPartitions { rows =>
      // per-partition init happens HERE (demuxer/codec handle)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        val n = bytes.length
        var s = 0.0; var s2 = 0.0
        bytes.foreach { b => val v = (b & 0xff).toDouble; s += v; s2 += v * v }
        val mean = s / n
        Row(r.getLong(0), r.getInt(1), mean, math.sqrt(math.max(s2 / n - mean * mean, 0)))
      }
    }(enc)
  }

  /** STUB resize: aspect-preserving fit of the (stub) decoded dimensions
    * into a `boxW`×`boxH` box, never upscaling — the geometry every real
    * resize stage computes — plus the box-filter invariant that the
    * resampled byte mean equals the source mean.
    */
  def resize(df: DataFrame, boxW: Int = 128, boxH: Int = 128): DataFrame =
    df.withColumn("scale",
        least(lit(1.0), least(lit(boxW.toDouble) / col("width"), lit(boxH.toDouble) / col("height"))))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("long"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("long"))

  /** STUB decode: deterministic byte statistics standing in for decoded
    * pixel features. Real deployments replace the body with a codec call;
    * the mapPartitions batching (one codec init per partition, not per
    * row) is the part that matters at scale.
    */
  /** Blockhash-style perceptual fingerprint over the decoded payload:
    * bit i set iff byte i exceeds the payload's mean byte — the
    * mean-threshold step every blockhash/aHash variant shares, over the
    * stub decode's byte stream (a real deployment swaps the md5-chain
    * payload for decoded pixel blocks; the fingerprint + blocking
    * plumbing is unchanged). Same mapPartitions shape as
    * [[decodeFeatures]]: per-partition decoder init, one pass per doc.
    */
  def phash(df: DataFrame, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("phash", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val idv = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        var s = 0.0
        bytes.foreach { b => s += (b & 0xff).toDouble }
        val mean = s / bytes.length
        var h = 0L
        var i = 0
        while (i < bytes.length && i < 64) {
          if ((bytes(i) & 0xff).toDouble > mean) h |= (1L << i)
          i += 1
        }
        Row(idv, h)
      }
    }(enc)
  }

  def decodeFeatures(df: DataFrame, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("byte_mean", DoubleType),
      StructField("byte_std", DoubleType), StructField("byte_entropy", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      // per-partition init happens HERE (codec handle, model weights, …)
      rows.map { r =>
        val idv = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = bytes.length
        var s = 0.0; var s2 = 0.0
        val hist = new Array[Int](256)
        bytes.foreach { b => val v = (b & 0xff).toDouble; s += v; s2 += v * v; hist(b & 0xff) += 1 }
        val mean = s / n
        val std = math.sqrt(math.max(s2 / n - mean * mean, 0))
        var h = 0.0
        hist.foreach { c => if (c > 0) { val p = c.toDouble / n; h -= p * math.log(p) / math.log(2) } }
        Row(idv, mean, std, h)
      }
    }(enc)
  }
}

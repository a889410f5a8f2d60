package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media travel as opaque `binary` columns
  * with typed metadata alongside. The pattern at 100 TB:
  *
  *   raw bytes (binary) ──mapPartitions (batched)──► decoded features
  *
  * The DECODE path is real: [[decodeBmp]] parses genuine Windows-BMP
  * containers (header offsets, 24-bpp stride padding, bottom-up rows,
  * round 10), [[decodeWav]] walks real RIFF/WAVE chunk lists (16-bit
  * mono PCM, unknown chunks skipped, round 10), and — round 11 —
  * [[decodeFrames]] demuxes a RIFF multi-frame container feeding
  * [[frameSampleBmp]]'s even-stride frame sampling and [[phashBmp]]'s
  * 8×8-grid-luma aHash, both computed from DECODED PIXELS. All pure-JVM
  * public formats, no codec deps, certified through the DuckDB gate
  * because the synthesized pixel/PCM content is an md5 chain the oracle
  * can replay without a parser — while the Spark side recovers it only
  * by honoring the real container layout.
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

  /** REAL frame sampling (round-11 de-stub): the payload is a genuine
    * RIFF multi-frame container ([[encodeFrames]]: form `GBVI`, an
    * unknown odd-sized LIST chunk the demuxer must skip WITH the RIFF
    * pad rule, then one `fram` chunk per frame, each holding a complete
    * 24-bpp BMP). [[decodeFrames]] demuxes by walking the chunk list,
    * `k` frames are sampled evenly over the recovered frame count
    * (idx = i·n/k — the constant-stride seek every video sampler does),
    * and per-frame stats come from [[decodeBmp]]'s DECODED PIXELS via
    * exact integer sums. A demux bug — LIST not skipped, pad rule
    * dropped, frame boundaries wrong, sample index off — shifts n_frames
    * or the stats and fails the hash gate. Batched mapPartitions with
    * per-partition decoder init, zero exchanges, scale axis = #docs.
    */
  def frameSampleBmp(df: DataFrame, k: Int = 4, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("n_frames", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_mean", DoubleType), StructField("frame_std", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val idv = r.getLong(0)
        decodeFrames(r.getAs[Array[Byte]](1)).toSeq.flatMap { frames =>
          val n = frames.length
          // All-or-nothing, matching the container decoders' contract: a
          // single undecodable sampled frame drops the whole doc (no
          // partial row sets that would silently diverge from the
          // oracle's fixed k-rows-per-doc shape).
          val sampled = (0 until k).map { i =>
            val idx = i * n / k
            decodeBmp(frames(idx)).map { case (_, _, px) =>
              var s = 0L; var s2 = 0L
              px.foreach { b => val v = (b & 0xff).toLong; s += v; s2 += v * v }
              val mean = s.toDouble / px.length
              Row(idv, n.toLong, idx,
                mean, math.sqrt(math.max(s2.toDouble / px.length - mean * mean, 0.0)))
            }
          }
          if (sampled.forall(_.isDefined)) sampled.map(_.get) else Seq.empty
        }
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

  /** REAL aHash perceptual fingerprint (round-11 de-stub): decode the
    * BMP payload, sample an 8×8 luma grid by nearest-pixel downscale
    * (cell (r,c) → pixel (r·h/8, c·w/8) — the resize step every
    * aHash/blockhash variant runs), then set bit r·8+c iff the cell's
    * BT.601 integer luma (299R+587G+114B, milli-units) exceeds the grid
    * mean. The threshold compares 64·luma > Σluma in EXACT integer
    * arithmetic, so both engines derive identical bits from identical
    * decoded pixels; a decode or grid bug flips bits and fails the hash
    * gate. Same batched mapPartitions shape as [[decodeBmpFeatures]].
    */
  def phashBmp(df: DataFrame, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("phash", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val idv = r.getLong(0)
        decodeBmp(r.getAs[Array[Byte]](1)).map { case (w, h, px) =>
          val luma = new Array[Long](64)
          var sum = 0L
          var cell = 0
          while (cell < 64) {
            val p = (cell / 8 * h / 8) * w + (cell % 8 * w / 8)
            luma(cell) = 299L * (px(3 * p + 2) & 0xff) +
              587L * (px(3 * p + 1) & 0xff) + 114L * (px(3 * p) & 0xff)
            sum += luma(cell)
            cell += 1
          }
          var hsh = 0L
          cell = 0
          while (cell < 64) {
            if (64L * luma(cell) > sum) hsh |= (1L << cell)
            cell += 1
          }
          Row(idv, hsh)
        }
      }
    }(enc)
  }

  /** SHARED LITERAL: the visual near-dup Hamming radius — interpolated
    * into the q_multimodal_neardup oracle (pigeonhole over the four
    * 64-bit words needs radius < chunk count). */
  val PhashMaxHamming = 3

  /** 256-bit aHash (16×16 luma grid, four 64-bit words) — the
    * width-adaptive fingerprint for Hamming-block near-dup at corpus
    * scale. [[phashBmp]]'s 64-bit hash forces 4×16-bit pigeonhole chunks
    * (2¹⁶ buckets → Θ(n²/65536) candidates — the q_dedup_simhash defect
    * on the visual axis); 256 bits make each chunk a FULL 64-bit word,
    * so random-pair chunk collisions are ~n²/2⁶⁴: negligible at any
    * achievable corpus. Same exact-integer threshold (256·luma > Σluma),
    * same nearest-pixel grid sampling (cell (r,c) → pixel
    * (r·h/16, c·w/16)), bit r·16+c in word (r·16+c)/64.
    */
  def phash256Bmp(df: DataFrame, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("ph0", LongType),
      StructField("ph1", LongType), StructField("ph2", LongType),
      StructField("ph3", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val idv = r.getLong(0)
        decodeBmp(r.getAs[Array[Byte]](1)).map { case (w, h, px) =>
          val luma = new Array[Long](256)
          var sum = 0L
          var cell = 0
          while (cell < 256) {
            val p = (cell / 16 * h / 16) * w + (cell % 16 * w / 16)
            luma(cell) = 299L * (px(3 * p + 2) & 0xff) +
              587L * (px(3 * p + 1) & 0xff) + 114L * (px(3 * p) & 0xff)
            sum += luma(cell)
            cell += 1
          }
          val words = new Array[Long](4)
          cell = 0
          while (cell < 256) {
            if (256L * luma(cell) > sum) words(cell / 64) |= (1L << (cell % 64))
            cell += 1
          }
          Row(idv, words(0), words(1), words(2), words(3))
        }
      }
    }(enc)
  }

  // ── REAL container codecs (round-10 de-stub; closes the one `weak`
  // component carried since r2) ─────────────────────────────────────────
  // The synthesized payloads are genuine Windows-BMP (BITMAPFILEHEADER +
  // BITMAPINFOHEADER, 24 bpp BI_RGB, 4-byte-padded bottom-up rows) and
  // RIFF/WAVE (fmt + an unknown LIST chunk the parser must SKIP + data,
  // 16-bit mono PCM) files — the pixel/PCM content is an md5 chain so
  // the DuckDB oracle reproduces the expected statistics WITHOUT a
  // parser, while the Spark side recovers them only by honoring the real
  // layout (magic, header offsets, stride padding, bottom-up row order,
  // chunk traversal). A decoder bug — padding bytes included, rows
  // misordered, chunk skipped wrong — shifts the stats and fails the
  // hash gate.

  private def md5Bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
  private def md5Hex(s: String): String =
    md5Bytes(s).map("%02x".format(_)).mkString

  /** Deterministic byte chain: md5(seed + "_" + tag + k) digests
    * concatenated and truncated to n — the oracle's
    * ('0x' || substr(md5(...), (p%16)*2+1, 2)) replays it byte for byte. */
  private def chain(seed: String, tag: String, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0; var k = 0
    while (off < n) {
      val d = md5Bytes(seed + "_" + tag + k)
      val m = math.min(16, n - off)
      System.arraycopy(d, 0, out, off, m)
      off += m; k += 1
    }
    out
  }

  /** Encode one real 24-bpp BMP: dimensions 4..8 × 3..6 from the text's
    * md5 (stride padding genuinely exercised for w ∉ {4, 8}), pixels =
    * the "_px" chain in row-major TOP-DOWN BGR order, stored bottom-up
    * as the format requires. */
  def encodeBmp(text: String): Array[Byte] = {
    val hx = md5Hex(text)
    val w = 4 + Integer.parseInt(hx.substring(0, 2), 16) % 5
    val h = 3 + Integer.parseInt(hx.substring(2, 4), 16) % 4
    val px = chain(text, "px", w * h * 3)
    val stride = ((w * 3 + 3) / 4) * 4
    val imgSize = stride * h
    val buf = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-array offset
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = h - 1
    while (r >= 0) { // bottom-up rows, zero padding to the 4-byte stride
      buf.put(px, r * w * 3, w * 3)
      var p = w * 3
      while (p < stride) { buf.put(0.toByte); p += 1 }
      r -= 1
    }
    buf.array()
  }

  /** Parse a 24-bpp uncompressed BMP: returns (width, height, pixel
    * bytes in row-major top-down BGR order) or None if the container is
    * not a BMP this decoder understands. Reads ONLY the header fields —
    * offset 10 pixel-array start, 18/22 dimensions, 28 bpp, 30
    * compression — and undoes stride padding + bottom-up storage. */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = bb.getInt(10)
    val w = bb.getInt(18); val h = bb.getInt(22)
    val planes = bb.getShort(26); val bpp = bb.getShort(28); val comp = bb.getInt(30)
    if (bb.getInt(14) < 40 || planes != 1 || bpp != 24 || comp != 0) return None
    if (w <= 0 || h <= 0 || w > 65536 || h > 65536) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > bytes.length) return None
    val px = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      System.arraycopy(bytes, off + (h - 1 - r) * stride, px, r * w * 3, w * 3)
      r += 1
    }
    Some((w, h, px))
  }

  /** Synthesize the BMP payload column (one real container per doc). */
  def withBmpPayload(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col(text)).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), encodeBmp(r.getString(1))))
    }(enc)
  }

  /** Decode BMP payloads → per-image features. Integer byte sums keep
    * the mean/std derivation exact on both engines; tl_luma is the
    * BT.601 integer-weighted luma of the TOP-LEFT pixel — an
    * order-sensitive probe that fails if rows are read top-down or
    * padding shifts the lattice. Same batched mapPartitions shape as
    * the stub it replaces (one decoder init per partition). */
  def decodeBmpFeatures(df: DataFrame, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("width", LongType),
      StructField("height", LongType), StructField("n_bytes", LongType),
      StructField("px_mean", DoubleType), StructField("px_std", DoubleType),
      StructField("tl_luma", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val idv = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        decodeBmp(bytes).map { case (w, h, px) =>
          val n = px.length
          var s = 0L; var s2 = 0L
          px.foreach { b => val v = (b & 0xff).toLong; s += v; s2 += v * v }
          val mean = s.toDouble / n
          val std = math.sqrt(math.max(s2.toDouble / n - mean * mean, 0.0))
          val luma = (299L * (px(2) & 0xff) + 587L * (px(1) & 0xff) + 114L * (px(0) & 0xff)).toDouble / 1000.0
          Row(idv, w.toLong, h.toLong, bytes.length.toLong, mean, std, luma)
        }
      }
    }(enc)
  }

  /** Encode one real RIFF multi-frame video-style container: form type
    * `GBVI`, an odd-sized LIST chunk FIRST (9 junk bytes — a correct
    * demuxer must skip it AND honor the RIFF odd-size pad rule, or every
    * later chunk boundary shifts by one), then 4..7 `fram` chunks (count
    * from the text's md5), each a complete [[encodeBmp]] BMP keyed
    * `text_f<i>` — the AVI `movi`/`00db` shape reduced to its public
    * essentials. */
  def encodeFrames(text: String): Array[Byte] = {
    val hx = md5Hex(text)
    val n = 4 + Integer.parseInt(hx.substring(6, 8), 16) % 4
    val frames = (0 until n).map(i => encodeBmp(text + "_f" + i))
    val junk = chain(text, "junk", 9)
    def padded(sz: Int) = sz + (sz & 1)
    val riffSize = 4 + (8 + padded(junk.length)) + frames.map(f => 8 + padded(f.length)).sum
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("GBVI".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk)
    if ((junk.length & 1) == 1) buf.put(0.toByte)
    frames.foreach { f =>
      buf.put("fram".getBytes("US-ASCII")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Demux a RIFF `GBVI` container by walking its chunk list (the same
    * traversal discipline as [[decodeWav]]: Long-widened bounds, odd
    * sizes padded, unknown chunks skipped): returns the `fram` chunk
    * payloads in stream order, or None for a broken container. */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "GBVI") return None
    // The header's declared RIFF size bounds the walk (bytes past it are
    // trailing garbage real demuxers ignore); a declared size overrunning
    // the buffer is a broken container.
    val riffSize = bb.getInt(4)
    if (riffSize < 4 || 8L + riffSize > bytes.length) return None
    val end = 8 + riffSize
    var pos = 12
    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0
    while (pos + 8 <= end) {
      val id = tag(pos); val sz = bb.getInt(pos + 4)
      if (sz < 0 || pos.toLong + 8 + sz > end) return None
      if (id == "fram") {
        frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)
        nFrames += 1
      } // unknown chunk (LIST here): skip
      pos += 8 + sz + (sz & 1) // RIFF pads odd-sized chunks
    }
    if (nFrames == 0) None else Some(frames.result())
  }

  /** Synthesize the multi-frame container payload column. */
  def withVideoPayload(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col(text)).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), encodeFrames(r.getString(1))))
    }(enc)
  }

  /** Encode one real RIFF/WAVE file: 16-bit mono PCM at 8 kHz, 8..16
    * samples from the "_pcm" chain (LE int16), with an unknown LIST
    * chunk BETWEEN fmt and data that a correct parser must skip. */
  def encodeWav(text: String): Array[Byte] = {
    val hx = md5Hex(text)
    val n = 8 + Integer.parseInt(hx.substring(4, 6), 16) % 9
    val pcm = chain(text, "pcm", n * 2)
    val junk = chain(text, "junk", 8)
    val dataSize = n * 2
    val riffSize = 4 + (8 + 16) + (8 + 8) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("LIST".getBytes("US-ASCII")).putInt(8).put(junk)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize).put(pcm)
    buf.array()
  }

  /** Parse a RIFF/WAVE container by walking its chunk list (odd sizes
    * padded per the RIFF rule, unknown chunks skipped): returns
    * (sampleRate, int16 samples) for 16-bit mono PCM, None otherwise. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // Same bound discipline as [[decodeFrames]]: the declared RIFF size
    // ends the walk; overrun of the buffer rejects the container.
    val riffSize = bb.getInt(4)
    if (riffSize < 4 || 8L + riffSize > bytes.length) return None
    val end = 8 + riffSize
    var pos = 12
    var rate = -1; var ok = false
    var samples: Array[Short] = null
    while (pos + 8 <= end) {
      val id = tag(pos); val sz = bb.getInt(pos + 4)
      // Long-widened bound: a crafted chunk size near Int.MaxValue would
      // wrap `pos + 8 + sz` negative and bypass the check (decodeBmp
      // already widens); the contract is None for broken containers.
      if (sz < 0 || pos.toLong + 8 + sz > end) return None
      id match {
        case "fmt " if sz >= 16 =>
          val fmt = bb.getShort(pos + 8); val ch = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22)
          ok = fmt == 1 && ch == 1 && bits == 16
        case "data" =>
          samples = Array.tabulate(sz / 2)(i => bb.getShort(pos + 8 + 2 * i))
        case _ => // unknown chunk (LIST here): skip
      }
      pos += 8 + sz + (sz & 1) // RIFF pads odd-sized chunks
    }
    if (ok && samples != null) Some((rate, samples)) else None
  }

  /** Synthesize the WAV payload column (one real container per doc). */
  def withWavPayload(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col(text)).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), encodeWav(r.getString(1))))
    }(enc)
  }

  /** Decode WAV payloads → per-clip features (exact integer sums → mean
    * / RMS / peak, engine-identical). */
  def decodeWavFeatures(df: DataFrame, id: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType), StructField("sample_rate", LongType),
      StructField("n_samples", LongType), StructField("pcm_mean", DoubleType),
      StructField("pcm_rms", DoubleType), StructField("pcm_peak", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(id), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val idv = r.getLong(0)
        decodeWav(r.getAs[Array[Byte]](1)).map { case (rate, xs) =>
          val n = xs.length
          var s = 0L; var s2 = 0L; var pk = 0L
          xs.foreach { v => s += v; s2 += v.toLong * v; pk = math.max(pk, math.abs(v.toLong)) }
          Row(idv, rate.toLong, n.toLong, s.toDouble / n,
            math.sqrt(s2.toDouble / n), pk)
        }
      }
    }(enc)
  }
}

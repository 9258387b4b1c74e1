package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob: modality-tagged opaque bytes + typed metadata. */
final case class MediaRow(
    id: Long,
    modality: String,
    bytes: Array[Byte],
    meta: Map[String, String])

/** Extracted features for one blob. */
final case class MediaFeatures(
    id: Long,
    modality: String,
    nBytes: Int,
    sha256: String,
    featureDim: Int,
    featureNorm: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-wise feature extraction over
  * `mapPartitions`.
  *
  * The DECODE STEP IS A STUB: no image/audio codec libraries exist in
  * this container, so `fakeDecode` derives a deterministic 64-dim
  * "feature vector" from a byte histogram. Everything around it — the
  * binary schema, partition-preserving batch loop, batch shape, and the
  * feature output schema — is the real Spark plumbing a genuine decoder
  * (JNI codec / ONNX runtime) would drop into.
  */
object Multimodal {

  /** Ingest a (doc_id, text) table as opaque UTF-8 blobs (stand-in for
    * real media bytes; keeps the binary-column path honest end-to-end). */
  def ingest(docs: DataFrame, modality: String = "text"): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      lit(modality).as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      map(lit("codec"), lit("utf-8"), lit("source"), lit("documents"))
        .as("meta"))
      .as[MediaRow]
  }

  /** STUB decoder: byte histogram → 64 coarse bins, L2-normalized.
    * Deterministic; replace with a real codec at deployment. */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](64)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 2) += 1f; i += 1 }
    var norm = 0.0
    var j = 0
    while (j < 64) { norm += hist(j).toDouble * hist(j); j += 1 }
    val n = math.sqrt(norm)
    if (n > 0) { j = 0; while (j < 64) { hist(j) = (hist(j) / n).toFloat; j += 1 } }
    hist
  }

  /** Wrap each payload in a REAL PNG container layout (8-byte
    * signature + IHDR chunk + one data chunk): the planted dimensions
    * derive deterministically from the payload (width = nBytes mod
    * 1024 + 16, height = nBytes mod 767 + 9), so an oracle can compute
    * the ground truth from the source row while the Spark side must
    * recover it by PARSING BYTES. Chunk CRCs are zeroed (honest stub —
    * [[parseContainerHeader]] does not verify CRCs, the one part of
    * container handling that needs no codec is the one implemented).
    *
    * This is the non-stub half of image decode: container/header
    * parsing is pure byte arithmetic and fully testable here; only
    * pixel decode needs codec libraries (see [[fakeDecode]]). */
  def ingestPng(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = Option(text).getOrElse("").getBytes("UTF-8")
        val width = payload.length % 1024 + 16
        val height = payload.length % 767 + 9
        val bb = java.nio.ByteBuffer.allocate(8 + 25 + 12 + payload.length)
        bb.put(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
        bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
          .putInt(width).putInt(height)
          .put(8.toByte)  // bit depth
          .put(2.toByte)  // color type: truecolor
          .put(0.toByte).put(0.toByte).put(0.toByte) // comp/filter/interlace
          .putInt(0)      // IHDR CRC (not computed)
        bb.putInt(payload.length).put("IDAT".getBytes("US-ASCII"))
          .put(payload).putInt(0)
        MediaRow(id, "image", bb.array(),
          Map("codec" -> "png-container", "source" -> "documents"))
      }
  }

  /** Parse the container header from the BINARY column with built-in
    * byte functions only (substring + hex + conv — whole-stage
    * codegen, no UDF): (id, width, height, bit_depth, color_type,
    * n_payload). Big-endian int32 fields decode as base-16 conv over
    * the hex of a 4-byte slice. */
  def parseContainerHeader(media: Dataset[MediaRow]): DataFrame = {
    def be32(off1: Int) = // 1-based substring offset
      expr(s"cast(conv(hex(substring(bytes, $off1, 4)), 16, 10) as bigint)")
    def be8(off1: Int) =
      expr(s"cast(conv(hex(substring(bytes, $off1, 1)), 16, 10) as bigint)")
    media.toDF()
      .select(col("id"),
        be32(17).as("width"),
        be32(21).as("height"),
        be8(25).as("bit_depth"),
        be8(26).as("color_type"),
        be32(34).as("n_payload"))
  }

  /** Wrap each payload in a REAL RIFF/WAVE container layout (the audio
    * sibling of [[ingestPng]], closing more of the multimodal stub
    * without codec libraries — container parsing needs none): `RIFF`
    * header + canonical 16-byte PCM `fmt ` chunk + `data` chunk
    * holding the payload. WAV fields are LITTLE-endian (PNG's are
    * big-endian), so the parse side genuinely exercises the other
    * byte order. Planted acoustics derive deterministically from the
    * payload: channels = nBytes mod 2 + 1, sampleRate = nBytes mod
    * 32000 + 8000, bitsPerSample = 16 — an oracle recomputes them from
    * the source row while the Spark side must recover them from the
    * bytes. */
  def ingestWav(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = Option(text).getOrElse("").getBytes("UTF-8")
        val n = payload.length
        val channels = n % 2 + 1
        val sampleRate = n % 32000 + 8000
        val bits = 16
        val blockAlign = channels * bits / 8
        val byteRate = sampleRate * blockAlign
        val bb = java.nio.ByteBuffer.allocate(44 + n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1.toShort)               // PCM
          .putShort(channels.toShort)
          .putInt(sampleRate)
          .putInt(byteRate)
          .putShort(blockAlign.toShort)
          .putShort(bits.toShort)
        bb.put("data".getBytes("US-ASCII")).putInt(n).put(payload)
        MediaRow(id, "audio", bb.array(),
          Map("codec" -> "wav-container", "source" -> "documents"))
      }
  }

  /** Parse the RIFF/WAVE header with built-in byte functions only
    * (whole-stage codegen, no UDF): (id, fmt_tag, channels,
    * sample_rate, byte_rate, block_align, bits_per_sample, data_len).
    * Little-endian ints decode as a base-256 sum of single-byte
    * conv() terms — `substring` is 1-based. */
  def parseWavHeader(media: Dataset[MediaRow]): DataFrame = {
    def u8(off1: Int) =
      expr(s"cast(conv(hex(substring(bytes, $off1, 1)), 16, 10) as bigint)")
    def le16(off1: Int) = u8(off1) + u8(off1 + 1) * lit(256L)
    def le32(off1: Int) =
      u8(off1) + u8(off1 + 1) * lit(256L) +
        u8(off1 + 2) * lit(65536L) + u8(off1 + 3) * lit(16777216L)
    media.toDF()
      .select(col("id"),
        le16(21).as("fmt_tag"),
        le16(23).as("channels"),
        le32(25).as("sample_rate"),
        le32(29).as("byte_rate"),
        le16(33).as("block_align"),
        le16(35).as("bits_per_sample"),
        le32(41).as("data_len"))
  }

  /** Wrap each payload in a PNG container whose IDAT is a REAL zlib
    * stream (X178 — the round-5 shrink of the decode stub:
    * `java.util.zip.Deflater/Inflater` ARE in the JDK, so actual
    * DEFLATE round-trips need no external codec). Grayscale 8-bit
    * (color type 0), width = nBytes mod 256 + 16, height =
    * ceil(nBytes / width) scanlines; the compressed stream is the PNG
    * scanline layout — each row a 0x00 (None) filter byte + up to
    * `width` payload bytes. Deviation from strict PNG, documented:
    * the last row may be SHORT when width ∤ nBytes (a real encoder
    * pads the final scanline; padding would break the
    * payload == pixel-bytes invariant the oracle twin needs). Chunk
    * CRCs remain zeroed as in [[ingestPng]].
    *
    * What stays genuinely stubbed after this: JPEG/H.264-class
    * entropy+transform codecs, which have no JDK implementation. */
  def ingestPngZlib(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = Option(text).getOrElse("").getBytes("UTF-8")
        val n = payload.length
        val width = n % 256 + 16
        val height = (n + width - 1) / width
        val scan = new Array[Byte](n + height) // one filter byte per row
        var row = 0
        while (row < height) {
          val off = row * width
          val len = math.min(width, n - off)
          scan(off + row) = 0 // filter: None
          System.arraycopy(payload, off, scan, off + row + 1, len)
          row += 1
        }
        val deflater = new java.util.zip.Deflater()
        deflater.setInput(scan); deflater.finish()
        val buf = new java.io.ByteArrayOutputStream(n / 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
        deflater.end()
        val idat = buf.toByteArray
        val bb = java.nio.ByteBuffer.allocate(8 + 25 + 12 + idat.length)
        bb.put(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
        bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
          .putInt(width).putInt(height)
          .put(8.toByte)  // bit depth
          .put(0.toByte)  // color type: grayscale
          .put(0.toByte).put(0.toByte).put(0.toByte) // comp/filter/interlace
          .putInt(0)      // IHDR CRC (not computed)
        bb.putInt(idat.length).put("IDAT".getBytes("US-ASCII"))
          .put(idat).putInt(0)
        MediaRow(id, "image", bb.array(),
          Map("codec" -> "png-zlib", "source" -> "documents"))
      }
  }

  /** REAL pixel decode of [[ingestPngZlib]] containers: parse the IHDR
    * dims and IDAT extent from the bytes, INFLATE the zlib stream
    * (`java.util.zip.Inflater` — actual DEFLATE decoding, not a stub),
    * strip + verify the per-scanline filter bytes, and emit pixel
    * stats: (id, width, height, n_pixel_bytes, pixel_sha256). The
    * oracle twin recomputes every column from the planted SOURCE row
    * (dims from octet_length, sha256 of the text), so a hash match
    * proves the whole container→inflate→defilter path bit-exact.
    *
    * Scale: one narrow typed pass, no shuffle; inflation is
    * streaming (8 KB chunks), memory bounded by one blob. */
  def decodePngPixels(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val b = m.bytes
      def be32(off: Int): Int =
        ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      require(b.length >= 41, s"truncated container: ${b.length} bytes")
      val width = be32(16)
      val height = be32(20)
      val idatLen = be32(33)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(b, 41, idatLen)
      val out = new java.io.ByteArrayOutputStream(width * height + height + 16)
      val tmp = new Array[Byte](8192)
      while (!inflater.finished()) {
        val k = inflater.inflate(tmp)
        if (k > 0) out.write(tmp, 0, k)
        else if (!inflater.finished() &&
          (inflater.needsInput() || inflater.needsDictionary()))
          throw new IllegalArgumentException("truncated zlib stream")
      }
      inflater.end()
      val scan = out.toByteArray
      // defilter: drop the leading filter byte of each scanline
      // (verify filter == 0 — the only type the planted encoder emits)
      val pixels = new Array[Byte](scan.length - height)
      var row = 0
      var src = 0
      var dst = 0
      while (row < height) {
        require(scan(src) == 0, s"unexpected filter type ${scan(src)}")
        val len = math.min(width, pixels.length - dst)
        System.arraycopy(scan, src + 1, pixels, dst, len)
        src += 1 + len; dst += len; row += 1
      }
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(pixels)
      (m.id, width.toLong, height.toLong, pixels.length.toLong,
        digest.map(x => f"${x & 0xff}%02x").mkString)
    }.toDF("id", "width", "height", "n_pixel_bytes", "pixel_sha256")
  }

  /** PCM sample statistics over the `data` chunk of [[ingestWav]]
    * containers (X179 — the audio sibling of [[decodePngPixels]]:
    * sample decode is pure byte arithmetic, no codec lib needed):
    * interpret the payload as 16-bit little-endian signed PCM and
    * report (id, n_samples, sum_pcm, min_pcm, max_pcm), exact Longs.
    * A trailing odd byte is ignored (n_samples = ⌊len/2⌋ — mirrored in
    * the twin). Empty payloads pin (0, 0, 0, 0). Narrow typed pass,
    * no shuffle. */
  def wavPcmStats(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val b = m.bytes
      def le32(off: Int): Int =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      require(b.length >= 44, s"truncated container: ${b.length} bytes")
      val dataLen = le32(40)
      val nSamples = dataLen / 2
      var sum = 0L
      var min = 0L
      var max = 0L
      var i = 0
      while (i < nSamples) {
        val off = 44 + 2 * i
        val s = ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toLong
        if (i == 0) { min = s; max = s }
        else { if (s < min) min = s; if (s > max) max = s }
        sum += s
        i += 1
      }
      (m.id, nSamples.toLong, sum, min, max)
    }.toDF("id", "n_samples", "sum_pcm", "min_pcm", "max_pcm")
  }

  /** Batch-wise feature extraction. The partition iterator is consumed in
    * `batchSize` groups — the shape a vectorized decoder (GPU batch, C
    * library call) needs — while remaining lazy per partition. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` in one vectorized call
        batch.iterator.map { m =>
          val feat = fakeDecode(m.bytes)
          val digest = java.security.MessageDigest.getInstance("SHA-256").digest(m.bytes)
          val hex = digest.map(b => f"${b & 0xff}%02x").mkString
          var norm = 0.0
          feat.foreach(f => norm += f.toDouble * f)
          MediaFeatures(m.id, m.modality, m.bytes.length, hex, feat.length,
            math.sqrt(norm))
        }
      }
    }
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY §7.4): media as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, batch-wise partition
  * processing, deterministic partitioning by media id — while the codec
  * itself is a clearly-marked STUB (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the bytes. Swapping in a real codec changes only the body of the
  * per-partition function, not the pipeline shape: partitions stream
  * row batches through the decoder exactly as a Pandas-UDF/`mapInPandas`
  * stage would, so executor memory is bounded by batch size, not
  * partition size.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Attach a media binary column + metadata struct. In production the
    * binary comes from `spark.read.format("binaryFile")` or a blob-store
    * manifest; here any byte-bearing column works.
    */
  def withMedia(df: DataFrame, bytesCol: String, mediaType: String): DataFrame =
    df.withColumn("media", col(bytesCol).cast(BinaryType))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        length(col("media")).cast(LongType).as("n_bytes"),
        md5(col("media")).as("checksum")))

  final case class MediaFeatures(width: Int, height: Int, channels: Int,
                                 durationMs: Long)

  /** STUB decoder — stands in for a real audio/video decode (no media
    * libraries beyond the JDK in this environment). Deterministic pure
    * function of the bytes so tests are stable; a real implementation
    * replaces only this function.
    */
  def decodeStub(bytes: Array[Byte], mediaType: String): MediaFeatures = {
    // ??? real av codec goes here (e.g. ffmpeg bindings)
    val h = if (bytes == null) 0L
      else bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    val pos = h & Long.MaxValue
    MediaFeatures(
      width = (pos % 1920).toInt + 1,
      height = ((pos / 1920) % 1080).toInt + 1,
      channels = if (mediaType == "audio") 2 else 3,
      durationMs = if (mediaType == "image") 0L else pos % 600000L)
  }

  /** REAL image decode via pure-JVM `javax.imageio` for any format the
    * JDK registry handles (PNG, JPEG, GIF, BMP). Header-only: the
    * reader reports width/height/color-model WITHOUT decoding pixels,
    * so cost per blob is a few KB of header parse, not a full decode —
    * the shape that survives a 100 TB media column. Returns None for
    * bytes no registered reader recognizes (caller falls back to the
    * stub).
    */
  def decodeImage(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 8) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val channels = {
          val types = reader.getImageTypes(0)
          if (types.hasNext) types.next().getColorModel.getNumComponents else 3
        }
        Some(MediaFeatures(
          width = reader.getWidth(0),
          height = reader.getHeight(0),
          channels = channels,
          durationMs = 0L))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Deterministic solid-color PNG fixture — REAL codec bytes (JVM
    * ImageIO PNG encoder), used to drive the real [[decodeImage]] path
    * under an exact oracle: a verifier that knows only (w, h) can
    * predict the decoded dimensions, so encode→header-decode round-
    * trips become hash-checkable end-to-end. Tiny by construction
    * (fixture dims, not production media).
    */
  def pngFixture(w: Int, h: Int, rgb: Int = 0x336699): Array[Byte] = {
    require(w >= 1 && h >= 1, "fixture dims must be >= 1")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL audio decode for RIFF/WAVE (PCM WAV) — a pure-JVM header
    * parse, no codec library needed: walk the RIFF chunk list, read
    * channels/sample-rate/byte-rate from the `fmt ` chunk and the
    * payload size from the `data` chunk header, and report
    * duration_ms = dataBytes·1000 / byteRate. Header-only like
    * [[decodeImage]] — cost per blob is a few dozen bytes of parse,
    * never a sample decode, the shape that survives a 100 TB audio
    * column. None when the bytes are not a parseable WAV (caller
    * falls back to the stub). Width/height are 0 (not meaningful for
    * audio); channels is the real channel count.
    */
  def decodeWav(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | (bytes(off + 1) & 0xff) << 8
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var off = 12
    var channels = 0
    var byteRate = 0L
    var dataBytes = -1L
    while (off + 8 <= bytes.length && (channels == 0 || dataBytes < 0)) {
      val ckId = ascii(off, 4)
      val ckSize = u32(off + 4)
      if (ckId == "fmt " && off + 8 + 16 <= bytes.length) {
        channels = u16(off + 10)
        byteRate = u32(off + 16)
      } else if (ckId == "data") {
        // size from the header — a truncated blob still reports the
        // declared payload; a streaming writer's 0xFFFFFFFF
        // placeholder falls back to the bytes actually present
        dataBytes =
          if (ckSize == 0xffffffffL) (bytes.length - off - 8).toLong
          else ckSize
      }
      if (channels == 0 || dataBytes < 0) {
        // a declared chunk size that can't fit an Int would wrap the
        // offset (negative step = infinite loop) — bail before advancing
        if (ckSize > Int.MaxValue - 16) return None
        off += 8 + ckSize.toInt + (ckSize.toInt & 1) // word-aligned chunks
      }
    }
    if (channels <= 0 || byteRate <= 0 || dataBytes < 0) None
    else Some(MediaFeatures(width = 0, height = 0, channels = channels,
      durationMs = dataBytes * 1000L / byteRate))
  }

  /** Deterministic PCM WAV fixture — REAL RIFF/WAVE bytes (16-bit
    * silence) with exactly `nSamples` frames, so a verifier that knows
    * only (nSamples, sampleRate) predicts the decoded duration:
    * encode→header-decode round-trips become checkable end-to-end,
    * mirroring [[pngFixture]].
    */
  def wavFixture(nSamples: Int, sampleRate: Int = 8000,
                 channels: Int = 1): Array[Byte] = {
    require(nSamples >= 0 && sampleRate >= 1 && channels >= 1)
    val dataBytes = nSamples * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  /** Decode dispatch: real image decode when the bytes ARE a readable
    * image (sniffed by the ImageIO registry, independent of the declared
    * media_type — declared metadata lies at corpus scale), real WAV
    * header decode when they are RIFF/WAVE audio, stub otherwise
    * (remaining A/V containers).
    */
  def decode(bytes: Array[Byte], mediaType: String): MediaFeatures =
    decodeImage(bytes)
      .orElse(decodeWav(bytes))
      .getOrElse(decodeStub(bytes, mediaType))

  /** Decode/feature-extract stage: batch-wise over partitions (the
    * `mapInPandas` shape — bounded memory, codec initialized once per
    * partition, rows streamed through).
    */
  def extractFeatures(df: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    // external Rows carry no nullability guarantees — relax the schema
    def relax(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = relax(f.dataType), nullable = true)))
      case a: ArrayType => a.copy(elementType = relax(a.elementType), containsNull = true)
      case other => other
    }
    val outSchema = relax(inSchema
      .add("width", IntegerType).add("height", IntegerType)
      .add("channels", IntegerType).add("duration_ms", LongType))
      .asInstanceOf[StructType]
    val mediaIdx = inSchema.fieldIndex("media")
    val metaIdx = inSchema.fieldIndex("media_meta")
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition init of the codec happens here
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.get(mediaIdx).asInstanceOf[Array[Byte]]
          val mtype = r.getStruct(metaIdx).getString(0)
          val f = decode(bytes, mtype)
          Row.fromSeq(r.toSeq ++ Seq[Any](f.width, f.height, f.channels, f.durationMs))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame-sample: take every `stride`-th byte-window of
    * the blob as a "frame" (stub for video frame extraction); real
    * decoders swap the slicing for codec calls, the explode shape stays.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    df.select(col("*"),
      posexplode(expr(
        s"transform(sequence(0, greatest(cast(length(media) / ($frameBytes * $stride) as int) - 1, 0)), " +
          s"i -> substring(media, i * $frameBytes * $stride + 1, $frameBytes))"))
        .as(Seq("frame_no", "frame_bytes")))

  /** Resize stub: truncate/pad the blob to a target byte budget —
    * placeholder for a real resample keeping the column contract
    * (binary in, binary out, metadata updated).
    */
  def resizeStub(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("media", expr(s"substring(media, 1, $targetBytes)"))
      .withColumn("media_meta", struct(
        col("media_meta.media_type"),
        length(col("media")).cast(LongType).as("n_bytes"),
        md5(col("media")).as("checksum")))

  /** REAL single-image resize: full `javax.imageio` pixel decode,
    * DETERMINISTIC nearest-neighbor resample (pure integer source
    * indexing — no platform-dependent filtering kernels), PNG
    * re-encode. None when no registered reader accepts the bytes —
    * the caller falls back to the byte-budget stub, mirroring
    * [[decode]]'s dispatch.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val sx = (x.toLong * img.getWidth / w).toInt
            val sy = (y.toLong * img.getHeight / h).toInt
            out.setRGB(x, y, img.getRGB(sx, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Column-level real resize: every registry-readable image in the
    * `media` column is pixel-resampled to (targetW, targetH) and
    * re-encoded PNG; unreadable blobs keep the [[resizeStub]]
    * byte-budget semantics so the column contract never breaks on a
    * mixed-modality corpus. Per-partition row streaming like
    * [[extractFeatures]] — codec state is JVM-local, memory bounded
    * by one image at a time.
    */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int,
                   stubBytes: Int = 4096): DataFrame = {
    require(targetW >= 1 && targetH >= 1 && stubBytes >= 1)
    val spark = df.sparkSession
    val inSchema = df.schema
    val mediaIdx = inSchema.fieldIndex("media")
    val rdd = df.rdd.map { r =>
      val bytes = r.get(mediaIdx).asInstanceOf[Array[Byte]]
      val resized = resizeImage(bytes, targetW, targetH).getOrElse(
        if (bytes == null) Array.empty[Byte] else bytes.take(stubBytes))
      org.apache.spark.sql.Row.fromSeq(
        r.toSeq.updated(mediaIdx, resized))
    }
    spark.createDataFrame(rdd, inSchema)
      .withColumn("media_meta", struct(
        col("media_meta.media_type"),
        length(col("media")).cast(LongType).as("n_bytes"),
        md5(col("media")).as("checksum")))
  }

  /** STUB media embedder ??? — derives a deterministic unit-norm float
    * vector from the blob bytes (chunked polynomial hashes), standing in
    * for a real image/audio encoder. Output plugs directly into
    * VectorSearch (same array<float> contract as the embeddings table),
    * so media similarity search / near-dup runs on the identical path.
    */
  def embedStub(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim > 0)
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields :+ StructField("media_embedding",
        ArrayType(FloatType, containsNull = false), nullable = true))
    val mediaIdx = inSchema.fieldIndex("media")
    val rdd = df.rdd.map { r =>
      val bytes = r.get(mediaIdx).asInstanceOf[Array[Byte]]
      val v = new Array[Float](dim)
      if (bytes != null && bytes.nonEmpty) {
        // modular Horner per dim — bounded for arbitrarily large blobs
        // (naive float accumulation overflows past ~400 bytes), every
        // byte influences the result, values centered around 0
        val M = 1000003L
        val acc = new Array[Long](dim)
        var i = 0
        while (i < bytes.length) {
          val d = i % dim
          acc(d) = (acc(d) * 31 + (bytes(i) & 0xff)) % M
          i += 1
        }
        var j = 0
        var sq = 0.0
        while (j < dim) {
          val x = (acc(j) - M / 2).toDouble / M
          v(j) = x.toFloat
          sq += x * x
          j += 1
        }
        val norm = math.sqrt(sq)
        if (norm > 0) { j = 0; while (j < dim) { v(j) = (v(j) / norm).toFloat; j += 1 } }
      }
      Row.fromSeq(r.toSeq :+ v.toSeq)
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The multimodal join: text/metadata table ⋈ embedding table on the
    * shared id, media attached, struct-packed. Embeddings side is
    * usually the smaller (one row per doc) — broadcast if it fits,
    * else this is a co-partitioned shuffle join on the id.
    */
  def joinModalities(docs: DataFrame, docId: String,
                     emb: DataFrame, embId: String,
                     broadcastEmb: Boolean = false): DataFrame = {
    val e = emb.withColumnRenamed(embId, docId)
    docs.join(if (broadcastEmb) broadcast(e) else e, Seq(docId))
  }
}

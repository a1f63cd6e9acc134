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
  /** Parsed RIFF/WAVE layout: everything the fmt/data chunk headers
    * declare, plus where the PCM payload starts. `dataBytes` is the
    * DECLARED size (a truncated blob keeps its declared duration);
    * [[embedWavSpectral]] clamps to the bytes actually present.
    */
  final case class WavHeader(channels: Int, sampleRate: Long,
                             byteRate: Long, bitsPerSample: Int,
                             dataOff: Int, dataBytes: Long,
                             audioFormat: Int,
                             blockAlign: Int = 0,
                             samplesPerBlock: Int = 0,
                             factSamples: Long = -1L)

  /** The RIFF chunk walk shared by [[decodeWav]] (header features) and
    * [[embedWavSpectral]] (needs the PCM payload location too).
    */
  def parseWav(bytes: Array[Byte]): Option[WavHeader] = {
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
    var sampleRate = 0L
    var byteRate = 0L
    var bits = 0
    var audioFormat = 0
    var dataOff = -1
    var dataBytes = -1L
    var blockAlign = 0
    var samplesPerBlock = 0
    var factSamples = -1L
    while (off + 8 <= bytes.length && (channels == 0 || dataBytes < 0)) {
      val ckId = ascii(off, 4)
      val ckSize = u32(off + 4)
      if (ckId == "fmt " && off + 8 + 16 <= bytes.length) {
        // the format TAG decides whether the payload is raw PCM — a
        // compressed codec that happens to declare 16 bits must not be
        // decoded as samples. WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries
        // the real tag in the first two bytes of the SubFormat GUID at
        // payload offset 24 (after cbSize/validBits/channelMask).
        audioFormat = u16(off + 8)
        if (audioFormat == 0xFFFE && ckSize >= 26 &&
          off + 8 + 26 <= bytes.length)
          audioFormat = u16(off + 8 + 24)
        channels = u16(off + 10)
        sampleRate = u32(off + 12)
        byteRate = u32(off + 16)
        blockAlign = u16(off + 20)
        bits = u16(off + 22)
        // block-coded formats (IMA ADPCM) append wSamplesPerBlock
        // after cbSize — needed to bound the last block's nibbles
        if (ckSize >= 20 && off + 8 + 20 <= bytes.length)
          samplesPerBlock = u16(off + 26)
      } else if (ckId == "fact" && ckSize >= 4 &&
        off + 12 <= bytes.length) {
        // total decoded sample-frames — authoritative for compressed
        // payloads whose data size over-counts block padding
        factSamples = u32(off + 8)
      } else if (ckId == "data") {
        // size from the header — a truncated blob still reports the
        // declared payload; a streaming writer's 0xFFFFFFFF
        // placeholder falls back to the bytes actually present
        dataOff = off + 8
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
    else Some(WavHeader(channels, sampleRate, byteRate, bits, dataOff,
      dataBytes, audioFormat, blockAlign, samplesPerBlock, factSamples))
  }

  def decodeWav(bytes: Array[Byte]): Option[MediaFeatures] =
    parseWav(bytes).map(h => MediaFeatures(width = 0, height = 0,
      channels = h.channels, durationMs = h.dataBytes * 1000L / h.byteRate))

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

  /** REAL video decode for MP4/ISO-BMFF — a pure-JVM box walk, no
    * codec library: top-level boxes are `[size:u32 BE][type:4cc]`
    * (size==1 → 64-bit largesize), the `moov` box holds `mvhd`
    * (movie timescale + duration → duration_ms) and the first
    * `trak/tkhd` (presentation width/height as 16.16 fixed point).
    * Header-only like the image/WAV paths — the mdat payload is never
    * touched, so cost per blob is the moov walk, not a frame decode.
    * Sniffed by the leading `ftyp` box; None otherwise (caller falls
    * through to the stub). Channels report 0: audio layout lives in
    * the sample description, which is codec territory, not container
    * header territory.
    */
  def decodeMp4(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) << 24 | (bytes(off + 1) & 0xffL) << 16 |
        (bytes(off + 2) & 0xffL) << 8 | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long =
      (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (bytes(off + i) & 0xffL))
    def fourcc(off: Int): String =
      new String(bytes, off + 4, 4, "US-ASCII")
    // (start, end) exclusive payload bounds of each child box of the
    // region, with its type — shared by the top-level and moov walks
    def children(start: Int, end: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var off = start
        def hasNext: Boolean = off + 8 <= end
        def next(): (String, Int, Int) = {
          val size = u32(off)
          val tpe = fourcc(off)
          val (hdr, boxSize): (Int, Long) =
            if (size == 1L && off + 16 <= end) (16, u64(off + 8))
            else (8, size)
          if (boxSize < hdr || boxSize > end - off) {
            // malformed size: stop the walk (consume the rest)
            off = end
            ("", end, end)
          } else {
            val r = (tpe, off + hdr, off + boxSize.toInt)
            off += boxSize.toInt
            r
          }
        }
      }
    if (fourcc(0) != "ftyp") return None
    val moov = children(0, bytes.length).collectFirst {
      case ("moov", s, e) => (s, e)
    }.getOrElse(return None)
    var durationMs = -1L
    var w = 0
    var h = 0
    children(moov._1, moov._2).foreach {
      case ("mvhd", s, e) if e - s >= 20 =>
        val v = bytes(s) & 0xff
        // v1 layout: ver/flags 4 + creation 8 + modification 8 +
        // timescale 4 + duration 8 = 32 bytes minimum — reading the
        // u64 duration at +24 needs ALL of them present
        val (ts, dur) =
          if (v == 1 && e - s >= 32) (u32(s + 20), u64(s + 24))
          else if (v == 1) (0L, 0L) // truncated v1: unparseable, skip
          else (u32(s + 12), u32(s + 16))
        if (ts > 0) durationMs = dur * 1000L / ts
      case ("trak", s, e) if w == 0 =>
        children(s, e).foreach {
          case ("tkhd", ts, te) =>
            val v = bytes(ts) & 0xff
            val (wo, need) = if (v == 1) (88, 96) else (76, 84)
            if (te - ts >= need && w == 0) {
              // 16.16 fixed point → integer pixels
              w = (u32(ts + wo) >> 16).toInt
              h = (u32(ts + wo + 4) >> 16).toInt
            }
          case _ => ()
        }
      case _ => ()
    }
    if (durationMs < 0) None
    else Some(MediaFeatures(width = w, height = h, channels = 0,
      durationMs = durationMs))
  }

  /** Deterministic minimal MP4 fixture — REAL ISO-BMFF bytes
    * (ftyp + moov{mvhd v0 + trak{tkhd v0}}), with the movie duration
    * and track presentation size set from the arguments, so a
    * verifier that knows only (durationMs, w, h) predicts the decode:
    * the video analog of [[pngFixture]]/[[wavFixture]].
    */
  def mp4Fixture(durationMs: Long, w: Int, h: Int): Array[Byte] = {
    require(durationMs >= 0 && w >= 0 && h >= 0)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII"))
        .put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    // mvhd v0: ver/flags, creation, modification, timescale=1000,
    // duration(ms), rate 1.0, volume 1.0, reserved(10), unity
    // matrix(36), predefined(24), nextTrackId
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(1000)
        .putInt(durationMs.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort)
        .putInt(0).putInt(0)
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0))
      bb.putInt(2)
      bb.array()
    }
    // tkhd v0: ver/flags(enabled), creation, modification, trackId,
    // reserved, duration, reserved(8), layer/altgroup/volume/reserved,
    // matrix(36), width/height 16.16
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0x00000007).putInt(0).putInt(0).putInt(1).putInt(0)
        .putInt(durationMs.toInt).putInt(0).putInt(0)
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(0.toShort).putShort(0.toShort)
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.putInt(w << 16).putInt(h << 16)
      bb.array()
    }
    val moov = box("moov",
      box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    ftyp ++ moov
  }

  /** REAL Matroska/webm decode — a pure-JVM EBML element walk, the
    * container sibling of [[decodeMp4]]'s box walk: verify the EBML
    * magic (0x1A45DFA3) and an accepted DocType (`webm`/`matroska`;
    * absent DocType defaults to matroska per the EBML spec), then
    * read duration from Segment→Info (Duration float ticks ×
    * TimestampScale ns/tick, default scale 1,000,000 = ms ticks) and
    * the first video track's pixel dimensions from
    * Segment→Tracks→TrackEntry→Video. Header-only: element SIZES are
    * VINTs, so the walk skips Cluster payloads without touching them
    * — cost per blob is the few-hundred-byte header region, never a
    * frame decode, the 100 TB shape shared by every decoder here.
    * Unknown-size elements (the streaming-webm Segment) extend to the
    * enclosing bound, as the spec requires. None when the bytes are
    * not parseable EBML (caller falls back to the stub); channels is
    * 0 like MP4 (not meaningful for a video container header).
    */
  def decodeWebm(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 8) return None
    if ((bytes(0) & 0xff) != 0x1A || (bytes(1) & 0xff) != 0x45 ||
      (bytes(2) & 0xff) != 0xDF || (bytes(3) & 0xff) != 0xA3) return None
    try {
      // EBML IDs are read WITH their marker bits (the on-disk class
      // values, e.g. Segment = 0x18538067); sizes strip the marker
      def vintLen(b0: Int): Int = {
        var len = 1
        var mask = 0x80
        while (mask != 0 && (b0 & mask) == 0) { len += 1; mask >>= 1 }
        if (mask == 0) 9 else len // 9 = invalid (0x00 first byte)
      }
      def readId(off: Int): Option[(Long, Int)] = {
        if (off >= bytes.length) return None
        val len = vintLen(bytes(off) & 0xff)
        if (len > 4 || off + len > bytes.length) return None
        var v = 0L
        var i = 0
        while (i < len) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
        Some((v, len))
      }
      // (value, encodedLen); value -1 = "unknown size" (all value
      // bits set) — the element runs to the enclosing bound
      def readSize(off: Int): Option[(Long, Int)] = {
        if (off >= bytes.length) return None
        val b0 = bytes(off) & 0xff
        val len = vintLen(b0)
        if (len > 8 || off + len > bytes.length) return None
        var v = (b0 & (0xff >>> len)).toLong
        var ones = v == (0xffL >>> len)
        var i = 1
        while (i < len) {
          val b = bytes(off + i) & 0xff
          v = (v << 8) | b
          if (b != 0xff) ones = false
          i += 1
        }
        Some((if (ones) -1L else v, len))
      }
      // (id, payloadStart, payloadEnd) for each child of [start, end)
      def children(start: Int, end: Int): Iterator[(Long, Int, Int)] =
        new Iterator[(Long, Int, Int)] {
          private var off = start
          private var dead = false
          def hasNext: Boolean = !dead && off < end
          def next(): (Long, Int, Int) = {
            val parsed = for {
              (id, idLen) <- readId(off)
              (sz, szLen) <- readSize(off + idLen)
            } yield {
              val ps = off + idLen + szLen
              val pe = if (sz < 0) end
                else math.min(end.toLong, ps + sz).toInt
              (id, ps, pe)
            }
            parsed match {
              case Some((id, ps, pe)) if pe >= ps =>
                off = if (pe <= off) end else pe
                (id, ps, pe)
              case _ => dead = true; (0L, end, end)
            }
          }
        }
      def uint(s: Int, e: Int): Long = {
        var v = 0L
        var i = s
        while (i < e) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
        v
      }
      def float(s: Int, e: Int): Double = (e - s) match {
        case 4 => java.lang.Float.intBitsToFloat(uint(s, e).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(uint(s, e))
        case _ => 0.0
      }
      var docType = "matroska" // EBML default when DocType is absent
      var tsScale = 1000000L   // ns per tick; Matroska default
      var durTicks = -1.0
      var w = 0
      var h = 0
      children(0, bytes.length).foreach {
        case (0x1A45DFA3L, s, e) => // EBML header
          children(s, e).foreach {
            case (0x4282L, ds, de) => // DocType
              docType = new String(bytes, ds, de - ds, "US-ASCII")
                .takeWhile(_ != '\u0000')
            case _ => ()
          }
        case (0x18538067L, s, e) => // Segment
          children(s, e).foreach {
            case (0x1549A966L, is, ie) => // Info
              children(is, ie).foreach {
                case (0x2AD7B1L, vs, ve) => tsScale = uint(vs, ve)
                case (0x4489L, vs, ve) => durTicks = float(vs, ve)
                case _ => ()
              }
            case (0x1654AE6BL, ts, te) => // Tracks
              children(ts, te).foreach {
                case (0xAEL, es, ee) => // TrackEntry
                  children(es, ee).foreach {
                    case (0xE0L, vs, ve) if w == 0 => // Video
                      children(vs, ve).foreach {
                        case (0xB0L, ps, pe) => w = uint(ps, pe).toInt
                        case (0xBAL, ps, pe) => h = uint(ps, pe).toInt
                        case _ => ()
                      }
                    case _ => ()
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (docType != "webm" && docType != "matroska") None
      else if (durTicks < 0 && w == 0 && h == 0) None // header said nothing
      else Some(MediaFeatures(width = w, height = h, channels = 0,
        durationMs =
          if (durTicks < 0) 0L
          else math.round(durTicks * tsScale / 1e6)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic minimal webm fixture — REAL EBML bytes
    * (EBML{DocType=webm} + Segment{Info{TimestampScale, Duration} +
    * Tracks{TrackEntry{Video{PixelWidth, PixelHeight}}}}), duration in
    * 1 ms ticks so a verifier that knows only (durationMs, w, h)
    * predicts the decode: the Matroska analog of [[mp4Fixture]].
    */
  def webmFixture(durationMs: Long, w: Int, h: Int): Array[Byte] = {
    require(durationMs >= 0 && w >= 0 && h >= 0)
    def sizeVint(n: Int): Array[Byte] = {
      // minimal-length EBML size with the marker bit; payloads here
      // are tiny, but the encoder is general up to 4 bytes
      require(n >= 0)
      if (n < 0x7f) Array(((1 << 7) | n).toByte)
      else if (n < 0x3fff) Array(((1 << 6) | (n >> 8)).toByte, n.toByte)
      else if (n < 0x1fffff)
        Array(((1 << 5) | (n >> 16)).toByte, (n >> 8).toByte, n.toByte)
      else Array(((1 << 4) | (n >> 24)).toByte, (n >> 16).toByte,
        (n >> 8).toByte, n.toByte)
    }
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
    }
    def elem(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVint(payload.length) ++ payload
    def uintBytes(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
    }
    val header = elem(0x1A45DFA3L, elem(0x4282L, "webm".getBytes("US-ASCII")))
    val info = elem(0x1549A966L,
      elem(0x2AD7B1L, uintBytes(1000000L)) ++ // 1 ms ticks
        elem(0x4489L, {
          val bb = java.nio.ByteBuffer.allocate(8)
          bb.putDouble(durationMs.toDouble)
          bb.array()
        }))
    val tracks = elem(0x1654AE6BL, elem(0xAEL, elem(0xE0L,
      elem(0xB0L, uintBytes(w.toLong)) ++ elem(0xBAL, uintBytes(h.toLong)))))
    header ++ elem(0x18538067L, info ++ tracks)
  }

  /** REAL Ogg container decode — the page walk that completes the
    * container family (PNG/WAV/MP4/webm/Ogg): verify the `OggS`
    * capture pattern, read the codec id header from the first
    * beginning-of-stream page (Vorbis `\x01vorbis`: channels + sample
    * rate; Opus `OpusHead`: channels + pre-skip, granules fixed at
    * 48 kHz by spec), then hop page headers — each page's segment
    * table says how many payload bytes to SKIP, so the walk reads
    * ~27 bytes per page and never touches codec payload — taking the
    * last granule position of that stream: duration_ms =
    * granule·1000/rate (Vorbis) or (granule − preskip)·1000/48000
    * (Opus). This is exactly how `ogginfo` reports duration without
    * decoding. None when the bytes are not Ogg or the first stream's
    * id header is neither codec (caller falls back to the stub);
    * width/height 0, channels real.
    */
  def decodeOgg(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 28) return None
    if (bytes(0) != 'O' || bytes(1) != 'g' || bytes(2) != 'g' ||
      bytes(3) != 'S') return None
    try {
      def ascii(off: Int, n: Int): String =
        if (off + n <= bytes.length) new String(bytes, off, n, "US-ASCII")
        else ""
      def u16le(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def u32le(off: Int): Long =
        (0 until 4).foldLeft(0L)((a, i) => a | (bytes(off + i) & 0xffL) << (8 * i))
      def u64le(off: Int): Long =
        (0 until 8).foldLeft(0L)((a, i) => a | (bytes(off + i) & 0xffL) << (8 * i))
      var off = 0
      var serial = -1L     // the stream we report (first recognized BOS)
      var channels = 0
      var rate = 0L        // granule rate; 48000 for Opus by spec
      var preskip = 0L
      var lastGranule = -1L
      while (off + 27 <= bytes.length && bytes(off) == 'O' &&
        bytes(off + 1) == 'g' && bytes(off + 2) == 'g' &&
        bytes(off + 3) == 'S') {
        val headerType = bytes(off + 5) & 0xff
        val granule = u64le(off + 6)
        val pageSerial = u32le(off + 14)
        val nSegs = bytes(off + 26) & 0xff
        if (off + 27 + nSegs > bytes.length) return None
        var payloadLen = 0
        var i = 0
        while (i < nSegs) {
          payloadLen += bytes(off + 27 + i) & 0xff
          i += 1
        }
        val payload = off + 27 + nSegs
        if ((headerType & 0x02) != 0 && serial < 0 &&
          payload + payloadLen <= bytes.length) {
          // beginning-of-stream page: sniff the codec id header
          if (payloadLen >= 30 && bytes(payload) == 0x01 &&
            ascii(payload + 1, 6) == "vorbis") {
            serial = pageSerial
            channels = bytes(payload + 11) & 0xff
            rate = u32le(payload + 12)
          } else if (payloadLen >= 19 && ascii(payload, 8) == "OpusHead") {
            serial = pageSerial
            channels = bytes(payload + 9) & 0xff
            preskip = u16le(payload + 10).toLong
            rate = 48000L // Opus granules are 48 kHz regardless of input
          }
        }
        // granule −1 marks a continuation page with no packet end
        if (pageSerial == serial && granule >= 0) lastGranule = granule
        off = payload + payloadLen
      }
      if (serial < 0 || rate <= 0) None
      else {
        val samples = math.max(0L, lastGranule - preskip)
        Some(MediaFeatures(width = 0, height = 0, channels = channels,
          durationMs = if (lastGranule < 0) 0L else samples * 1000L / rate))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic minimal Ogg fixture — REAL Ogg pages (BOS page
    * carrying a genuine Vorbis or Opus id header, EOS page carrying
    * the final granule position), so a verifier that knows only
    * (durationMs, channels, codec) predicts the decode. Vorbis form
    * uses an 8 kHz rate so durationMs·8 is the exact granule; Opus
    * granules are 48 kHz + pre-skip per spec.
    */
  def oggFixture(durationMs: Long, channels: Int,
                 opus: Boolean = false): Array[Byte] = {
    require(durationMs >= 0 && channels >= 1)
    val preskip = 312
    def page(headerType: Int, granule: Long, serial: Long, seq: Long,
             payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 255)
      val bb = java.nio.ByteBuffer.allocate(27 + 1 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes("US-ASCII")).put(0.toByte)
        .put(headerType.toByte).putLong(granule).putInt(serial.toInt)
        .putInt(seq.toInt).putInt(0) // CRC 0: the header walk skips it
        .put(1.toByte).put(payload.length.toByte).put(payload)
      bb.array()
    }
    val idHeader: Array[Byte] =
      if (opus) {
        val bb = java.nio.ByteBuffer.allocate(19)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("OpusHead".getBytes("US-ASCII")).put(1.toByte)
          .put(channels.toByte).putShort(preskip.toShort)
          .putInt(48000).putShort(0.toShort).put(0.toByte)
        bb.array()
      } else {
        val bb = java.nio.ByteBuffer.allocate(30)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)
          .put(channels.toByte).putInt(8000)
          .putInt(0).putInt(0).putInt(0)
          .put((6 | (7 << 4)).toByte).put(1.toByte)
        bb.array()
      }
    val lastGranule =
      if (opus) durationMs * 48L + preskip else durationMs * 8L
    page(0x02, 0L, serial = 7L, seq = 0L, idHeader) ++
      page(0x04, lastGranule, serial = 7L, seq = 1L, Array[Byte](0))
  }

  /** REAL audio embedding for WAV payloads — 16-bit integer PCM plus
    * the compressed telephony layers G.711 mu-law / A-law and
    * IMA/DVI ADPCM (fmt tags 1, 7, 6, 0x11 — see [[wavMonoSamples]]
    * for the decode dispatch): Goertzel spectral power
    * at `dim` evenly spaced frequencies up to Nyquist over the
    * mono-mixed signal, log-compressed and L2-normalized — an actual
    * DSP feature vector (a pure sine lands its energy in the nearest
    * bin; see the spec's property test), not a byte hash. Pure JVM,
    * deterministic, O(samples·dim) per blob — the per-partition
    * streaming cost model of the other codec seams. None for
    * non-WAV/non-16-bit bytes (caller falls back to the hash stub, so
    * a mixed-modality column never breaks).
    *
    * Output plugs into VectorSearch's `array<float>` contract like the
    * embeddings table: audio similarity search and near-dup run on the
    * identical ANN paths.
    */
  def embedWavSpectral(bytes: Array[Byte], dim: Int = 16): Option[Array[Float]] = {
    require(dim >= 1, "dim must be >= 1")
    wavMonoSamples(bytes).flatMap { case (x, rate) =>
      if (x.length < 2) None else Some(goertzelEmbed(x, rate, dim))
    }
  }

  /** Decode a WAV payload to a mono-mixed [-1, 1] signal — the sample
    * seam under [[embedWavSpectral]]. Dispatches on the fmt tag:
    * 1 = 16-bit integer PCM; 6/7 = G.711 A-law / mu-law (8-bit
    * companded, [[G711Adpcm]]); 0x11 = IMA/DVI ADPCM (4-bit
    * block-coded, mono). 0xFFFE extensible already resolved to its
    * sub-format in [[parseWav]]. None for any other tag — a
    * compressed codec must never be read as raw samples, so the
    * caller falls through to the stub and a mixed column never
    * breaks.
    */
  def wavMonoSamples(bytes: Array[Byte]): Option[(Array[Double], Int)] =
    parseWav(bytes).filter(_.dataOff >= 0).flatMap { h =>
      val avail = math.min(h.dataBytes,
        (bytes.length - h.dataOff).toLong).toInt
      h.audioFormat match {
        case 1 if h.bitsPerSample == 16 =>
          val frame = h.channels * 2
          val n = avail / frame
          if (n < 2) None
          else {
            // mono mix, normalized to [-1, 1]
            val x = new Array[Double](n)
            var i = 0
            while (i < n) {
              var c = 0
              var acc = 0.0
              while (c < h.channels) {
                val off = h.dataOff + i * frame + c * 2
                val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
                acc += s / 32768.0
                c += 1
              }
              x(i) = acc / h.channels
              i += 1
            }
            Some((x, h.sampleRate.toInt))
          }
        case 6 | 7 if h.bitsPerSample == 8 =>
          // G.711: one companded byte per channel-sample
          val n = avail / h.channels
          if (n < 2) None
          else {
            val alaw = h.audioFormat == 6
            val x = new Array[Double](n)
            var i = 0
            while (i < n) {
              var c = 0
              var acc = 0.0
              while (c < h.channels) {
                val b = bytes(h.dataOff + i * h.channels + c)
                val s = if (alaw) G711Adpcm.alawDecode(b)
                        else G711Adpcm.mulawDecode(b)
                acc += s / 32768.0
                c += 1
              }
              x(i) = acc / h.channels
              i += 1
            }
            Some((x, h.sampleRate.toInt))
          }
        case 0x11 if h.channels == 1 && h.bitsPerSample == 4 &&
          h.blockAlign >= 8 =>
          // IMA ADPCM, mono: block count bounds the decode; the fact
          // chunk (when present) trims the final block's padding
          val spb =
            if (h.samplesPerBlock > 0) h.samplesPerBlock
            else (h.blockAlign - 4) * 2 + 1
          val blocks = avail / h.blockAlign
          val declared = blocks.toLong * spb
          val total = math.min(
            if (h.factSamples >= 0) math.min(h.factSamples, declared)
            else declared, Int.MaxValue.toLong).toInt
          if (total < 2) None
          else G711Adpcm.imaDecode(bytes, h.dataOff, avail, h.blockAlign,
            total, samplesPerBlock = spb).map { s =>
            val x = new Array[Double](s.length)
            var i = 0
            while (i < s.length) { x(i) = s(i) / 32768.0; i += 1 }
            (x, h.sampleRate.toInt)
          }
        case _ => None
      }
    }

  /** The shared spectral kernel behind [[embedWavSpectral]] and
    * [[embedFlacSpectral]]: Goertzel power per target frequency
    * (exact DFT bin energy at arbitrary f without an FFT library)
    * over a mono [-1, 1] signal, log-compressed, L2-normalized.
    * One kernel for every audio container, so a WAV and its FLAC
    * encode embed to the same vector by construction.
    */
  private def goertzelEmbed(x: Array[Double], sampleRate: Int,
                            dim: Int): Array[Float] = {
    val n = x.length
    val v = new Array[Float](dim)
    var d = 0
    var sq = 0.0
    while (d < dim) {
      val f = sampleRate.toDouble / 2 * (d + 1) / (dim + 1)
      val w = 2 * math.Pi * f / sampleRate
      val coeff = 2 * math.cos(w)
      var s0 = 0.0
      var s1 = 0.0
      var s2 = 0.0
      var i = 0
      while (i < n) {
        s0 = x(i) + coeff * s1 - s2
        s2 = s1
        s1 = s0
        i += 1
      }
      val power = (s1 * s1 + s2 * s2 - coeff * s1 * s2) / n
      val e = math.log1p(power) // compress dynamic range
      v(d) = e.toFloat
      sq += e * e
      d += 1
    }
    val norm = math.sqrt(sq)
    if (norm > 0) { d = 0; while (d < dim) { v(d) = (v(d) / norm).toFloat; d += 1 } }
    v
  }

  /** REAL audio embedding for COMPRESSED FLAC — the round-13 closing
    * of the compressed-audio gap: [[FlacCodec.decodePcm]] decodes the
    * frames (all four subframe types, Rice residuals, channel
    * decorrelation — pure JVM), the channels mono-mix normalized by
    * the stream's own bit depth, and the identical [[goertzelEmbed]]
    * kernel produces the vector, so a planted sine carries the same
    * physics oracle as the WAV path (and a WAV and its FLAC encode
    * embed identically). None for non-FLAC bytes — the dispatch chain
    * falls through.
    */
  def embedFlacSpectral(bytes: Array[Byte],
                        dim: Int = 16): Option[Array[Float]] = {
    require(dim >= 1, "dim must be >= 1")
    FlacCodec.decodePcm(bytes).flatMap(pcmSpectral(_, dim))
  }

  /** The shared PCM→vector tail of the FLAC-family embedders:
    * mono-mix at the stream's own bit depth, then [[goertzelEmbed]].
    */
  private def pcmSpectral(pcm: FlacCodec.Pcm,
                          dim: Int): Option[Array[Float]] = {
    val n = pcm.samples(0).length
    if (n < 2) None
    else {
      val scale = (1L << (pcm.bitsPerSample - 1)).toDouble
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        var c = 0
        var acc = 0.0
        while (c < pcm.channels) { acc += pcm.samples(c)(i) / scale; c += 1 }
        x(i) = acc / pcm.channels
        i += 1
      }
      Some(goertzelEmbed(x, pcm.sampleRate, dim))
    }
  }

  /** Reassemble the NATIVE FLAC stream out of an Ogg FLAC mapping
    * (the `0x7F "FLAC"` first packet carries the native `fLaC` header
    * verbatim; every later packet is one-or-more audio frames). Walks
    * pages with full lacing semantics — packets spanning segment
    * lists and pages reassemble correctly — so the existing
    * [[FlacCodec.decodePcm]] decodes the result unchanged. None when
    * the bytes are not Ogg or the BOS packet is not the FLAC mapping.
    */
  def decodeOggFlac(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 28) return None
    if (bytes(0) != 'O' || bytes(1) != 'g' || bytes(2) != 'g' ||
      bytes(3) != 'S') return None
    try {
      def u32le(off: Int): Long =
        (0 until 4).foldLeft(0L)((a, i) => a | (bytes(off + i) & 0xffL) << (8 * i))
      // collect the packets of the FLAC logical stream (lacing: a
      // segment < 255 ends the current packet; 255 continues it)
      val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val current = new java.io.ByteArrayOutputStream()
      var serial = -1L
      var off = 0
      while (off + 27 <= bytes.length && bytes(off) == 'O' &&
        bytes(off + 1) == 'g' && bytes(off + 2) == 'g' &&
        bytes(off + 3) == 'S') {
        val headerType = bytes(off + 5) & 0xff
        val pageSerial = u32le(off + 14)
        val nSegs = bytes(off + 26) & 0xff
        if (off + 27 + nSegs > bytes.length) return None
        var p = off + 27 + nSegs
        var i = 0
        while (i < nSegs) {
          val segLen = bytes(off + 27 + i) & 0xff
          if (p + segLen > bytes.length) return None
          val isBos = (headerType & 0x02) != 0
          if (isBos && serial < 0 && current.size() == 0 && segLen >= 5 &&
            (bytes(p) & 0xff) == 0x7f && bytes(p + 1) == 'F' &&
            bytes(p + 2) == 'L' && bytes(p + 3) == 'A' && bytes(p + 4) == 'C')
            serial = pageSerial
          if (pageSerial == serial) {
            current.write(bytes, p, segLen)
            if (segLen < 255) {
              packets += current.toByteArray
              current.reset()
            }
          }
          p += segLen
          i += 1
        }
        off = p
      }
      if (current.size() > 0) packets += current.toByteArray // unterminated tail
      if (serial < 0 || packets.isEmpty) return None
      val first = packets.head
      // 0x7F "FLAC" major minor nHeaders(u16 BE), then the native
      // stream header ("fLaC" + STREAMINFO) verbatim
      if (first.length < 13) return None
      val nHeaders = ((first(7) & 0xff) << 8) | (first(8) & 0xff)
      if (nHeaders > packets.length - 1) return None // sanity bound only
      val out = new java.io.ByteArrayOutputStream()
      out.write(first, 9, first.length - 9)
      // The nHeaders "header packets" after the BOS are native FLAC
      // metadata blocks (VorbisComment etc.) that the STREAMINFO's
      // last-metadata-block flag still points at — dropping them
      // would leave a metadata walk that misparses audio-frame bytes.
      // They are valid native stream content, so emit EVERY non-BOS
      // packet verbatim; nHeaders stays a sanity bound above.
      packets.drop(1).foreach(pk => out.write(pk, 0, pk.length))
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio embedding for Ogg-encapsulated FLAC — the Ogg
    * container joins WAV/FLAC on the content-embedding path:
    * [[decodeOggFlac]] reassembles the native stream, and the
    * identical decode + Goertzel tail produces the vector, so the
    * planted-sine physics oracle transfers verbatim. None for
    * non-Ogg-FLAC bytes (Vorbis/Opus payloads keep their header-only
    * features and fall to the stub for embedding — a frame decode of
    * those codecs would be a psychoacoustic codec port, out of
    * scope).
    */
  def embedOggFlacSpectral(bytes: Array[Byte],
                           dim: Int = 16): Option[Array[Float]] = {
    require(dim >= 1, "dim must be >= 1")
    decodeOggFlac(bytes).flatMap(FlacCodec.decodePcm)
      .flatMap(pcmSpectral(_, dim))
  }

  /** Ogg FLAC sine fixture — REAL Ogg pages whose packets carry the
    * [[sineFlacFixture]] stream per the Ogg FLAC mapping (BOS packet
    * = 0x7F "FLAC" 1 0 u16be(nHeaders) + native header; one
    * audio-frame packet per following page, long packets laced across
    * 255-byte segments). The EOS page carries the final granule =
    * total samples. `vorbisComment = true` reproduces the REAL-file
    * shape: nHeaders = 1, the STREAMINFO block header's
    * last-metadata-block flag CLEARED, and a second header packet
    * carrying a native VorbisComment metadata block (flag set) — the
    * mapping every encoder in the wild emits, which the pre-r14
    * packet-dropping reassembly misparsed.
    */
  def oggFlacFixture(freqHz: Double, nSamples: Int,
                     sampleRate: Int = 8000,
                     mode: FlacCodec.Mode = FlacCodec.Fixed2,
                     vorbisComment: Boolean = false): Array[Byte] = {
    val native = sineFlacFixture(freqHz, nSamples, sampleRate, mode)
    val headerLen = 42 // "fLaC" + block header + 34-byte STREAMINFO
    val header = native.take(headerLen)
    if (vorbisComment) // more metadata follows: clear STREAMINFO last flag
      header(4) = (header(4) & 0x7f).toByte
    val nHeaders = if (vorbisComment) 1 else 0
    val bosPacket = Array[Byte](0x7f.toByte, 'F', 'L', 'A', 'C',
      1, 0, (nHeaders >> 8).toByte, (nHeaders & 0xff).toByte) ++ header
    // native VorbisComment block: vendor "graft" + zero user comments,
    // last-metadata-block flag SET (it terminates the metadata walk)
    val vcBody = {
      val vendor = "graft".getBytes("UTF-8")
      java.nio.ByteBuffer.allocate(8 + vendor.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(vendor.length).put(vendor).putInt(0).array()
    }
    val vcPacket = Array[Byte]((0x80 | 4).toByte,
      ((vcBody.length >> 16) & 0xff).toByte,
      ((vcBody.length >> 8) & 0xff).toByte,
      (vcBody.length & 0xff).toByte) ++ vcBody
    val frames = native.drop(headerLen)
    def page(headerType: Int, granule: Long, seq: Long,
             packet: Array[Byte]): Array[Byte] = {
      val nFull = packet.length / 255
      val lace = Array.tabulate(nFull + 1)(i =>
        if (i < nFull) 255.toByte else (packet.length % 255).toByte)
      require(lace.length <= 255, "fixture packet too long for one page")
      val bb = java.nio.ByteBuffer.allocate(27 + lace.length + packet.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes("US-ASCII")).put(0.toByte)
        .put(headerType.toByte).putLong(granule).putInt(9)
        .putInt(seq.toInt).putInt(0) // CRC 0: the walks skip it
        .put(lace.length.toByte).put(lace).put(packet)
      bb.array()
    }
    if (vorbisComment)
      page(0x02, 0L, 0L, bosPacket) ++ page(0x00, 0L, 1L, vcPacket) ++
        page(0x04, nSamples.toLong, 2L, frames)
    else
      page(0x02, 0L, 0L, bosPacket) ++
        page(0x04, nSamples.toLong, 1L, frames)
  }

  /** FLAC sine fixture with REAL encoded frames — the
    * [[sineWavFixture]] physics oracle for the compressed path;
    * `mode` picks the subframe type so every decoder path carries
    * planted content.
    */
  def sineFlacFixture(freqHz: Double, nSamples: Int,
                      sampleRate: Int = 8000,
                      mode: FlacCodec.Mode = FlacCodec.Fixed2): Array[Byte] = {
    val s = Array.tabulate(nSamples)(i =>
      (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toInt)
    FlacCodec.encode(Array(s), sampleRate, bps = 16,
      blockSize = math.max(16, math.min(4096, nSamples)), mode = mode)
  }

  /** 16-bit PCM sine fixture — REAL audio content at a known
    * frequency, so the spectral embedder is testable against physics
    * (energy concentrates in the bin nearest `freqHz`), not against
    * its own implementation.
    */
  def sineWavFixture(freqHz: Double, nSamples: Int,
                     sampleRate: Int = 8000): Array[Byte] = {
    val bytes = wavFixture(nSamples, sampleRate, channels = 1)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toInt
      bytes(44 + i * 2) = (s & 0xff).toByte
      bytes(44 + i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    bytes
  }

  /** G.711 sine fixture — REAL RIFF/WAVE bytes whose payload is the
    * companded (A-law or mu-law) encode of the [[sineWavFixture]]
    * signal, so the compressed-telephony decode path carries the same
    * physics oracle (G.711's ~38 dB SNR leaves the Goertzel argmax
    * untouched). fmt chunk is the 18-byte non-PCM form (cbSize = 0).
    */
  def sineWavG711Fixture(freqHz: Double, nSamples: Int,
                         sampleRate: Int = 8000,
                         alaw: Boolean = false): Array[Byte] = {
    require(nSamples >= 0 && sampleRate >= 1)
    val bb = java.nio.ByteBuffer.allocate(46 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(38 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort((if (alaw) 6 else 7).toShort)
      .putShort(1.toShort).putInt(sampleRate)
      .putInt(sampleRate) // one byte per mono sample
      .putShort(1.toShort).putShort(8.toShort)
      .putShort(0.toShort) // cbSize
    bb.put("data".getBytes("US-ASCII")).putInt(nSamples)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toShort
      bb.put(if (alaw) G711Adpcm.alawEncode(s) else G711Adpcm.mulawEncode(s))
      i += 1
    }
    bb.array()
  }

  /** IMA ADPCM sine fixture — REAL RIFF/WAVE bytes with the standard
    * block-coded layout (fmt tag 0x11, 20-byte fmt chunk carrying
    * wSamplesPerBlock, a `fact` chunk with the true frame count, and
    * [[G711Adpcm.imaEncode]] blocks), so the 4-bit adaptive decode
    * path carries the same planted-sine physics oracle.
    */
  def sineWavAdpcmFixture(freqHz: Double, nSamples: Int,
                          sampleRate: Int = 8000,
                          blockAlign: Int = 256,
                          samplesPerBlock: Int = 0): Array[Byte] = {
    require(nSamples >= 0 && sampleRate >= 1)
    val samples = Array.tabulate(nSamples)(i =>
      (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toShort)
    val cap = (blockAlign - 4) * 2 + 1
    // wSamplesPerBlock may legitimately declare FEWER samples than the
    // nibble capacity (the tail nibbles are padding); pack each
    // declared-size chunk as its own block in that case
    val spb =
      if (samplesPerBlock > 0) { require(samplesPerBlock <= cap); samplesPerBlock }
      else cap
    val data =
      if (spb == cap) G711Adpcm.imaEncode(samples, blockAlign)
      else if (samples.isEmpty) G711Adpcm.imaEncode(samples, blockAlign)
      else samples.grouped(spb)
        .map(G711Adpcm.imaEncode(_, blockAlign)).reduce(_ ++ _)
    val byteRate = (sampleRate.toLong * blockAlign / spb).toInt max 1
    // 12 RIFF/WAVE + 28 fmt + 12 fact + 8 data-header = 60 byte prefix
    val bb = java.nio.ByteBuffer.allocate(60 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(52 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11.toShort)
      .putShort(1.toShort).putInt(sampleRate)
      .putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(4.toShort)
      .putShort(2.toShort) // cbSize
      .putShort(spb.toShort) // wSamplesPerBlock
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(nSamples)
    bb.put("data".getBytes("US-ASCII")).putInt(data.length)
    bb.put(data)
    bb.array()
  }

  /** REAL image-content embedding: deterministic pixel statistics over
    * a full `javax.imageio` decode — the image sibling of
    * [[embedWavSpectral]], replacing the byte-hash stub for every
    * registry-readable image. Layout for dimension `d` (d ≥ 8):
    *
    *  - `v[0..2]`: mean R, G, B over all pixels, each in [0, 1] —
    *    solid-color images embed by hue alone;
    *  - `v[3]`: luma population stddev (global contrast);
    *  - `v[4 until 4+g²)`: MEAN-CENTERED per-block mean luma on a g×g
    *    grid, g = floor(√(d−4)), row-major (block (bx, by) at index
    *    4 + by·g + bx). Pixels land in block (x·g/w, y·g/h) — the
    *    same integer source indexing [[resizeImage]] uses, so the
    *    features are resolution-stable: an image and its
    *    nearest-neighbor resize produce near-identical vectors.
    *    Centering makes these the contrast PATTERN (a flat image is
    *    all zeros here), so the dominant block is formula-predictable
    *    for planted fixtures — the oracle hook;
    *  - remaining dims zero; the whole vector unit-normalized
    *    (VectorSearch `array<float>` cosine contract).
    *
    * Deterministic by construction: exact per-block means over integer
    * block assignment, BT.601 luma weights, no platform filtering
    * kernels. None when no registered reader accepts the bytes — the
    * caller falls back to the WAV/stub dispatch. Unlike the
    * header-only [[decodeImage]], an embedder NEEDS pixels, so this
    * pays the full decode; the per-partition streaming in
    * [[embedMedia]] bounds memory to one image at a time.
    */
  def embedImagePixels(bytes: Array[Byte], dim: Int = 16): Option[Array[Float]] = {
    require(dim >= 8, "image embedding needs dim >= 8 (4 global + blocks)")
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val g = math.sqrt((dim - 4).toDouble).toInt
        var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
        var sumL = 0.0; var sumL2 = 0.0
        val blockL = new Array[Double](g * g)
        val blockN = new Array[Long](g * g)
        var y = 0
        while (y < h) {
          val by = y.toLong * g / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = ((rgb >> 16) & 0xff) / 255.0
            val gg = ((rgb >> 8) & 0xff) / 255.0
            val b = (rgb & 0xff) / 255.0
            val luma = 0.299 * r + 0.587 * gg + 0.114 * b
            sumR += r; sumG += gg; sumB += b
            sumL += luma; sumL2 += luma * luma
            val bi = (by * g + x.toLong * g / w).toInt
            blockL(bi) += luma
            blockN(bi) += 1
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val meanL = sumL / n
        val v = new Array[Float](dim)
        v(0) = (sumR / n).toFloat
        v(1) = (sumG / n).toFloat
        v(2) = (sumB / n).toFloat
        v(3) = math.sqrt(math.max(0.0, sumL2 / n - meanL * meanL)).toFloat
        var i = 0
        while (i < g * g) {
          // an image narrower than the grid leaves blocks empty → 0
          if (blockN(i) > 0) v(4 + i) = (blockL(i) / blockN(i) - meanL).toFloat
          i += 1
        }
        var sq = 0.0
        i = 0
        while (i < dim) { sq += v(i).toDouble * v(i); i += 1 }
        val norm = math.sqrt(sq)
        if (norm > 0) { i = 0; while (i < dim) { v(i) = (v(i) / norm).toFloat; i += 1 } }
        Some(v)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic bright-block PNG fixture: a dark canvas with one
    * bright block of a g×g grid lit — REAL codec bytes whose dominant
    * contrast block is known by FORMULA, so [[embedImagePixels]] is
    * testable against geometry (the planted block's centered luma is
    * the positive outlier → argmax over the block dims), not against
    * implementation echo. The canvas is g·cell pixels square so blocks
    * align exactly with the embedder's integer grid assignment.
    */
  def blockPngFixture(g: Int, blockIdx: Int, cell: Int = 8,
                      baseRgb: Int = 0x202020, brightRgb: Int = 0xE6E6E6): Array[Byte] = {
    require(g >= 1 && blockIdx >= 0 && blockIdx < g * g && cell >= 1)
    val wh = g * cell
    val img = new java.awt.image.BufferedImage(
      wh, wh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bx = blockIdx % g
    val by = blockIdx / g
    var y = 0
    while (y < wh) {
      var x = 0
      while (x < wh) {
        val in = x / cell == bx && y / cell == by
        img.setRGB(x, y, if (in) brightRgb else baseRgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Column-level media embedder with REAL content dispatch: registry-
    * readable images get the pixel-statistics embedding
    * ([[embedImagePixels]]), WAV blobs the spectral embedding, and
    * only unrecognized bytes the deterministic hash-stub vector (same
    * dim, same unit-norm `array<float>` contract) — so a mixed corpus
    * embeds in one pass and the result feeds VectorSearch unchanged.
    * Per-partition row streaming like [[extractFeatures]].
    */
  def embedMedia(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim > 0)
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields :+ StructField("media_embedding",
        ArrayType(FloatType, containsNull = false), nullable = true))
    val mediaIdx = inSchema.fieldIndex("media")
    val rdd = df.rdd.map { r =>
      val bytes = r.get(mediaIdx).asInstanceOf[Array[Byte]]
      val v = (if (dim >= 8) embedImagePixels(bytes, dim) else None)
        .orElse(embedWavSpectral(bytes, dim))
        .orElse(embedFlacSpectral(bytes, dim))
        .orElse(embedOggFlacSpectral(bytes, dim))
        .getOrElse(stubEmbedding(bytes, dim))
      Row.fromSeq(r.toSeq :+ v.toSeq)
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode dispatch: real image decode when the bytes ARE a readable
    * image (sniffed by the ImageIO registry, independent of the declared
    * media_type — declared metadata lies at corpus scale), real WAV
    * header decode when they are RIFF/WAVE audio, real MP4 box walk
    * when they are ISO-BMFF video, real EBML walk when they are
    * Matroska/webm, real page walk when they are Ogg Vorbis/Opus,
    * stub otherwise (unrecognized containers).
    */
  /** FLAC STREAMINFO decode (the public FLAC format / RFC 9639):
    * "fLaC" magic, then a walk of metadata block headers (1 byte
    * last-flag+type, 24-bit big-endian length) to the mandatory
    * STREAMINFO block (type 0, 34 bytes), whose bit-packed tail
    * carries sample rate (20 bits), channels-1 (3), bits-per-sample-1
    * (5) and total samples (36). duration = samples / rate.
    * Header-only like the other container walks — audio frames are
    * never touched, so cost is O(metadata), not O(blob).
    */
  def decodeFlac(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 8) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' ||
      bytes(3) != 'C') return None
    try {
      var off = 4
      while (off + 4 <= bytes.length) {
        val h = bytes(off) & 0xff
        val len = ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        val body = off + 4
        if ((h & 0x7f) == 0) { // STREAMINFO
          if (len < 34 || body + 34 > bytes.length) return None
          def b(i: Int): Long = bytes(body + i) & 0xffL
          val rate = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
          val channels = (((b(12) >> 1) & 0x7L) + 1L).toInt
          val samples = ((b(13) & 0x0fL) << 32) | (b(14) << 24) |
            (b(15) << 16) | (b(16) << 8) | b(17)
          if (rate <= 0) return None // spec: 0 is invalid
          return Some(MediaFeatures(0, 0, channels, samples * 1000L / rate))
        }
        if ((h & 0x80) != 0) return None // last block, STREAMINFO missing
        off = body + len
      }
      None
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal FLAC fixture: magic + a single (last)
    * STREAMINFO block with the given audio params bit-packed exactly
    * as [[decodeFlac]] unpacks them — the planted-header oracle
    * pattern of the WAV/MP4/webm/Ogg fixtures.
    */
  def flacFixture(sampleRate: Int, channels: Int, bitsPerSample: Int,
                  totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "20-bit sample rate")
    require(channels >= 1 && channels <= 8, "3-bit channels-1")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, "5-bit bps-1")
    require(totalSamples >= 0 && totalSamples < (1L << 36), "36-bit samples")
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10 // min/max blocksize 4096; frame sizes unknown
    si(10) = ((sampleRate >> 12) & 0xff).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >> 4) & 0x1)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xfL)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xffL).toByte
    si(15) = ((totalSamples >> 16) & 0xffL).toByte
    si(16) = ((totalSamples >> 8) & 0xffL).toByte
    si(17) = (totalSamples & 0xffL).toByte
    "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si // last-flag | type 0, len 34
  }

  /** MPEG-1/2 Layer III sampling-rate tables (public MPEG audio
    * spec, ISO/IEC 11172-3 / 13818-3): index 0-2 by version; the
    * MPEG-2.5 extension halves the MPEG-2 rates again.
    */
  private val Mp3Rates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG-1
    2 -> Array(22050, 24000, 16000), // MPEG-2
    0 -> Array(11025, 12000, 8000)) // MPEG-2.5
  /** Layer III bitrate tables (kbps), indexed 1-14 (0 = free, 15 =
    * invalid); MPEG-2 and 2.5 share the low-rate table.
    */
  private val Mp3BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160)

  /** REAL MP3 decode — ID3v2 tag skip + MPEG audio frame header
    * parse + Xing/Info frame-count read, completing the audio
    * container family (WAV, MP4, webm, Ogg, FLAC, now MP3). All from
    * the public specs: the ID3v2 header is "ID3" + version(2) +
    * flags(1) + 4 SYNCSAFE size bytes (7 bits each — the tag length
    * that must be skipped, +10 for a footer when flags bit 4 is
    * set); the frame header is 11 sync bits then version(2),
    * layer(2), protection(1), bitrate index(4), rate index(2),
    * padding(1), private(1), channel mode(2, 3 = mono). Only Layer
    * III is accepted (that is what makes the stream an mp3).
    *
    * Duration: when the first frame carries a Xing/"Info" VBR block
    * (at the canonical offset past the side info — MPEG-1: 17 mono /
    * 32 stereo bytes, MPEG-2/2.5: 9 / 17 — with flags bit 0 set),
    * duration = frames × samplesPerFrame × 1000 / rate, EXACT
    * integer math the planted-fixture oracle recomputes
    * (samplesPerFrame: 1152 MPEG-1 Layer III, 576 MPEG-2/2.5).
    * Otherwise the CBR estimate from the header bitrate:
    * audioBytes × 8 / bitrate (unit-pinned, not on the oracle path —
    * a real VBR stream without Xing has no header-only duration).
    * Header-only like every other container walk: audio granules are
    * never touched, cost is O(tag + one frame header), not O(blob).
    */
  def decodeMp3(bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      var off = 0
      // ID3v2 tag: syncsafe 28-bit size EXCLUDES the 10-byte header
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
        if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None
        val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        off = 10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
      }
      // bounded sync scan: tolerate padding junk between tag and frame
      val scanEnd = math.min(bytes.length - 4, off + 4096)
      while (off <= scanEnd && !((bytes(off) & 0xff) == 0xff &&
        (bytes(off + 1) & 0xe0) == 0xe0)) off += 1
      if (off > scanEnd) return None
      val b1 = bytes(off + 1) & 0xff
      val b2 = bytes(off + 2) & 0xff
      val b3 = bytes(off + 3) & 0xff
      val version = (b1 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layer = (b1 >> 1) & 0x3 // 1 = Layer III
      val brIdx = (b2 >> 4) & 0xf
      val rateIdx = (b2 >> 2) & 0x3
      val mode = (b3 >> 6) & 0x3 // 3 = mono
      if (layer != 1 || version == 1 || rateIdx == 3 ||
        brIdx == 0 || brIdx == 15) return None
      val rate = Mp3Rates(version)(rateIdx)
      val channels = if (mode == 3) 1 else 2
      val spf = if (version == 3) 1152L else 576L
      // Xing/Info block at the canonical post-side-info offset
      val sideInfo =
        if (version == 3) { if (mode == 3) 17 else 32 }
        else { if (mode == 3) 9 else 17 }
      // protection bit CLEAR means a 2-byte CRC precedes the side info
      val crc = if ((b1 & 0x1) == 0) 2 else 0
      val x = off + 4 + crc + sideInfo
      if (x + 16 <= bytes.length &&
        ((bytes(x) == 'X' && bytes(x + 1) == 'i' && bytes(x + 2) == 'n' &&
          bytes(x + 3) == 'g') ||
          (bytes(x) == 'I' && bytes(x + 1) == 'n' && bytes(x + 2) == 'f' &&
            bytes(x + 3) == 'o')) && (bytes(x + 7) & 0x1) != 0) {
        val frames = ((bytes(x + 8) & 0xffL) << 24) |
          ((bytes(x + 9) & 0xffL) << 16) | ((bytes(x + 10) & 0xffL) << 8) |
          (bytes(x + 11) & 0xffL)
        return Some(MediaFeatures(0, 0, channels, frames * spf * 1000L / rate))
      }
      // CBR estimate from the header bitrate over the audio stream
      val kbps = (if (version == 3) Mp3BitrateV1 else Mp3BitrateV2)(brIdx)
      val audioBytes = (bytes.length - off).toLong
      Some(MediaFeatures(0, 0, channels, audioBytes * 8L / kbps))
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal MP3 fixture — a REAL ID3v2 tag (when
    * `tagBytes` > 0) followed by one REAL MPEG Layer III frame whose
    * header encodes the given version/rate/mode and whose body
    * carries a Xing "Info" block with the given frame count, packed
    * exactly as [[decodeMp3]] unpacks them — the planted-header
    * oracle pattern of the WAV/MP4/webm/Ogg/FLAC fixtures.
    * `sampleRate` must be a Layer III rate from the MPEG-1 or MPEG-2
    * tables (the version is inferred from it).
    */
  def mp3Fixture(sampleRate: Int, channels: Int, frames: Long,
                 tagBytes: Int = 0): Array[Byte] = {
    val (version, rateIdx) = Mp3Rates.collectFirst {
      case (v, rates) if rates.indexOf(sampleRate) >= 0 =>
        (v, rates.indexOf(sampleRate))
    }.getOrElse(throw new IllegalArgumentException(
      s"not a Layer III sample rate: $sampleRate"))
    require(channels == 1 || channels == 2, "mono or stereo")
    require(frames >= 0 && frames <= 0xffffffffL, "32-bit frame count")
    require(tagBytes >= 0 && tagBytes < (1 << 28), "syncsafe tag size")
    val tag: Array[Byte] = if (tagBytes == 0) Array.emptyByteArray
    else "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0,
      ((tagBytes >> 21) & 0x7f).toByte, ((tagBytes >> 14) & 0x7f).toByte,
      ((tagBytes >> 7) & 0x7f).toByte, (tagBytes & 0x7f).toByte) ++
      new Array[Byte](tagBytes)
    val mode = if (channels == 1) 3 else 0
    val brIdx = 9 // 128 kbps MPEG-1 / 80 kbps MPEG-2 — any valid index
    val kbps = (if (version == 3) Mp3BitrateV1 else Mp3BitrateV2)(brIdx)
    val frameLen = (if (version == 3) 144 else 72) * kbps * 1000 / sampleRate
    val frame = new Array[Byte](math.max(frameLen, 64))
    frame(0) = 0xff.toByte
    frame(1) = (0xe0 | (version << 3) | (1 << 1) | 1).toByte // Layer III
    frame(2) = ((brIdx << 4) | (rateIdx << 2)).toByte
    frame(3) = (mode << 6).toByte
    val sideInfo =
      if (version == 3) { if (mode == 3) 17 else 32 }
      else { if (mode == 3) 9 else 17 }
    val x = 4 + sideInfo
    "Info".getBytes("US-ASCII").copyToArray(frame, x)
    frame(x + 7) = 0x1 // flags: frames field present
    frame(x + 8) = ((frames >> 24) & 0xffL).toByte
    frame(x + 9) = ((frames >> 16) & 0xffL).toByte
    frame(x + 10) = ((frames >> 8) & 0xffL).toByte
    frame(x + 11) = (frames & 0xffL).toByte
    tag ++ frame
  }

  def decode(bytes: Array[Byte], mediaType: String): MediaFeatures =
    decodeImage(bytes)
      .orElse(decodeWav(bytes))
      .orElse(decodeMp4(bytes))
      .orElse(decodeWebm(bytes))
      .orElse(decodeOgg(bytes))
      .orElse(decodeFlac(bytes))
      .orElse(decodeMp3(bytes))
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
    * vector from the blob bytes (chunked polynomial hashes), standing
    * in for codecs the JVM can't read (images and WAV audio now have
    * REAL content embedders — [[embedImagePixels]] /
    * [[embedWavSpectral]], dispatched by [[embedMedia]]; this stub is
    * the fallback arm for the remaining containers only). Output plugs
    * directly into VectorSearch (same array<float> contract as the
    * embeddings table), so media similarity search / near-dup runs on
    * the identical path.
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
      Row.fromSeq(r.toSeq :+ stubEmbedding(bytes, dim).toSeq)
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The stub's per-blob kernel, shared with [[embedMedia]]'s fallback
    * arm: a deterministic unit-norm hash vector.
    */
  def stubEmbedding(bytes: Array[Byte], dim: Int): Array[Float] = {
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
    v
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

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ext.Multimodal
import graft.sink.Sinks
import graft.streaming.EventStream

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = {
    val docs = Seq((1L, "some text payload"), (2L, "another blob"))
      .toDF("doc_id", "text").withColumn("raw", $"text".cast("binary"))
    Multimodal.withMedia(docs, "raw", "image")
  }

  test("withMedia attaches binary column + typed metadata") {
    val row = mediaDf.orderBy("doc_id").head()
    assert(row.getAs[Array[Byte]]("media").sameElements("some text payload".getBytes))
    val meta = row.getStruct(row.fieldIndex("media_meta"))
    assert(meta.getAs[String]("media_type") == "image")
    assert(meta.getAs[Long]("n_bytes") == 17L)
    assert(meta.getAs[String]("checksum").length == 32)
  }

  test("extractFeatures: deterministic stub features, schema appended") {
    val out = Multimodal.extractFeatures(mediaDf)
    assert(out.schema.fieldNames.takeRight(4).toSeq ==
      Seq("width", "height", "channels", "duration_ms"))
    val r1 = out.orderBy("doc_id").collect()
    val r2 = Multimodal.extractFeatures(mediaDf).orderBy("doc_id").collect()
    assert(r1.toSeq == r2.toSeq) // stub decode is pure
    assert(r1.forall(r => r.getAs[Int]("width") >= 1 && r.getAs[Int]("channels") == 3))
  }

  test("embedStub: unit-norm deterministic media embeddings feed vector search") {
    val emb = Multimodal.embedStub(mediaDf, dim = 8)
    val vecs = emb.select("doc_id", "media_embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(vecs.values.forall(_.length == 8))
    // unit norm
    assert(vecs.values.forall(v => math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
    // deterministic
    val again = Multimodal.embedStub(mediaDf, dim = 8)
      .select("doc_id", "media_embedding").as[(Long, Seq[Float])].collect().toMap
    assert(vecs == again)
    // plugs into the similarity path: self-similarity tops the ranking
    val renamed = emb.select($"doc_id".as("vec_id"), $"media_embedding".as("embedding"))
    val top = graft.ext.VectorSearch.bruteForceTopK(
      renamed, renamed, "vec_id", "embedding", k = 1)
    assert(top.count() == 2)
  }

  test("real image bytes decode via javax.imageio; non-image bytes fall back to stub") {
    def imageBytes(w: Int, h: Int, format: String, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, format, bos))
      bos.toByteArray
    }
    val png = imageBytes(7, 5, "png", java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jpg = imageBytes(12, 9, "jpg", java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gray = imageBytes(4, 3, "png", java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // direct decode goldens
    assert(Multimodal.decodeImage(png).contains(Multimodal.MediaFeatures(7, 5, 3, 0L)))
    assert(Multimodal.decodeImage(jpg).contains(Multimodal.MediaFeatures(12, 9, 3, 0L)))
    assert(Multimodal.decodeImage(gray).contains(Multimodal.MediaFeatures(4, 3, 1, 0L)))
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // through the distributed pipeline: real images get real dimensions,
    // the garbage row falls back to the deterministic stub
    val df = Seq((1L, png), (2L, jpg), (3L, "garbage bytes".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "image"))
      .select("doc_id", "width", "height", "channels")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 7, 5, 3)))
    assert(out(1) == ((2L, 12, 9, 3)))
    val stub = Multimodal.decodeStub("garbage bytes".getBytes, "image")
    assert(out(2) == ((3L, stub.width, stub.height, stub.channels)))
  }

  test("real WAV bytes decode true duration via the RIFF header parse; non-WAV falls back") {
    // 8000 samples at 8 kHz mono = exactly 1000 ms; 12000 at 16 kHz
    // stereo = 750 ms — durations PREDICTED from (nSamples, rate), so
    // encode→decode round-trips are checked against ground truth, not
    // against the implementation
    val mono = Multimodal.wavFixture(8000, sampleRate = 8000, channels = 1)
    val stereo = Multimodal.wavFixture(12000, sampleRate = 16000, channels = 2)
    assert(Multimodal.decodeWav(mono)
      .contains(Multimodal.MediaFeatures(0, 0, 1, 1000L)))
    assert(Multimodal.decodeWav(stereo)
      .contains(Multimodal.MediaFeatures(0, 0, 2, 750L)))
    // malformed shapes: not RIFF, truncated header, null
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(Multimodal.decodeWav("tiny".getBytes).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
    // a truncated-but-headed blob still reports the DECLARED duration
    assert(Multimodal.decodeWav(mono.take(100))
      .contains(Multimodal.MediaFeatures(0, 0, 1, 1000L)))
    // dispatch: the pipeline gives WAV rows real durations, garbage the
    // stub's
    val df = Seq((1L, mono), (2L, "garbage bytes".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "audio"))
      .select("doc_id", "channels", "duration_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1, 1000L)))
    val stub = Multimodal.decodeStub("garbage bytes".getBytes, "audio")
    assert(out(1) == ((2L, stub.channels, stub.durationMs)))
  }

  test("real MP4 bytes decode duration + track dims via the ISO-BMFF box walk; non-MP4 falls back") {
    val clip = Multimodal.mp4Fixture(durationMs = 90500L, w = 640, h = 360)
    assert(Multimodal.decodeMp4(clip)
      .contains(Multimodal.MediaFeatures(640, 360, 0, 90500L)))
    // a zero-dim (audio-only style) track still reports the movie
    // duration with dims 0
    val noDims = Multimodal.mp4Fixture(1000L, 0, 0)
    assert(Multimodal.decodeMp4(noDims)
      .contains(Multimodal.MediaFeatures(0, 0, 0, 1000L)))
    // malformed shapes: not ftyp-led, truncated, null
    assert(Multimodal.decodeMp4("RIFF....WAVE....".getBytes).isEmpty)
    assert(Multimodal.decodeMp4(clip.take(20)).isEmpty)
    assert(Multimodal.decodeMp4(null).isEmpty)
    // a TRUNCATED v1 mvhd (28-byte payload — too short for its u64
    // duration at +24) must be skipped cleanly, not throw
    val v1Trunc = {
      val mvhd = new Array[Byte](28)
      mvhd(0) = 1 // version 1
      def box(t: String, p: Array[Byte]) = {
        val bb = java.nio.ByteBuffer.allocate(8 + p.length)
        bb.putInt(8 + p.length).put(t.getBytes("US-ASCII")).put(p).array()
      }
      box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
        box("moov", box("mvhd", mvhd))
    }
    assert(Multimodal.decodeMp4(v1Trunc).isEmpty)
    // dispatch: video rows get real container features, garbage the stub
    val df = Seq((1L, clip), (2L, "garbage bytes!".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "video"))
      .select("doc_id", "width", "height", "duration_ms")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 640, 360, 90500L)))
    val stub = Multimodal.decodeStub("garbage bytes!".getBytes, "video")
    assert(out(1) == ((2L, stub.width, stub.height, stub.durationMs)))
  }

  test("real webm bytes decode duration + video dims via the EBML walk; non-EBML falls back") {
    val clip = Multimodal.webmFixture(durationMs = 90500L, w = 640, h = 360)
    assert(Multimodal.decodeWebm(clip)
      .contains(Multimodal.MediaFeatures(640, 360, 0, 90500L)))
    // an audio-only style fixture (no dims) still reports duration
    assert(Multimodal.decodeWebm(Multimodal.webmFixture(1000L, 0, 0))
      .contains(Multimodal.MediaFeatures(0, 0, 0, 1000L)))
    // a NON-DEFAULT TimestampScale rescales the same Duration ticks:
    // rewrite the fixture's scale element (3-byte uint 1,000,000 →
    // 500,000 = 0.5 ms ticks, halving the reported duration)
    val rescaled = clip.clone()
    val scaleIdx = {
      // locate the 0x2AD7B1 id — unique in the fixture
      val ix = rescaled.indices.find(i => i + 2 < rescaled.length &&
        (rescaled(i) & 0xff) == 0x2A && (rescaled(i + 1) & 0xff) == 0xD7 &&
        (rescaled(i + 2) & 0xff) == 0xB1).get
      ix + 4 // id(3) + size(1) → payload
    }
    rescaled(scaleIdx) = ((500000 >> 16) & 0xff).toByte
    rescaled(scaleIdx + 1) = ((500000 >> 8) & 0xff).toByte
    rescaled(scaleIdx + 2) = (500000 & 0xff).toByte
    assert(Multimodal.decodeWebm(rescaled).get.durationMs == 45250L)
    // an UNKNOWN-SIZE Segment (streaming webm: size VINT 0xFF) still
    // walks to the end of the buffer
    val segIx = clip.indices.find(i => i + 3 < clip.length &&
      (clip(i) & 0xff) == 0x18 && (clip(i + 1) & 0xff) == 0x53 &&
      (clip(i + 2) & 0xff) == 0x80 && (clip(i + 3) & 0xff) == 0x67).get
    val streaming = clip.take(segIx + 4) ++ Array(0xFF.toByte) ++
      clip.drop(segIx + 5) // 1-byte size → 1-byte unknown marker
    assert(Multimodal.decodeWebm(streaming)
      .contains(Multimodal.MediaFeatures(640, 360, 0, 90500L)))
    // a foreign DocType is not ours
    val foreign = clip.clone()
    val dt = foreign.indices.find(i => i + 1 < foreign.length &&
      (foreign(i) & 0xff) == 0x42 && (foreign(i + 1) & 0xff) == 0x82).get
    foreign(dt + 3) = 'x'.toByte // "webm" → "xebm"
    assert(Multimodal.decodeWebm(foreign).isEmpty)
    // malformed shapes: wrong magic, truncated, null
    assert(Multimodal.decodeWebm("RIFF....WAVE....".getBytes).isEmpty)
    assert(Multimodal.decodeWebm(clip.take(6)).isEmpty)
    assert(Multimodal.decodeWebm(null).isEmpty)
    // dispatch: webm rows get real container features, garbage the stub
    val df = Seq((1L, clip), (2L, "garbage bytes!".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "video"))
      .select("doc_id", "width", "height", "duration_ms")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 640, 360, 90500L)))
    val stub = Multimodal.decodeStub("garbage bytes!".getBytes, "video")
    assert(out(1) == ((2L, stub.width, stub.height, stub.durationMs)))
  }

  test("real Ogg pages decode duration via the granule walk for both Vorbis and Opus; non-Ogg falls back") {
    // Vorbis: granule rate = the id header's sample rate (8 kHz fixture)
    val vorbis = Multimodal.oggFixture(durationMs = 90500L, channels = 2)
    assert(Multimodal.decodeOgg(vorbis)
      .contains(Multimodal.MediaFeatures(0, 0, 2, 90500L)))
    // Opus: granules fixed at 48 kHz and the pre-skip subtracts
    val opus = Multimodal.oggFixture(durationMs = 90500L, channels = 1,
      opus = true)
    assert(Multimodal.decodeOgg(opus)
      .contains(Multimodal.MediaFeatures(0, 0, 1, 90500L)))
    // a continuation page with granule -1 must not clobber the last
    // real granule: append one (granule := -1 encodes as all-ones)
    val cont = {
      val bb = java.nio.ByteBuffer.allocate(27 + 1 + 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(1.toByte)
        .putLong(-1L).putInt(7).putInt(2).putInt(0)
        .put(1.toByte).put(1.toByte).put(0.toByte)
      vorbis ++ bb.array()
    }
    assert(Multimodal.decodeOgg(cont).get.durationMs == 90500L)
    // a foreign BOS codec (neither vorbis nor OpusHead) is not ours
    val foreign = vorbis.clone()
    foreign(28 + 1) = 'x'.toByte // inside the id header payload
    assert(Multimodal.decodeOgg(foreign).isEmpty)
    // malformed shapes: wrong magic, truncated segment table, null
    assert(Multimodal.decodeOgg("RIFF....WAVE....".getBytes).isEmpty)
    assert(Multimodal.decodeOgg(vorbis.take(30)).isEmpty)
    assert(Multimodal.decodeOgg(null).isEmpty)
    // dispatch: ogg rows get real container features, garbage the stub
    val df = Seq((1L, opus), (2L, "garbage bytes!".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "audio"))
      .select("doc_id", "channels", "duration_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1, 90500L)))
    val stub = Multimodal.decodeStub("garbage bytes!".getBytes, "audio")
    assert(out(1) == ((2L, stub.channels, stub.durationMs)))
  }

  test("FLAC STREAMINFO walk: bit-packed rate/channels/samples unpack; skipped blocks; malformed shapes fall back") {
    // 44100 Hz exercises the 20-bit rate straddling three bytes;
    // 24 bps exercises the bps-1 bit split across bytes 12/13
    val f = Multimodal.flacFixture(sampleRate = 44100, channels = 2,
      bitsPerSample = 24, totalSamples = 44100L * 61 + 22050)
    assert(Multimodal.decodeFlac(f)
      .contains(Multimodal.MediaFeatures(0, 0, 2, 61500L)))
    // a 36-bit sample count above 2^32 must not truncate
    val big = Multimodal.flacFixture(8000, 1, 16, (1L << 33) + 8000L)
    assert(Multimodal.decodeFlac(big).get.durationMs ==
      ((1L << 33) + 8000L) * 1000L / 8000L)
    // STREAMINFO found after a skipped foreign block (walk, not offset)
    val padded = {
      val inner = Multimodal.flacFixture(16000, 1, 16, 16000L)
      val streaminfo = inner.drop(4) // header+34 bytes, last-flag set
      "fLaC".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 3, 1, 2, 3) ++ // VORBIS_COMMENT, len 3
        streaminfo
    }
    assert(Multimodal.decodeFlac(padded).get.durationMs == 1000L)
    // malformed: wrong magic, truncated STREAMINFO, rate 0, null
    assert(Multimodal.decodeFlac("OggS....".getBytes).isEmpty)
    assert(Multimodal.decodeFlac(f.take(20)).isEmpty)
    val zeroRate = f.clone()
    zeroRate(8 + 10) = 0; zeroRate(8 + 11) = 0
    zeroRate(8 + 12) = (zeroRate(8 + 12) & 0x0f).toByte
    assert(Multimodal.decodeFlac(zeroRate).isEmpty)
    assert(Multimodal.decodeFlac(null).isEmpty)
    // dispatch: flac rows get real features, garbage the stub
    val df = Seq((1L, f), (2L, "garbage bytes!".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "audio"))
      .select("doc_id", "channels", "duration_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2, 61500L)))
    val stub = Multimodal.decodeStub("garbage bytes!".getBytes, "audio")
    assert(out(1) == ((2L, stub.channels, stub.durationMs)))
  }

  test("MP3 header walk: ID3v2 syncsafe skip, Xing frame count, CRC shift, CBR estimate, malformed shapes fall back") {
    // MPEG-1 stereo with an ID3v2 tag: 44100 Hz, 1152 samples/frame
    val f1 = Multimodal.mp3Fixture(sampleRate = 44100, channels = 2,
      frames = 38L * 44100 / 1152, tagBytes = 257) // syncsafe straddle
    assert(Multimodal.decodeMp3(f1).contains(
      Multimodal.MediaFeatures(0, 0, 2,
        (38L * 44100 / 1152) * 1152L * 1000L / 44100L)))
    // MPEG-2 mono, bare (no tag): 22050 Hz, 576 samples/frame
    val f2 = Multimodal.mp3Fixture(22050, 1, frames = 1000L)
    assert(Multimodal.decodeMp3(f2).contains(
      Multimodal.MediaFeatures(0, 0, 1, 1000L * 576 * 1000 / 22050)))
    // protection bit CLEAR: a 2-byte CRC precedes the side info and
    // the Xing offset must shift with it
    val crc = {
      val b = Multimodal.mp3Fixture(48000, 1, frames = 4800L)
      b.take(1) ++ Array((b(1) & 0xfe).toByte) ++ b.slice(2, 4) ++
        Array[Byte](0, 0) ++ b.drop(4)
    }
    assert(Multimodal.decodeMp3(crc).get.durationMs ==
      4800L * 1152 * 1000 / 48000)
    // no Xing block -> CBR estimate from the header bitrate (index 9
    // = 128 kbps MPEG-1): bytes*8/kbps milliseconds over the stream
    val cbr = Multimodal.mp3Fixture(32000, 2, frames = 7L)
    for (i <- 0 until 4) cbr(4 + 32 + i) = 0 // erase the Info magic
    assert(Multimodal.decodeMp3(cbr).get.durationMs ==
      cbr.length * 8L / 128L)
    // malformed: no sync in window, truncated, reserved version,
    // wrong layer, ASCII junk, null
    assert(Multimodal.decodeMp3("garbage bytes!".getBytes).isEmpty)
    assert(Multimodal.decodeMp3(f1.take(8)).isEmpty)
    val badVer = f2.clone()
    badVer(1) = ((badVer(1) & 0xe7) | 0x08).toByte // version = 01 reserved
    assert(Multimodal.decodeMp3(badVer).isEmpty)
    val badLayer = f2.clone()
    badLayer(1) = (badLayer(1) & 0xf9).toByte // layer = 00 reserved
    assert(Multimodal.decodeMp3(badLayer).isEmpty)
    assert(Multimodal.decodeMp3(null).isEmpty)
    // dispatch: mp3 rows get real features, garbage the stub
    val df = Seq((1L, f1), (2L, "garbage bytes!".getBytes))
      .toDF("doc_id", "raw")
    val out = Multimodal.extractFeatures(Multimodal.withMedia(df, "raw", "audio"))
      .select("doc_id", "channels", "duration_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2, (38L * 44100 / 1152) * 1152L * 1000L / 44100L)))
    val stub = Multimodal.decodeStub("garbage bytes!".getBytes, "audio")
    assert(out(1) == ((2L, stub.channels, stub.durationMs)))
  }

  test("spectral WAV embedding obeys physics: a pure sine peaks in its own frequency bin") {
    // bins at Nyquist·(d+1)/(dim+1): dim=16, rate 8000 → bins every
    // ~235 Hz starting 235. A 941 Hz sine sits on bin index 3; a
    // 2824 Hz sine on bin index 11 — the embedder must put the argmax
    // THERE, which no byte-hash stub can fake.
    val dim = 16
    def argmax(v: Array[Float]) = v.indexOf(v.max)
    val low = Multimodal.embedWavSpectral(
      Multimodal.sineWavFixture(941.0, 4000), dim).get
    val high = Multimodal.embedWavSpectral(
      Multimodal.sineWavFixture(2824.0, 4000), dim).get
    assert(argmax(low) == 3, low.toSeq)
    assert(argmax(high) == 11, high.toSeq)
    // unit norm, deterministic
    assert(math.abs(low.map(x => x * x).sum - 1.0) < 1e-4)
    assert(low.toSeq == Multimodal.embedWavSpectral(
      Multimodal.sineWavFixture(941.0, 4000), dim).get.toSeq)
    // two nearby tones are more similar to each other than to a
    // far tone (cosine in embedding space tracks spectral distance)
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val mid = Multimodal.embedWavSpectral(
      Multimodal.sineWavFixture(1100.0, 4000), dim).get
    assert(cos(low, mid) > cos(low, high))
    // non-WAV / 8-bit / empty payloads fall back (None)
    assert(Multimodal.embedWavSpectral("not audio at all".getBytes, dim).isEmpty)
    assert(Multimodal.embedWavSpectral(Multimodal.wavFixture(0), dim).isEmpty)
    // a NON-PCM codec declaring 16 bits must NOT be decoded as raw
    // samples (format tag lives at byte 20 of the canonical layout)
    val nonPcm = Multimodal.sineWavFixture(941.0, 4000)
    nonPcm(20) = 3 // WAVE_FORMAT_IEEE_FLOAT
    assert(Multimodal.parseWav(nonPcm).get.audioFormat == 3)
    assert(Multimodal.embedWavSpectral(nonPcm, dim).isEmpty)
    // WAVE_FORMAT_EXTENSIBLE resolves through the SubFormat GUID: a
    // PCM sub-format embeds identically to the canonical fixture, a
    // float sub-format falls back
    def extensible(subTag: Int): Array[Byte] = {
      val payload = Multimodal.sineWavFixture(941.0, 4000).drop(44)
      val bb = java.nio.ByteBuffer.allocate(12 + 48 + 8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 48 + 8 + payload.length)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(40)
        .putShort(0xFFFE.toShort).putShort(1.toShort).putInt(8000)
        .putInt(16000).putShort(2.toShort).putShort(16.toShort)
        .putShort(22.toShort) // cbSize
        .putShort(16.toShort) // valid bits
        .putInt(0)            // channel mask
        .putShort(subTag.toShort).put(new Array[Byte](14)) // SubFormat GUID
      bb.put("data".getBytes("US-ASCII")).putInt(payload.length)
        .put(payload)
      bb.array()
    }
    assert(argmax(Multimodal.embedWavSpectral(extensible(1), dim).get) == 3)
    assert(Multimodal.embedWavSpectral(extensible(3), dim).isEmpty)
    // column-level dispatch: WAV rows spectral, garbage rows stub
    val df = Seq((1L, Multimodal.sineWavFixture(941.0, 4000)),
      (2L, "garbage bytes".getBytes)).toDF("doc_id", "raw")
    val out = Multimodal.embedMedia(
      Multimodal.withMedia(df, "raw", "audio"), dim)
      .select("doc_id", "media_embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(out(0)._2 == low.toSeq)
    assert(out(1)._2 ==
      Multimodal.stubEmbedding("garbage bytes".getBytes, dim).toSeq)
  }

  test("image embedding obeys geometry: the planted bright block is the contrast argmax") {
    val dim = 16
    // every grid position round-trips: plant block i → centered block
    // lumas (dims 4..12) peak at dim 4+i — geometry, not echo
    for (i <- 0 until 9) {
      val v = Multimodal.embedImagePixels(
        Multimodal.blockPngFixture(3, i), dim).get
      val blocks = v.slice(4, 13)
      assert(blocks.indexOf(blocks.max) == i, s"block $i")
      val n2 = v.map(x => x.toDouble * x).sum
      assert(math.abs(n2 - 1.0) < 1e-5) // unit norm
    }
    // solid colors embed by hue: red vs blue differ, red vs red agree
    def solid(rgb: Int) = Multimodal.embedImagePixels(
      Multimodal.pngFixture(12, 12, rgb), dim).get
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(solid(0xFF0000), solid(0xFF0000)) > 0.9999)
    assert(cos(solid(0xFF0000), solid(0x0000FF)) < 0.9)
    // resolution stability: the same pattern at 2× resolution embeds
    // near-identically (the integer block grid is scale-invariant)
    val a = Multimodal.embedImagePixels(
      Multimodal.blockPngFixture(3, 4, cell = 8), dim).get
    val b = Multimodal.embedImagePixels(
      Multimodal.blockPngFixture(3, 4, cell = 16), dim).get
    assert(cos(a, b) > 0.999)
    // non-image bytes fall back (None)
    assert(Multimodal.embedImagePixels("not an image".getBytes, dim).isEmpty)
    // column-level dispatch: PNG rows get PIXEL embeddings, WAV rows
    // spectral, garbage rows the stub — one mixed pass
    val df = Seq(
      (1L, Multimodal.blockPngFixture(3, 7)),
      (2L, Multimodal.sineWavFixture(941.0, 4000)),
      (3L, "garbage bytes".getBytes)).toDF("doc_id", "raw")
    val out = Multimodal.embedMedia(
      Multimodal.withMedia(df, "raw", "image"), dim)
      .select("doc_id", "media_embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(out(0)._2 == Multimodal.embedImagePixels(
      Multimodal.blockPngFixture(3, 7), dim).get.toSeq)
    assert(out(1)._2 == Multimodal.embedWavSpectral(
      Multimodal.sineWavFixture(941.0, 4000), dim).get.toSeq)
    assert(out(2)._2 ==
      Multimodal.stubEmbedding("garbage bytes".getBytes, dim).toSeq)
  }

  test("image near-dup via VectorSearch: the visual clone is found, the different pattern is not") {
    import graft.ext.TextDedup
    val dim = 16
    // doc 1 and its 2×-resolution clone share the block pattern; doc 3
    // is a different pattern; doc 4 is audio (stub-distant by design)
    val df = Seq(
      (1L, Multimodal.blockPngFixture(3, 2, cell = 8)),
      (2L, Multimodal.blockPngFixture(3, 2, cell = 16)),
      (3L, Multimodal.blockPngFixture(3, 6, cell = 8)),
      (4L, Multimodal.sineWavFixture(500.0, 2000))).toDF("doc_id", "raw")
    val emb = Multimodal.embedMedia(
      Multimodal.withMedia(df, "raw", "image"), dim)
      .select(col("doc_id"), col("media_embedding").as("embedding"))
    val pairs = TextDedup.embeddingNearDupsProbe(emb,
      emb.filter(col("doc_id") === 1L), "doc_id", "embedding",
      threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // the clone, nothing else
  }

  test("typed FuelPrice dataset carries the reference DECIMAL(5,2) price") {
    val prices = graft.op.PriceGen.generateTyped(
      spark.read.parquet(s"$sf/supplier.parquet"), "s_suppkey",
      graft.source.Tables.fuelTypes(spark), to_date(lit("2024-06-01")))
    val row = prices.head()
    assert(row.price.scale == 2)
    assert(prices.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(5, 2))
    assert(prices.count() > 0)
  }

  test("sampleFrames slices deterministic byte windows") {
    val out = Multimodal.sampleFrames(mediaDf, frameBytes = 4, stride = 1)
    assert(out.columns.contains("frame_no") && out.columns.contains("frame_bytes"))
    assert(out.count() >= mediaDf.count())
  }

  test("resizeStub truncates and refreshes metadata") {
    val out = Multimodal.resizeStub(mediaDf, 5).orderBy("doc_id").head()
    assert(out.getAs[Array[Byte]]("media").length == 5)
    assert(out.getStruct(out.fieldIndex("media_meta")).getAs[Long]("n_bytes") == 5L)
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed count over file stream (AvailableNow daily-batch shape)") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 7L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 8L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val agg = EventStream.windowedCounts(
      EventStream.readEvents(spark, dir), "5 minutes", "5 minutes", "10 minutes")
    EventStream.runAvailableNow(agg, "win_counts",
      org.apache.spark.sql.streaming.OutputMode.Append)
    // append mode emits only watermark-closed windows; the 00:00 window
    // closes once the 00:20 event advances the watermark
    val out = spark.sql("select event_type, n from win_counts").as[(String, Long)]
      .collect().toMap
    assert(out.get("click").contains(2L))
  }

  test("streaming dedup drops in-horizon duplicate keys (even at different ts)") {
    val dir = java.nio.file.Files.createTempDirectory("evstream3").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "signup", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L, "signup", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 8L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val deduped = EventStream.streamingDedup(
      EventStream.readEvents(spark, dir), Seq("user_id", "event_type"))
    EventStream.runAvailableNow(deduped, "sdedup",
      org.apache.spark.sql.streaming.OutputMode.Append)
    assert(spark.sql("select user_id from sdedup").as[Long].collect().sorted
      .toSeq == Seq(7L, 8L))
  }

  test("streaming ANN candidates == batch candidates (stream-static bucket probe, no state)") {
    import graft.ext.VectorSearch
    // small synthetic corpus + a 2-query stream; batch kernel is the
    // oracle (one code path, so this pins the STREAMING planability of
    // the bucket-probe shape, not new math)
    val dim = 8
    def v(seed: Int) = Array.tabulate(dim)(i =>
      math.sin(seed * 31 + i).toFloat)
    val corpus = (1L to 40L).map(i => (i, v(i.toInt)))
      .toDF("vec_id", "embedding")
    val qdir = java.nio.file.Files.createTempDirectory("annq").toString
    Seq((101L, v(3)), (102L, v(17))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(qdir)
    val schema = spark.read.parquet(qdir).schema
    EventStream.runAvailableNow(
      EventStream.annCandidatesStream(
        spark.readStream.schema(schema).parquet(qdir), corpus,
        "vec_id", "embedding", bits = 3, probeNeighbors = 1),
      "stream_ann")
    val streamed = spark.sql("select * from stream_ann")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = VectorSearch.annCandidates(corpus,
      spark.read.parquet(qdir), "vec_id", "embedding",
      bits = 3, probeNeighbors = 1)
      .select("query_id", "vec_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
    // and the batch top-k over the same candidates is the annTopK
    // the registered query computes — the consumer-side selection
    val topk = VectorSearch.annTopK(corpus, spark.read.parquet(qdir),
      "vec_id", "embedding", k = 5, bits = 3, probeNeighbors = 1)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topk.subsetOf(batch.map(t => (t._1, t._2))))
  }

  test("map-side curation ops run unchanged on a document stream") {
    // scrub + quality scoring + weighted sampling are pure column
    // expressions — the same code must work on readStream without a
    // streaming twin. Batch result is the oracle.
    val dir = java.nio.file.Files.createTempDirectory("docstream").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and more of the words here to pass the gate"),
      (2L, "contact me at someone@example.com for all of the details on this and that topic again"),
      (3L, "x"),
      (4L, "a plain sentence with a few of the common stopwords in it to score above the threshold"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sampling.weightedSample(
        graft.ext.TextAnalysis.qualityScore(
          df.withColumn("text", graft.ext.TextAnalysis.scrub(col("text"))),
          "text"),
        "doc_id", least(lit(1.0), col("quality_score") + lit(0.5)))
        .select("doc_id", "text", "quality_score")
    EventStream.runAvailableNow(
      curate(spark.readStream.schema(schema).parquet(dir)), "stream_curate")
    val streamed = spark.sql("select * from stream_curate").collect().toSet
    val batch = curate(spark.read.parquet(dir)).collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // the scrub actually ran in the stream
    assert(streamed.forall(!_.getString(1).contains("example.com")))
  }

  test("quality model scores a document stream identically to batch") {
    // qualityModel is a pure map-side BIGINT chain — it must run on
    // readStream with no twin. Batch result is the oracle.
    val dir = java.nio.file.Files.createTempDirectory("qmstream").toString
    Seq(
      (1L, "the cat sat on the mat and then the dog came along too"),
      (2L, "1234 5678 9999 0000 1111"),
      (3L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    EventStream.runAvailableNow(
      graft.ext.TextAnalysis.qualityModel(
        spark.readStream.schema(schema).parquet(dir), "text", "doc_id"),
      "stream_qm")
    val streamed = spark.sql("select * from stream_qm").collect().toSet
    val batch = graft.ext.TextAnalysis.qualityModel(
      spark.read.parquet(dir), "text", "doc_id").collect().toSet
    assert(streamed == batch && batch.size == 3)
  }

  test("streaming foreachBatch upserts merged micro-batches into JDBC") {
    val url = "jdbc:derby:memory:streamupsert;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE prices (k VARCHAR(50), price DOUBLE, event_id BIGINT, PRIMARY KEY (k))")
    c.close()
    val dir = java.nio.file.Files.createTempDirectory("evstream4").toString
    Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 3L))
      .toDF("k", "price", "event_id")
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("k string, price double, event_id bigint").parquet(dir)
    val q = EventStream.upsertEachBatch(stream, url, "prices", Seq("k"),
      Seq(col("event_id")), dialect = Sinks.ansiMergeDialect)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val back = spark.read.jdbc(url, "prices", new java.util.Properties)
      .as[(String, Double, Long)].collect().toSet
    assert(back == Set(("a", 2.0, 2L), ("b", 5.0, 3L))) // last write won
  }

  test("stateful LWW: a late batch with an older event does not clobber newer state") {
    val dir = java.nio.file.Files.createTempDirectory("evstream5").toString
    // file 1 carries the NEWER event; file 2 (arriving in a later
    // micro-batch via maxFilesPerTrigger=1) carries an OLDER one
    Seq((10L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 7L, "price", 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    Seq((5L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L, "price", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir + "/f2")
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val merged = EventStream.lastWriteWinsStream(spark, stream)
    EventStream.runAvailableNow(merged.toDF(), "lww_late",
      org.apache.spark.sql.streaming.OutputMode.Update)
    // final state for the key must hold the NEWER event's value
    val last = spark.sql("select value, updates from lww_late order by updates desc limit 1")
      .as[(Double, Long)].head()
    assert(last._1 == 100.0, s"older late event clobbered state: $last")
    assert(last._2 == 2L)
  }

  test("streaming asof enriches probes with latest reference row across batches") {
    val dir = java.nio.file.Files.createTempDirectory("evasof").toString
    // batch 1: a reference row then a probe after it (same micro-batch).
    // coalesce(1): one parquet file per logical batch, or
    // maxFilesPerTrigger=1 would split rows across micro-batches in
    // file-listing order
    Seq(("k1", 10L, 0, 100L, 1.5), ("k1", 15L, 1, 1L, 0.0))
      .toDF("key", "t", "side", "id", "value")
      .coalesce(1).write.parquet(dir + "/f1")
    Thread.sleep(1100)
    // batch 2: a probe relying on carried state, and a too-late probe
    Seq(("k1", 20L, 1, 2L, 0.0), ("k1", 5L, 1, 3L, 0.0))
      .toDF("key", "t", "side", "id", "value")
      .coalesce(1).write.parquet(dir + "/f2")
    val stream = spark.readStream
      .schema("key string, t bigint, side int, id bigint, value double")
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val enriched = EventStream.streamingAsof(spark, stream)
    EventStream.runAvailableNow(enriched.toDF(), "sasof",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val out = spark.sql("select id, ref_id, ref_value from sasof")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
    assert(out(1L).contains((100L, 1.5))) // same-batch match
    assert(out(2L).contains((100L, 1.5))) // state carried across batches
    assert(out(3L).isEmpty) // probe older than kept reference: unmatched
  }

  test("LWW state expires after the event-time TTL; post-expiry events start fresh") {
    val dir = java.nio.file.Files.createTempDirectory("evttl").toString
    def write(sub: String, rows: Seq[(Long, String, Long, Double)]): Unit = {
      rows.map { case (id, ts, uid, v) =>
        (id, java.sql.Timestamp.valueOf(ts), uid, "price", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/$sub")
      Thread.sleep(1100) // distinct mtimes => deterministic batch order
    }
    // f1: key 7 gets value 100 (version 10); its timer is scheduled at
    // its event time + 60 s. f2: unrelated key 8 a day ahead — its
    // trigger still runs under f1's watermark, but AFTER it the
    // watermark jumps past 7's timeout. f3: another key-8 filler whose
    // trigger fires 7's expired timer (timers only fire for groups with
    // no data in the trigger) → flush + remove. f4: an OLDER event for
    // 7 — with live state it could never win (version floor); after
    // expiry it starts a fresh floor and must win. f4's TIMESTAMP is
    // recent (rows behind the watermark are dropped by the engine's
    // late-row filter before the stateful op); only its VERSION
    // (event_id 5 < 10) is old, which is what the state floor tracks.
    write("f1", Seq((10L, "2024-01-01 00:10:00", 7L, 100.0)))
    write("f2", Seq((200L, "2024-01-02 00:00:00", 8L, 8.0)))
    write("f3", Seq((201L, "2024-01-02 00:01:00", 8L, 8.1)))
    write("f4", Seq((5L, "2024-01-02 00:02:00", 7L, 50.0)))
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val merged = EventStream.lastWriteWinsStream(spark, stream,
      watermark = "1 minute", stateTTLMs = 60000L)
    EventStream.runAvailableNow(merged.toDF(), "lww_ttl",
      org.apache.spark.sql.streaming.OutputMode.Update)
    val rows7 = spark.sql("select value, updates from lww_ttl where key = '7|price'")
      .as[(Double, Long)].collect().toSeq
    // fresh state after expiry: the old event won with a reset counter
    assert(rows7.contains((50.0, 1L)), rows7.toString)
    // had state survived, the older event would have been absorbed into
    // the existing state as (100.0, 2)
    assert(!rows7.contains((100.0, 2L)), rows7.toString)
  }

  test("asof reference state expires after the TTL; later probes emit unmatched") {
    val dir = java.nio.file.Files.createTempDirectory("evasofttl").toString
    def write(sub: String, rows: Seq[(String, Long, Int, Long, Double)]): Unit = {
      rows.toDF("key", "t", "side", "id", "value")
        .coalesce(1).write.parquet(s"$dir/$sub")
      Thread.sleep(1100)
    }
    // f1: k1 reference at t=1000ms (timeout scheduled at wm(0)+5000).
    // f2/f3: k2 filler far ahead — f2 lifts the watermark, f3's trigger
    // fires k1's expired timer (k1 has no data in it). f4: a k1 probe
    // AFTER expiry: must emit unmatched, not enrich from dropped state.
    write("f1", Seq(("k1", 1000L, 0, 100L, 1.5)))
    write("f2", Seq(("k2", 2000000L, 0, 200L, 2.0)))
    write("f3", Seq(("k2", 2100000L, 0, 201L, 2.1)))
    write("f4", Seq(("k1", 2200000L, 1, 9L, 0.0)))
    val stream = spark.readStream
      .schema("key string, t bigint, side int, id bigint, value double")
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val enriched = EventStream.streamingAsof(spark, stream,
      watermark = "1 second", stateTTLMs = 5000L)
    EventStream.runAvailableNow(enriched.toDF(), "sasof_ttl",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val probe = spark.sql("select ref_id from sasof_ttl where id = 9").head()
    assert(probe.isNullAt(0), s"probe matched expired state: $probe")
  }

  test("stateful last-write-wins stream merges to latest value per key") {
    val dir = java.nio.file.Files.createTempDirectory("evstream2").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "price", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 7L, "price", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val merged = EventStream.lastWriteWinsStream(spark,
      EventStream.readEvents(spark, dir))
    EventStream.runAvailableNow(merged.toDF(), "lww",
      org.apache.spark.sql.streaming.OutputMode.Update)
    val out = spark.sql("select key, value, updates from lww")
      .as[(String, Double, Long)].collect()
    assert(out.toSeq == Seq(("7|price", 20.0, 2L)))
  }

  test("streaming rolling stats equal the batch rollingAgg across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("roll").toString
    def row(id: Long, ts: String, uid: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), uid, "m", v, "{}")
    // two users interleaved; file split is mid-stream so the ring state
    // must carry across micro-batches to stay batch-equivalent
    val f1 = Seq(row(1, "2024-01-01 00:01:00", 7, 1.25),
      row(2, "2024-01-01 00:02:00", 8, 10.00),
      row(3, "2024-01-01 00:03:00", 7, 2.50))
    val f2 = Seq(row(4, "2024-01-01 00:04:00", 7, 4.75),
      row(5, "2024-01-01 00:05:00", 8, 0.01),
      row(6, "2024-01-01 00:06:00", 7, 3.33))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    f1.toDF(cols: _*).coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF(cols: _*).coalesce(1).write.parquet(s"$dir/f2")
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val rolled = EventStream.rollingStatsStream(spark, stream, window = 2)
    EventStream.runAvailableNow(rolled.toDF(), "sroll",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val got = spark.sql(
      "select user_id, event_id, roll_sum, roll_n, roll_avg from sroll")
      .as[(Long, Long, Double, Long, Double)].collect().sortBy(_._2)
    val expected = graft.op.Stats.rollingAgg(
      (f1 ++ f2).toDF(cols: _*), Seq("user_id"), Seq("ts", "event_id"),
      "value", window = 2)
      .select($"user_id", $"event_id", $"roll_sum", $"roll_n", $"roll_avg")
      .as[(Long, Long, Double, Long, Double)].collect().sortBy(_._2)
    assert(got.toSeq == expected.toSeq)
  }

  test("streaming SCD2 closed intervals equal the batch collapse across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("scd2s").toString
    def row(id: Long, ts: String, uid: Long, st: String) =
      (id, java.sql.Timestamp.valueOf(ts), uid, st, 0.0, "{}")
    // user 7 flips a→a→b→a (flip mid-file and across the file split);
    // user 8 never flips, so it must emit NO closed interval at all
    val f1 = Seq(row(1, "2024-01-01 00:01:00", 7, "a"),
      row(2, "2024-01-01 00:02:00", 7, "a"),
      row(3, "2024-01-01 00:03:00", 8, "x"),
      row(4, "2024-01-01 00:04:00", 7, "b"))
    val f2 = Seq(row(5, "2024-01-01 00:05:00", 7, "a"),
      row(6, "2024-01-01 00:06:00", 8, "x"))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    f1.toDF(cols: _*).coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF(cols: _*).coalesce(1).write.parquet(s"$dir/f2")
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.scd2Stream(spark, stream)
    EventStream.runAvailableNow(out.toDF(), "sscd2",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val got = spark.sql(
      """select user_id, state, valid_from, valid_to, n_snapshots
         from sscd2 order by user_id, valid_from""")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long)]
      .collect().toSeq
    val batchClosed = graft.op.Scd.collapse(
      (f1 ++ f2).toDF(cols: _*).select($"user_id", $"event_type", $"ts"),
      "user_id", "event_type", $"ts")
      .filter(!$"is_current")
      .select($"user_id", $"event_type", $"valid_from", $"valid_to",
        $"n_snapshots")
      .orderBy($"user_id", $"valid_from")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long)]
      .collect().toSeq
    assert(got == batchClosed)
    assert(got.map(_._1).forall(_ == 7L), "user 8 never flips: no closed interval")
  }

  test("streaming bm25 routing equals the batch kernel across micro-batches") {
    import graft.ext.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("route").toString
    // model snapshotted from a small reference corpus
    val corpus = Seq(
      (1L, "spark shuffle join partitions broadcast"),
      (2L, "tennis football match score goal"),
      (3L, "spark sql join planner"),
      (4L, "football stadium crowd score")).toDF("doc_id", "text")
    val routes = Map(
      "eng" -> Seq("spark", "join", "shuffle"),
      "sport" -> Seq("football", "tennis", "score"))
    val model = TextAnalysis.bm25Snapshot(corpus, "text", "doc_id", routes)
    assert(model.nDocs == 4 && model.termDf("spark") == 2 &&
      model.termDf("score") == 2)
    // incoming docs split across two micro-batches; doc 13 matches no
    // route term and must emit nothing
    val f1 = Seq((10L, "spark join tuning"), (11L, "football score update"))
    val f2 = Seq((12L, "shuffle spark spark"), (13L, "cooking pasta recipe"))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val buf = collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
    val q = EventStream.bm25RouteStream(stream, "text", "doc_id", model) {
      out => buf.synchronized {
        buf ++= out.as[(Long, String, Long, Long)].collect()
      }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = TextAnalysis.bm25Route(
      (f1 ++ f2).toDF("doc_id", "text"), "text", "doc_id", model)
      .as[(Long, String, Long, Long)].collect()
    // bit-equal to the batch kernel regardless of the batch split
    assert(buf.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq)
    val byDoc = buf.map(r => r._1 -> r._2).toMap
    assert(byDoc(10L) == "eng" && byDoc(12L) == "eng" &&
      byDoc(11L) == "sport")
    assert(!byDoc.contains(13L), "no-match docs emit nothing")
  }

  test("streaming decontamination equals the batch kernel across micro-batches") {
    import graft.ext.TextDedup
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    val benchmark = Seq("the quick brown fox jumps high")
      .toDF("text") // trigrams: {the quick brown, quick brown fox, ...}
    // doc 20 leaks a benchmark trigram mid-sentence; 21/23 are clean;
    // 22 shares words but never three in a row
    val f1 = Seq(
      (20L, "today the quick brown fox appeared"),
      (21L, "completely unrelated clean document text"))
    val f2 = Seq(
      (22L, "brown the quick fox scrambled order"),
      (23L, "another clean sentence entirely"))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val buf = collection.mutable.ArrayBuffer[(Long, String)]()
    val q = EventStream.decontaminateStream(stream, "text", "doc_id",
      benchmark, "text") { out =>
      buf.synchronized { buf ++= out.as[(Long, String)].collect() }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = TextDedup.decontaminate(
      (f1 ++ f2).toDF("doc_id", "text"), "text", "doc_id",
      benchmark, "text")
      .as[(Long, String)].collect()
    assert(buf.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq)
    assert(buf.map(_._1).toSet == Set(21L, 22L, 23L),
      "only the doc leaking a full benchmark trigram is dropped")
  }

  test("streaming winnow probe equals the batch kernel across micro-batches") {
    import graft.ext.TextDedup
    val rnd = new scala.util.Random(31)
    def noise(n: Int) = (1 to n).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(8)))
      .mkString(" ")
    val passage = noise(10)
    val corpus = Seq((1L, s"${noise(5)} $passage ${noise(6)}"),
      (2L, noise(30))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("wstream").toString
    val f1 = Seq((100L, s"$passage ${noise(12)}"))
    val f2 = Seq((101L, noise(20)), (102L, s"${noise(9)} $passage"))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100)
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val buf = collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = EventStream.winnowCrossStream(stream, corpus, "text", "doc_id",
      minShared = 2) { out =>
      buf.synchronized { buf ++= out.as[(Long, Long, Long)].collect() }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = TextDedup.winnowingCrossMatches(
      (f1 ++ f2).toDF("doc_id", "text"), corpus, "text", "doc_id",
      minShared = 2).as[(Long, Long, Long)].collect()
    assert(buf.sortBy(r => (r._1, r._2)).toSeq ==
      batch.sortBy(r => (r._1, r._2)).toSeq)
    assert(buf.map(_._1).toSet == Set(100L, 102L), "both leakers found")
  }

  test("streaming simhash guard equals batch kernel; stateless append plan") {
    import graft.ext.TextDedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about spark query engines and planning"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shstream").toString
    val f1 = Seq((100L, "the quick brown fox jumps over the lazy dog near the river bank"))
    val f2 = Seq((101L, "unrelated words entirely outside either reference document family"),
      (102L, "the quick brown fox jumps over the lazy dog near the river bend"))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.simhashGuardStream(stream, corpus, "text", "doc_id",
      maxHamming = 8)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("shguard")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // stateless by design: append mode with NO state store operators
    assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty))
    val got = spark.sql("select doc_id, corpus_id, hamming from shguard")
      .as[(Long, Long, Long)].collect()
    val batch = TextDedup.simhashCrossPortable(
      (f1 ++ f2).toDF("doc_id", "text"), corpus, "text", "doc_id",
      maxHamming = 8).as[(Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq ==
      batch.sortBy(r => (r._1, r._2)).toSeq)
    assert(got.exists(r => r._1 == 100L && r._2 == 1L && r._3 == 0L),
      "exact clone flagged at hamming 0")
  }

  test("streaming quota caps each group at k across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("quota").toString
    // s1 arrives 3 then 2 (quota 4 -> batch2 admits only the smallest
    // id); s2 stays under quota
    val f1 = Seq(("s1", 11L), ("s1", 12L), ("s1", 13L), ("s2", 21L))
    val f2 = Seq(("s1", 15L), ("s1", 14L), ("s2", 22L))
    f1.toDF("source", "doc_id").coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF("source", "doc_id").coalesce(1).write.parquet(s"$dir/f2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("source", "string").add("doc_id", "long")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.quotaStream(spark, stream, "source", "doc_id", 4)
    EventStream.runAvailableNow(out, "squota",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val got = spark.sql("select source, doc_id from squota")
      .as[(String, Long)].collect().toSet
    // batch1 admits 11,12,13; batch2 has room for ONE more s1 row and
    // admits the smaller id (14), rejecting 15
    assert(got == Set(("s1", 11L), ("s1", 12L), ("s1", 13L), ("s1", 14L),
      ("s2", 21L), ("s2", 22L)))
  }

  test("bm25 route ties break on route name; empty corpus snapshot rejected") {
    import graft.ext.TextAnalysis
    val corpus = Seq((1L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    // two routes sharing the identical term set => identical scores
    val model = TextAnalysis.bm25Snapshot(corpus, "text", "doc_id",
      Map("b_route" -> Seq("alpha"), "a_route" -> Seq("alpha")))
    val out = TextAnalysis.bm25Route(
      Seq((9L, "alpha alpha")).toDF("doc_id", "text"),
      "text", "doc_id", model)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 1 && out.head._2 == "a_route")
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Snapshot(
        corpus.filter($"doc_id" > 99), "text", "doc_id",
        Map("r" -> Seq("alpha")))
    }
  }

  test("bm25 route scores snapshot-unseen terms at the max-idf limit") {
    import graft.ext.TextAnalysis
    // snapshot corpus never contains "zeta" -> dfq = 0 in the frozen
    // model; a streamed/new document carrying it must still score (at
    // idf (n+0.5)/0.5), NOT be silently dropped — the df=0 hole would
    // lose exactly the highest-idf route terms
    val corpus = Seq((1L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.bm25Snapshot(corpus, "text", "doc_id",
      Map("seen" -> Seq("alpha"), "unseen" -> Seq("zeta")))
    assert(model.termDf.get("zeta").isEmpty) // truly absent from snapshot
    val out = TextAnalysis.bm25Route(
      Seq((9L, "zeta zeta zeta")).toDF("doc_id", "text"),
      "text", "doc_id", model)
      .as[(Long, String, Long, Long)].collect()
    // expected micro-points via the same IEEE double op chain as
    // Bm25.pointsSql with n_docs=2, sum_dl=4, dl=3, tf=3, dfq=0
    val idf = ((2.0 - 0.0) + 0.5) / (0.0 + 0.5) // max-idf limit: 5.0
    val tfp = 3.0 * (1.2 + 1.0) /
      (3.0 + 1.2 * ((1.0 - 0.75) + 0.75 * 3.0 / 2.0))
    val expected = math.round(idf * tfp * 1e6)
    assert(out.toSeq == Seq((9L, "unseen", expected, 1L)))
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("S9 DDL generation mirrors the reference gas_station table") {
    val sql = Sinks.createTableSql("gas_station", graft.model.Schemas.gasStation,
      primaryKey = Seq("location_id"))
    assert(sql.startsWith("CREATE TABLE IF NOT EXISTS gas_station"))
    assert(sql.contains("location_id VARCHAR(255) NOT NULL"))
    assert(sql.contains("latitude DOUBLE PRECISION"))
    assert(sql.contains("PRIMARY KEY (location_id)"))
  }

  test("S8 upsert SQL matches the reference ON CONFLICT form") {
    val sql = Sinks.upsertSql("fuel_price",
      Seq("location_id", "fuel_type", "price", "date"),
      Seq("location_id", "fuel_type", "date"))
    assert(sql ==
      "INSERT INTO fuel_price (location_id, fuel_type, price, date) VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (location_id, fuel_type, date) DO UPDATE SET price = EXCLUDED.price")
  }

  test("S7 batched JDBC append writes through to an embedded Derby table") {
    val url = s"jdbc:derby:memory:graftdb;create=true"
    val df = Seq(("loc-1", "BP"), ("loc-2", "Z")).toDF("location_id", "brand_name")
    Sinks.jdbcAppend(df, url, "stations")
    val back = spark.read.jdbc(url, "stations", new java.util.Properties)
    assert(back.count() == 2)
    assert(back.select("location_id").as[String].collect().toSet == Set("loc-1", "loc-2"))
  }

  test("S8 distributed upsert round-trip via ANSI MERGE on Derby") {
    val url = "jdbc:derby:memory:upsertdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE fuel_price (location_id VARCHAR(50), fuel_type VARCHAR(20), " +
        "price DOUBLE, PRIMARY KEY (location_id, fuel_type))")
    conn.close()
    // seed two rows, then upsert a batch that updates one and inserts one
    val seed = Seq(("a", "Diesel", 2.10), ("b", "Diesel", 2.20))
      .toDF("location_id", "fuel_type", "price")
    Sinks.jdbcUpsert(seed, url, "fuel_price",
      Seq("location_id", "fuel_type"), dialect = Sinks.ansiMergeDialect)
    val update = Seq(("a", "Diesel", 9.99), ("c", "Diesel", 3.30))
      .toDF("location_id", "fuel_type", "price")
    Sinks.jdbcUpsert(update, url, "fuel_price",
      Seq("location_id", "fuel_type"), dialect = Sinks.ansiMergeDialect)
    val back = spark.read.jdbc(url, "fuel_price", new java.util.Properties)
      .as[(String, String, Double)].collect().toSet
    assert(back == Set(("a", "Diesel", 9.99), ("b", "Diesel", 2.20),
      ("c", "Diesel", 3.30)))
  }

  test("date-partitioned parquet sink produces partition directories") {
    val dir = java.nio.file.Files.createTempDirectory("pricesink").toString
    val df = Seq(("a", "Diesel", 2.1, java.sql.Date.valueOf("2024-06-01")),
      ("b", "Diesel", 2.2, java.sql.Date.valueOf("2024-06-02")))
      .toDF("location_id", "fuel_type", "price", "date")
    Sinks.parquetByDate(df, dir)
    val parts = new java.io.File(dir).list().filter(_.startsWith("date="))
    assert(parts.toSet == Set("date=2024-06-01", "date=2024-06-02"))
    assert(spark.read.parquet(dir).count() == 2)
  }
}

package graft

import graft.ext.{FlacCodec, G711Adpcm, Multimodal}

/** The compressed-telephony WAV codecs (round 13): G.711 mu-law /
  * A-law and IMA ADPCM round-trip within their spec SNR, the WAV
  * decode layer dispatches on the fmt tag, and each path carries the
  * planted-sine physics oracle ([[Multimodal.embedWavSpectral]]'s
  * Goertzel argmax lands on the planted bin).
  */
class G711AdpcmSpec extends SparkSpec {

  private def sine(freqHz: Double, n: Int, rate: Int = 8000,
                   amp: Int = 12000): Array[Short] =
    Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freqHz * i / rate) * amp).toShort)

  private def snrDb(orig: Array[Short], dec: Array[Short]): Double = {
    var s = 0.0; var e = 0.0
    orig.indices.foreach { i =>
      s += orig(i).toDouble * orig(i)
      val d = orig(i) - dec(i).toDouble; e += d * d
    }
    10 * math.log10(s / math.max(e, 1e-12))
  }

  test("G.711 mu-law and A-law round-trip within spec SNR, all byte " +
    "codes decode monotone-safe") {
    val x = sine(1000.0, 2000)
    val mu = x.map(s => G711Adpcm.mulawDecode(G711Adpcm.mulawEncode(s)))
    val al = x.map(s => G711Adpcm.alawDecode(G711Adpcm.alawEncode(s)))
    assert(snrDb(x, mu) > 30.0, s"mu-law SNR ${snrDb(x, mu)}")
    assert(snrDb(x, al) > 30.0, s"A-law SNR ${snrDb(x, al)}")
    // zero maps near zero; extremes keep their sign and magnitude order
    assert(math.abs(G711Adpcm.mulawDecode(G711Adpcm.mulawEncode(0)).toInt) <= 8)
    assert(G711Adpcm.mulawDecode(G711Adpcm.mulawEncode(32000)) > 28000)
    assert(G711Adpcm.mulawDecode(G711Adpcm.mulawEncode(-32000)) < -28000)
    assert(G711Adpcm.alawDecode(G711Adpcm.alawEncode(32000)) > 28000)
    assert(G711Adpcm.alawDecode(G711Adpcm.alawEncode(-32000)) < -28000)
    // every byte value decodes without throwing, both tables
    (0 until 256).foreach { b =>
      G711Adpcm.mulawDecode(b.toByte); G711Adpcm.alawDecode(b.toByte)
    }
  }

  test("IMA ADPCM round-trips a sine within adaptive-codec SNR across " +
    "block boundaries; padding past the fact count is ignored") {
    val x = sine(1000.0, 2000)
    val enc = G711Adpcm.imaEncode(x, blockAlign = 256)
    assert(enc.length == 4 * 256) // ceil(2000 / 505) blocks
    val dec = G711Adpcm.imaDecode(enc, 0, enc.length, 256, x.length)
      .getOrElse(fail("decode failed"))
    assert(dec.length == x.length)
    assert(snrDb(x, dec) > 12.0, s"ADPCM SNR ${snrDb(x, dec)}")
    // block boundary: sample 505 is the second block's verbatim header
    assert(dec(505) == x(505))
    // malformed: index byte out of range rejects
    val bad = enc.clone(); bad(2) = 120.toByte
    assert(G711Adpcm.imaDecode(bad, 0, bad.length, 256, x.length).isEmpty)
    // truncated payload cannot produce the declared count
    assert(G711Adpcm.imaDecode(enc, 0, 256, 256, x.length).isEmpty)
  }

  test("IMA ADPCM honors a declared wSamplesPerBlock smaller than the " +
    "block's nibble capacity — padding nibbles are not audio") {
    val x = sine(1000.0, 1000)
    val spb = 250 // capacity at blockAlign=256 is 505
    val enc = x.grouped(spb)
      .map(G711Adpcm.imaEncode(_, blockAlign = 256)).reduce(_ ++ _)
    assert(enc.length == 4 * 256)
    val dec = G711Adpcm.imaDecode(enc, 0, enc.length, 256, x.length,
      samplesPerBlock = spb).getOrElse(fail("decode failed"))
    assert(dec.length == x.length)
    // slightly below the full-capacity 12 dB: the per-chunk encode
    // restarts step-index adaptation at every 250-sample block
    assert(snrDb(x, dec) > 10.0, s"ADPCM SNR ${snrDb(x, dec)}")
    // sample 250 is the second block's verbatim header — alignment proof
    assert(dec(250) == x(250))
    // ignoring the declared count decodes padding as audio and
    // misplaces every later block's samples (this was the pre-r14 bug)
    val wrong = G711Adpcm.imaDecode(enc, 0, enc.length, 256, x.length).get
    assert(snrDb(x, wrong) < 6.0,
      s"capacity-decode should misalign, got SNR ${snrDb(x, wrong)}")
    // end-to-end: a real WAV declaring the small wSamplesPerBlock still
    // carries the planted sine to the right Goertzel bin
    val wav = Multimodal.sineWavAdpcmFixture(1000.0, 1000,
      samplesPerBlock = spb)
    val v = Multimodal.embedWavSpectral(wav)
      .getOrElse(fail("small-spb ADPCM WAV fell to None"))
    assert(v.indexOf(v.max) == 3) // 1000 Hz → bin 3 of 16 @ 8 kHz
  }

  test("parseWav reads the compressed fmt layouts: tags 6/7/0x11, " +
    "blockAlign, wSamplesPerBlock, and the fact frame count") {
    val g = Multimodal.parseWav(
      Multimodal.sineWavG711Fixture(1000.0, 800, alaw = false)).get
    assert(g.audioFormat == 7 && g.bitsPerSample == 8 && g.channels == 1)
    assert(g.dataBytes == 800 && g.byteRate == 8000)
    val a = Multimodal.parseWav(
      Multimodal.sineWavG711Fixture(1000.0, 800, alaw = true)).get
    assert(a.audioFormat == 6)
    val ad = Multimodal.parseWav(
      Multimodal.sineWavAdpcmFixture(1000.0, 2000)).get
    assert(ad.audioFormat == 0x11 && ad.bitsPerSample == 4)
    assert(ad.blockAlign == 256 && ad.samplesPerBlock == 505)
    assert(ad.factSamples == 2000L)
    // duration from the header math still holds for compressed payloads
    val feat = Multimodal.decodeWav(
      Multimodal.sineWavG711Fixture(1000.0, 800)).get
    assert(feat.durationMs == 100L) // 800 bytes / 8000 B/s
  }

  test("the spectral embedder dispatches on the fmt tag and lands the " +
    "Goertzel argmax on the planted bin for every compressed path") {
    for (bin <- Seq(0, 5, 11, 15)) {
      val freq = 4000.0 * (bin + 1) / 17.0
      val mu = Multimodal.embedWavSpectral(
        Multimodal.sineWavG711Fixture(freq, 2000, alaw = false)).get
      val al = Multimodal.embedWavSpectral(
        Multimodal.sineWavG711Fixture(freq, 2000, alaw = true)).get
      val ad = Multimodal.embedWavSpectral(
        Multimodal.sineWavAdpcmFixture(freq, 2000)).get
      assert(mu.indexOf(mu.max) == bin, s"mu-law bin $bin")
      assert(al.indexOf(al.max) == bin, s"A-law bin $bin")
      assert(ad.indexOf(ad.max) == bin, s"ADPCM bin $bin")
    }
    // a compressed WAV and its 16-bit PCM twin embed to near-identical
    // vectors (same planted signal through different byte layers)
    val pcm = Multimodal.embedWavSpectral(
      Multimodal.sineWavFixture(1000.0, 2000)).get
    val al = Multimodal.embedWavSpectral(
      Multimodal.sineWavG711Fixture(1000.0, 2000, alaw = true)).get
    val cos = pcm.zip(al).map { case (p, q) => p.toDouble * q }.sum
    assert(cos > 0.99, s"PCM-vs-A-law embedding cosine $cos")
  }

  test("unknown compressed tags never decode as raw samples") {
    // MS ADPCM (tag 2) declaring 16 bits must fall through to None
    val blob = Multimodal.sineWavFixture(1000.0, 500)
    blob(20) = 2 // overwrite the fmt tag in place
    assert(Multimodal.embedWavSpectral(blob).isEmpty)
    assert(Multimodal.wavMonoSamples(blob).isEmpty)
    // stereo G.711: hand-widen the mono fixture to 2 interleaved
    // channels — the mono mix embeds to the same argmax
    val mono = Multimodal.sineWavG711Fixture(1000.0, 1000)
    val payload = mono.drop(46)
    val stereo = java.nio.ByteBuffer.allocate(46 + 2 * payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    stereo.put(mono, 0, 46)
    payload.foreach { b => stereo.put(b).put(b) }
    val sb = stereo.array()
    // patch RIFF size, channels, byteRate, blockAlign, data size
    def putShortAt(off: Int, v: Int): Unit = {
      sb(off) = (v & 0xff).toByte; sb(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putIntAt(off: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { sb(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putIntAt(4, 38 + 2 * payload.length)
    putShortAt(22, 2)
    putIntAt(28, 16000)
    putShortAt(32, 2)
    putIntAt(42, 2 * payload.length)
    val v = Multimodal.embedWavSpectral(sb).get
    assert(v.indexOf(v.max) == 3) // 1000 Hz sits in bin 3 of 16 @ 8 kHz
  }

  test("Ogg FLAC reassembles the native stream across lacing " +
    "boundaries and embeds identically to the bare FLAC stream") {
    for (mode <- Seq[FlacCodec.Mode](FlacCodec.Verbatim, FlacCodec.Fixed2,
      FlacCodec.Lpc1)) {
      val ogg = Multimodal.oggFlacFixture(941.0, 1200, mode = mode)
      // Verbatim frames exceed 255 bytes, so the audio packet laces
      // across multiple segments — the reassembly under test
      val native = Multimodal.decodeOggFlac(ogg)
        .getOrElse(fail(s"ogg walk failed for $mode"))
      assert(native.sameElements(
        Multimodal.sineFlacFixture(941.0, 1200, mode = mode)),
        s"native stream mismatch under $mode")
      val v = Multimodal.embedOggFlacSpectral(ogg).get
      assert(v.indexOf(v.max) == 3, s"argmax under $mode")
      val bare = Multimodal.embedFlacSpectral(
        Multimodal.sineFlacFixture(941.0, 1200, mode = mode)).get
      assert(v.sameElements(bare), s"ogg vs bare embedding under $mode")
    }
    // REAL-file shape: nHeaders=1 VorbisComment header packet, with
    // the STREAMINFO last-metadata-block flag cleared — the header
    // packet must land in the native stream verbatim (it is the
    // metadata block the walk expects next), not be dropped
    val oggVc = Multimodal.oggFlacFixture(941.0, 1200, vorbisComment = true)
    val vVc = Multimodal.embedOggFlacSpectral(oggVc)
      .getOrElse(fail("VorbisComment-bearing Ogg FLAC fell to None"))
    assert(vVc.indexOf(vVc.max) == 3, "argmax with VorbisComment header")
    val nativeVc = Multimodal.decodeOggFlac(oggVc).get
    // the reassembled stream still decodes the SAME pcm as the bare one
    val pcmVc = FlacCodec.decodePcm(nativeVc).get
    val pcmBare = FlacCodec.decodePcm(
      Multimodal.sineFlacFixture(941.0, 1200)).get
    assert(pcmVc.samples.head.sameElements(pcmBare.samples.head),
      "pcm mismatch once a VorbisComment block rides the stream")
    // a BOS claiming more header packets than the stream carries is
    // rejected (nHeaders as sanity bound): BOS page = 27-byte header +
    // 1 lace byte, so the packet's u16be nHeaders sits at bytes 35-36
    val oggBadN = Multimodal.oggFlacFixture(941.0, 1200)
    oggBadN(35) = 0; oggBadN(36) = 9
    assert(Multimodal.decodeOggFlac(oggBadN).isEmpty,
      "overstated nHeaders must fail the sanity bound")
    // non-FLAC Ogg (Vorbis id header) does not decode as FLAC
    assert(Multimodal.decodeOggFlac(
      Multimodal.oggFixture(1000L, channels = 2)).isEmpty)
    assert(Multimodal.embedOggFlacSpectral(
      Multimodal.oggFixture(1000L, channels = 2, opus = true)).isEmpty)
    // and plain garbage is rejected
    assert(Multimodal.decodeOggFlac(Array.fill[Byte](64)(7)).isEmpty)
  }
}

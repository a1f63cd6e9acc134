package graft

import graft.ext.{FlacCodec, Multimodal}

/** The FLAC PCM codec (round 13): every subframe type round-trips
  * bit-exactly, the compressed path carries the same physics oracle
  * as the WAV path, and a FLAC encode embeds identically to its WAV
  * twin (shared Goertzel kernel over identical samples).
  */
class FlacCodecSpec extends SparkSpec {

  private def sine(freqHz: Double, n: Int, rate: Int = 8000,
                   amp: Int = 12000): Array[Int] =
    Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freqHz * i / rate) * amp).toInt)

  private def roundTrip(samples: Array[Array[Int]], rate: Int, bps: Int,
                        blockSize: Int, mode: FlacCodec.Mode): Unit = {
    val blob = FlacCodec.encode(samples, rate, bps, blockSize, mode)
    val pcm = FlacCodec.decodePcm(blob)
      .getOrElse(fail(s"decode failed for $mode"))
    assert(pcm.sampleRate == rate && pcm.bitsPerSample == bps)
    assert(pcm.channels == samples.length)
    samples.indices.foreach { c =>
      assert(pcm.samples(c).toSeq == samples(c).toSeq,
        s"channel $c mismatch under $mode")
    }
  }

  test("every subframe type round-trips bit-exactly, multi-frame, stereo") {
    val left = sine(440.0, 5000)
    val right = sine(1200.0, 5000, amp = 7000)
    for (mode <- Seq[FlacCodec.Mode](FlacCodec.Verbatim, FlacCodec.Auto,
      FlacCodec.Fixed2, FlacCodec.Lpc1)) {
      roundTrip(Array(left), 8000, 16, 4096, mode) // 2 frames, ragged tail
      roundTrip(Array(left, right), 8000, 16, 1024, mode) // 5 frames
    }
    // CONSTANT path: Auto on a constant block emits the constant type
    roundTrip(Array(Array.fill(600)(-123)), 8000, 16, 256, FlacCodec.Auto)
    // non-16 bit depths exercise the sample-size codes
    roundTrip(Array(sine(500.0, 900, amp = 100)), 16000, 8, 256,
      FlacCodec.Fixed2)
    roundTrip(Array(sine(500.0, 900, amp = 300000)), 44100, 24, 512,
      FlacCodec.Lpc1)
  }

  test("the compressed paths are genuinely compressed and CRC-gated") {
    // low frequency → small order-2 curvature residuals (~8 bits vs
    // 16 raw): real compression, not a relabeled verbatim stream
    val s = sine(100.0, 4000)
    val verbatim = FlacCodec.encode(Array(s), 8000, 16, 4096,
      FlacCodec.Verbatim)
    val fixed = FlacCodec.encode(Array(s), 8000, 16, 4096,
      FlacCodec.Fixed2)
    assert(fixed.length < verbatim.length * 2 / 3,
      s"fixed ${fixed.length} vs verbatim ${verbatim.length}")
    // corrupt one frame-header byte: the CRC-8 gate refuses (None),
    // never returns garbage PCM
    val corrupt = fixed.clone()
    val frameStart = 4 + 4 + 34 // magic + block header + STREAMINFO
    corrupt(frameStart + 2) = (corrupt(frameStart + 2) ^ 0x40).toByte
    assert(FlacCodec.decodePcm(corrupt).isEmpty)
    // non-FLAC bytes fall through
    assert(FlacCodec.decodePcm("not flac at all".getBytes).isEmpty)
  }

  test("physics oracle: a planted sine peaks in its Goertzel bin through every subframe type") {
    for ((mode, bin) <- Seq[(FlacCodec.Mode, Int)](
      (FlacCodec.Verbatim, 2), (FlacCodec.Fixed2, 7),
      (FlacCodec.Lpc1, 12), (FlacCodec.Auto, 5))) {
      val freq = 4000.0 * (bin + 1) / 17.0
      val v = Multimodal.embedFlacSpectral(
        Multimodal.sineFlacFixture(freq, nSamples = 2000, mode = mode),
        dim = 16).getOrElse(fail(s"embed failed for $mode"))
      assert(v.indexOf(v.max) == bin, s"peak off under $mode")
    }
  }

  test("a WAV and its FLAC encode embed identically (shared kernel, same samples)") {
    val freq = 4000.0 * 6 / 17.0
    val wav = Multimodal.sineWavFixture(freq, nSamples = 2000)
    val flac = Multimodal.sineFlacFixture(freq, nSamples = 2000,
      mode = FlacCodec.Fixed2)
    val a = Multimodal.embedWavSpectral(wav, 16).get
    val b = Multimodal.embedFlacSpectral(flac, 16).get
    assert(a.toSeq == b.toSeq)
  }

  test("embedMedia dispatch: FLAC blobs get the spectral vector, not the stub") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      (1L, Multimodal.sineFlacFixture(400.0, 1200)),
      (2L, "garbage".getBytes))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2))), schema)
    val out = Multimodal.embedMedia(df, dim = 16)
      .select("doc_id", "media_embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val want = Multimodal.embedFlacSpectral(
      Multimodal.sineFlacFixture(400.0, 1200), 16).get.toSeq
    assert(out(1L) == want)
    assert(out(2L) != want && out(2L).nonEmpty) // stub fallback
  }
}

package graft.ext

/** Pure-JVM G.711 (mu-law / A-law) and IMA/DVI ADPCM codecs — the
  * telephony and speech-archive WAV payloads a web crawl actually
  * carries (`audioFormat` tags 7, 6 and 0x11). Both directions are
  * implemented so fixtures can plant REAL compressed bytes and the
  * decode path can be verified against physics (a planted sine's
  * spectral argmax), exactly like the FLAC seam ([[FlacCodec]]).
  *
  * Reference behavior: the reference pipeline treats media blobs as
  * opaque payloads (entity bytes pass through untouched,
  * `/root/reference/dags/dag_collection_data_from_z.py:60-78`); the
  * decode layer is extension surface, built from the public G.711 and
  * IMA ADPCM specifications.
  *
  * Everything is static table arithmetic: O(1) per sample, no
  * allocation beyond the output arrays — per-partition streaming cost
  * at a 100 TB audio column, same shape as the other codec seams.
  */
object G711Adpcm {

  // ---------------------------------------------------------------- G.711

  private final val MuBias = 0x84 // 132, the mu-law folding bias
  private final val MuClip = 32635

  /** G.711 mu-law compress one 16-bit sample to one byte. */
  def mulawEncode(s0: Short): Byte = {
    var s = s0.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > MuClip) s = MuClip
    s += MuBias
    // exponent = position of the highest set bit above bit 5
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  /** G.711 mu-law expand one byte back to a 16-bit sample. */
  def mulawDecode(b: Byte): Short = {
    val u = (~b) & 0xff
    val exponent = (u >> 4) & 0x7
    val mantissa = u & 0x0f
    val mag = (((mantissa << 3) + MuBias) << exponent) - MuBias
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** G.711 A-law compress one 16-bit sample to one byte (13-bit
    * domain per spec: the input is used at 16-bit scale and shifted,
    * matching the published reference tables).
    */
  def alawEncode(s0: Short): Byte = {
    var pcm = s0.toInt >> 3 // 16 -> 13 bit domain
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    // segment = highest set bit above bit 4 (8 segments)
    var seg = 0
    var v = pcm
    while (seg < 8 && v > 0x1f) { seg += 1; v >>= 1 }
    val aval =
      if (seg >= 8) 0x7f
      else {
        val shifted = if (seg < 2) (pcm >> 1) & 0x0f else (pcm >> seg) & 0x0f
        (seg << 4) | shifted
      }
    (aval ^ mask).toByte
  }

  /** G.711 A-law expand one byte back to a 16-bit sample. */
  def alawDecode(b: Byte): Short = {
    val a = (b & 0xff) ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= (seg - 1) }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  // ---------------------------------------------------- IMA / DVI4 ADPCM

  /** Per-code index adjustment (IMA spec table). */
  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** The 89-entry quantizer step table (IMA spec). */
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private def clampIdx(i: Int): Int =
    if (i < 0) 0 else if (i > 88) 88 else i
  private def clamp16(s: Int): Int =
    if (s < -32768) -32768 else if (s > 32767) 32767 else s

  /** One IMA quantize step: code for `sample` against the (predictor,
    * index) state, and the state advanced exactly as the decoder will
    * advance it (encoder and decoder share the reconstruction).
    * Returns (code, newPredictor, newIndex).
    */
  private def imaStep(sample: Int, predictor: Int,
                      index: Int): (Int, Int, Int) = {
    val step = StepTable(index)
    var delta = sample - predictor
    val sign = if (delta < 0) { delta = -delta; 8 } else 0
    var code = 0
    var d = delta
    if (d >= step) { code |= 4; d -= step }
    if (d >= (step >> 1)) { code |= 2; d -= step >> 1 }
    if (d >= (step >> 2)) code |= 1
    // reconstruct with the decoder's arithmetic (not the ideal delta)
    var diff = step >> 3
    if ((code & 4) != 0) diff += step
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 1) != 0) diff += step >> 2
    val np = clamp16(if (sign != 0) predictor - diff else predictor + diff)
    val ni = clampIdx(index + IndexTable(code | sign))
    (code | sign, np, ni)
  }

  /** Encode mono 16-bit samples as WAV-layout IMA ADPCM blocks:
    * each block is a 4-byte header (predictor i16le = the block's
    * first sample verbatim, step index u8, reserved u8) followed by
    * `blockAlign - 4` nibble bytes, low nibble first — the block
    * carries `(blockAlign - 4) * 2 + 1` samples. The final block is
    * zero-padded (decoders stop at the declared total, which the
    * caller records in the WAV `fact` chunk / fixture formula).
    */
  def imaEncode(samples: Array[Short], blockAlign: Int): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"imaEncode: blockAlign $blockAlign must be >= 8 and word-aligned")
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val out = new Array[Byte](math.max(nBlocks, 1) * blockAlign)
    var index = 0 // step index persists across blocks (encoder choice;
    // legal because each block header re-seeds the decoder)
    var b = 0
    while (b < math.max(nBlocks, 1)) {
      val base = b * blockAlign
      val s0 = b * spb
      val first = if (s0 < samples.length) samples(s0).toInt else 0
      out(base) = (first & 0xff).toByte
      out(base + 1) = ((first >> 8) & 0xff).toByte
      out(base + 2) = index.toByte
      out(base + 3) = 0
      var predictor = first
      var i = 1
      while (i < spb) {
        val si = s0 + i
        val sample = if (si < samples.length) samples(si).toInt else predictor
        val (code, np, ni) = imaStep(sample, predictor, index)
        predictor = np; index = ni
        val byteOff = base + 4 + (i - 1) / 2
        if (((i - 1) & 1) == 0) out(byteOff) = (code & 0x0f).toByte
        else out(byteOff) = (out(byteOff) | ((code & 0x0f) << 4)).toByte
        i += 1
      }
      b += 1
    }
    out
  }

  /** Decode WAV-layout mono IMA ADPCM blocks back to 16-bit samples.
    * `totalSamples` bounds the output (the declared `fact` count); the
    * nibble stream beyond it is padding. `samplesPerBlock` (when > 0,
    * the header's wSamplesPerBlock) stops EACH block at the declared
    * count — a file legitimately declaring fewer samples than the
    * block's nibble capacity pads the tail nibbles, and decoding them
    * as audio would misplace every later block's samples in the
    * output. 0 means full capacity (blockAlign-4)*2+1. None on a
    * malformed layout.
    */
  def imaDecode(data: Array[Byte], off: Int, len: Int, blockAlign: Int,
                totalSamples: Int,
                samplesPerBlock: Int = 0): Option[Array[Short]] = {
    if (blockAlign < 8 || len < 4 || totalSamples < 0) return None
    val cap = (blockAlign - 4) * 2 + 1
    val spb =
      if (samplesPerBlock > 0) math.min(samplesPerBlock, cap) else cap
    val out = new Array[Short](totalSamples)
    var produced = 0
    var base = off
    val end = off + len
    while (produced < totalSamples && base + 4 <= end) {
      val blockEnd = math.min(base + blockAlign, end)
      var predictor =
        ((data(base) & 0xff) | (data(base + 1) << 8)).toShort.toInt
      var index = data(base + 2) & 0xff
      if (index > 88) return None
      out(produced) = predictor.toShort
      produced += 1
      var i = 1
      var byteOff = base + 4
      while (i < spb && produced < totalSamples && byteOff < blockEnd) {
        val raw = data(byteOff) & 0xff
        val code = if (((i - 1) & 1) == 0) raw & 0x0f else (raw >> 4) & 0x0f
        val step = StepTable(index)
        var diff = step >> 3
        if ((code & 4) != 0) diff += step
        if ((code & 2) != 0) diff += step >> 1
        if ((code & 1) != 0) diff += step >> 2
        predictor = clamp16(
          if ((code & 8) != 0) predictor - diff else predictor + diff)
        index = clampIdx(index + IndexTable(code))
        out(produced) = predictor.toShort
        produced += 1
        if (((i - 1) & 1) == 1) byteOff += 1
        i += 1
      }
      base += blockAlign
    }
    if (produced < totalSamples) None else Some(out)
  }
}

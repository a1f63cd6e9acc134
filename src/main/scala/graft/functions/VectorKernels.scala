package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels shared by the interpreted eval AND the generated code
  * of the expressions in [[VectorExpressions]]. A Scala top-level object
  * emits static forwarders, so whole-stage-generated Java calls
  * `graft.functions.VectorKernels.simhash64(arr)` directly — one code
  * path for both evaluation modes, which makes bit-parity between the
  * codegen and interpreted arms true by construction (the parity tests
  * in ExtSpec still verify it end-to-end).
  *
  * This is what removes the `CodegenFallback` marker from the hot
  * jaccard-family expressions: `CollapseCodegenStages` refuses
  * whole-stage codegen for any operator containing a fallback
  * expression, which un-fuses the entire dedup stage around it.
  */
object VectorKernels {

  private val SPACE = UTF8String.fromString(" ")

  /** 64-bit SimHash: 64 sign counters over the tokens' xxhash64 bits. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = XxHash64Function.hash(t, StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Engine-portable 32-bit SimHash — value-identical to the SQL
    * higher-order-function form (`TextDedup.portableSimhashSigSql`,
    * pinned by an ExtSpec parity test) that the DuckDB oracle mirrors,
    * but compiled: the HOF form evaluates its nested lambdas
    * interpreted per (token × bit), which showed up as the top bench
    * cost at sf0.1. Token code = (first codepoint) * 131 + numChars —
    * exactly Spark's `ascii()`/`length()` semantics: ascii returns the
    * FULL first codepoint (256 for "Āx" — don't probe this with
    * chr(n), whose mod-256 wrap makes it look byte-truncated), which
    * is also DuckDB's unicode ascii(), so the code chain stays
    * cross-engine beyond ASCII; parity pinned in ExtSpec on >255 and
    * empty tokens.
    */
  private val PORTABLE_MULT: Array[Long] =
    Array.tabulate(32)(j => (2L * j + 3L) * 65537L)

  def portableSimhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val s = t.toString
        val cp = if (s.isEmpty) 0 else s.codePointAt(0)
        val c = cp.toLong * 131L + t.numChars().toLong
        var j = 0
        while (j < 32) {
          if ((c * PORTABLE_MULT(j)) % 1000003L % 2L == 1L) counts(j) += 1
          else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Positions where two bigint arrays agree — the minhash
    * signature-agreement count. Semantics match the SQL
    * `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))` it
    * replaces (parity-pinned in ExtSpec): zip_with null-pads the
    * shorter array and the padded comparisons drop, so the count runs
    * over the shorter length; null elements never compare equal. The
    * HOF form evaluates interpreted per candidate pair row — this is
    * the compiled form for the post-LSH-join hot path.
    */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  /** MinHash signature: per-permutation minima of h1(s) + i·h2(s). */
  def minhashSig(arr: ArrayData, numPerms: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 77L) | 1L // odd => full-period
        var p = 0
        var h = h1
        while (p < numPerms) {
          if (h < mins(p)) mins(p) = h
          h += h2
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct word n-gram shingles, first-seen order; short inputs
    * collapse to one whole-text shingle.
    */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (m < n) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(SPACE, toks: _*)))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        seen.add(UTF8String.concatWs(SPACE, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Pairs are materialized per input row, so the list length must be
    * bounded by the caller (posting-list caps) — fail loudly instead
    * of OOMing or overflowing the pair count on a degenerate input.
    */
  val ARRAY_PAIRS_MAX_ELEMENTS = 10000

  /** All ordered pairs (a < b) of a long array, as array<struct<a,b>>. */
  def arrayPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n > ARRAY_PAIRS_MAX_ELEMENTS) throw new IllegalStateException(
      s"array_pairs: list of $n elements would produce ${n.toLong * (n - 1) / 2} " +
        s"pairs; cap posting lists (maxPostings) below $ARRAY_PAIRS_MAX_ELEMENTS first")
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) { xs(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(xs)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(xs(i), xs(j))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Engine-portable seeded-Rademacher LSH bucket — the compiled form
    * of the SQL expression the DuckDB oracle mirrors
    * ([[graft.ext.VectorSearch.lshBucketPortableExpr]], which remains
    * the reference surface; value parity is pinned in AnnPortableSpec).
    * q_i = floor(double(x_i) · 1024); plane j's entry for 1-based
    * dimension i is +1 iff ((i·(2j+3)·65537 + (j+1)·514229) mod
    * 1000003) is even; bit j is set iff the exact integer dot ≥ 0.
    * Fidelity corners, matched deliberately (each pinned by the
    * AnnPortableSpec parity test): a null ELEMENT nulls every per-bit
    * dot in the SQL form (`if(null ≥ 0)` → 0), so any null element
    * yields bucket 0; an EMPTY vector also yields bucket 0 — in the
    * HOF form `sequence(1, size(q))` on an empty q is `sequence(1, 0)`
    * = [1, 0] (Spark sequences run DESCENDING when start > stop), so
    * `zip_with` null-pads the empty side and every dot nulls out;
    * NaN/±Inf quantize through the same non-ANSI double→long cast
    * semantics (0 / saturation) as Spark's `cast`.
    */
  def portableLshBucket(arr: ArrayData, bits: Int, isFloat: Boolean): Long = {
    val dim = arr.numElements()
    if (dim == 0) return 0L
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = math.floor(x * 1024.0).toLong
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      val mult = (2L * j + 3L) * 65537L
      val add = (j + 1L) * 514229L
      var dot = 0L
      i = 0
      while (i < dim) {
        if (((i + 1L) * mult + add) % 1000003L % 2L == 0L) dot += q(i)
        else dot -= q(i)
        i += 1
      }
      if (dot >= 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  // ---- random-hyperplane LSH ----------------------------------------

  /** Plane matrices are deterministic in (bits, dim) (splitmix64 of the
    * (plane, dim) index), so a process-wide cache is safe: every
    * executor regenerates identical planes, no broadcast model needed.
    * Bounded by the handful of distinct (bits, dim) combinations a
    * session ever uses.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def planeMatrix(bits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, dim), _ =>
      Array.tabulate(bits, dim) { (pl, j) =>
        // uniform in [-1, 1] from the top 53 bits
        (splitmix64(pl.toLong * 1000003L + j) >>> 11) / 4503599627370495.0 * 2.0 - 1.0
      })

  /** Sign-bit bucket id of `bits` hyperplane dot products. */
  def lshBucket(arr: ArrayData, bits: Int, isFloat: Boolean): Long = {
    val dim = arr.numElements()
    val w = planeMatrix(bits, dim)
    var sig = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var j = 0
      val wp = w(p)
      while (j < dim) {
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        dot += x * wp(j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row kernels that dominate the
  * similarity / dedup workloads. The higher-order-function formulations
  * (zip_with + aggregate) allocate an intermediate array and box every
  * lambda step per element; these expressions run one primitive loop per
  * row instead — same semantics, order-of-magnitude less per-row cost —
  * which is what the hot inner loop of a 100 TB pairwise stage needs.
  * (Preference order per the design notes: compose built-ins first, then
  * a custom Expression — these are the cases where the built-in form is
  * asymptotically fine but constant-factor bound.)
  */
object VectorExpressions {

  /** Cosine similarity over two float/double array columns, accumulated
    * in double in index order — bit-identical to the fold-left
    * `aggregate(zip_with(...))` formulation and to DuckDB's DOUBLE[]
    * cosine, which the oracle relies on. Null if lengths differ.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"
    @transient private lazy val leftFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val rightFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) null
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
    }

    /** Whole-stage-codegen body: the identical index-ordered double loop
      * as the interpreted path (bit-parity with the oracle depends on
      * the accumulation order, so both paths must match exactly).
      */
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val getA = if (leftFloat) "getFloat" else "getDouble"
      val getB = if (rightFloat) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = (double) $a.$getA($i);
            double $y = (double) $b.$getB($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
        """
      })
    }

    override protected def withNewChildrenInternal(nl: Expression, nr: Expression): CosineSim =
      copy(left = nl, right = nr)
  }

  /** 64-bit SimHash of a string-array column: one pass over the tokens,
    * 64 sign counters updated from each token's xxhash64 (seed 42, same
    * hash family as SQL xxhash64).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** MinHash signature of a string-array (shingle set) column: numPerms
    * permutations via the standard two-hash combination
    * h_i(s) = h1(s) + i·h2(s), one pass over the shingles. Returns
    * array<long> of the per-permutation minima.
    */
  case class MinHashSig(child: Expression, numPerms: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
  }

  /** Distinct word n-gram shingles of a string-array column: one pass,
    * first-seen order (array_distinct semantics). Shingle text equals
    * `concat_ws(' ', w_i, …, w_{i+n-1})` — the engine-portable form the
    * oracle mirrors. Inputs shorter than n collapse to one whole-text
    * shingle.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    private val space = UTF8String.fromString(" ")
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      if (m < n) {
        new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
      } else {
        val seen = new java.util.LinkedHashSet[UTF8String]()
        i = 0
        while (i <= m - n) {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks(i + j); j += 1 }
          seen.add(UTF8String.concatWs(space, parts: _*))
          i += 1
        }
        val out = new Array[Any](seen.size)
        val it = seen.iterator()
        i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        new GenericArrayData(out)
      }
    }
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(c)
  }

  /** Random-hyperplane LSH bucket id for a float/double vector column:
    * `bits` sign bits of dot products against deterministic pseudo-random
    * planes (splitmix64-derived, seeded by (plane, dim) — every executor
    * regenerates identical planes, no broadcast model needed).
    */
  case class LshBucket(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    require(bits >= 1 && bits <= 63, "lsh_bucket bits must be in [1, 63]")
    override def dataType: DataType = LongType
    override def prettyName: String = "lsh_bucket"
    @transient private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    // volatile: plane matrix is built on first eval and may be read by
    // concurrent tasks sharing this expression instance — the volatile
    // write publishes the fully-constructed array
    @transient @volatile private var planes: Array[Array[Double]] = _
    private def splitmix64(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def planeMatrix(dim: Int): Array[Array[Double]] = {
      var p = planes
      if (p == null || p(0).length != dim) {
        p = Array.tabulate(bits, dim) { (pl, j) =>
          // uniform in [-1, 1] from the top 53 bits
          (splitmix64(pl.toLong * 1000003L + j) >>> 11) / 4503599627370495.0 * 2.0 - 1.0
        }
        planes = p
      }
      p
    }
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val dim = a.numElements()
      val w = planeMatrix(dim)
      var sig = 0L
      var p = 0
      while (p < bits) {
        var dot = 0.0
        var j = 0
        val wp = w(p)
        while (j < dim) {
          val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
          dot += x * wp(j)
          j += 1
        }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): LshBucket = copy(c)
  }

  /** All ordered pairs (a < b) of a long-array column, as
    * array<struct<a,b>> — the candidate-pair kernel for posting-list
    * joins: explode(array_pairs(collect_list(doc))) replaces a
    * self-join, saving one full shuffle of the posting lists.
    */
  case class ArrayPairs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "array_pairs"

    override def checkInputDataTypes()
    : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(
          s"array_pairs requires array<bigint>, got ${other.sql}")
      }
    }

    /** Pairs are materialized per input row, so the list length must be
      * bounded by the caller (posting-list caps) — fail loudly instead
      * of OOMing or overflowing the pair count on a degenerate input.
      */
    private val maxElements = 10000

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n > maxElements) throw new IllegalStateException(
        s"array_pairs: list of $n elements would produce ${n.toLong * (n - 1) / 2} " +
          s"pairs; cap posting lists (maxPostings) below $maxElements first")
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
          out(k) = org.apache.spark.sql.catalyst.InternalRow(xs(i), xs(j))
          k += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): ArrayPairs = copy(c)
  }

  // Column-API wrappers
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  def minhash_sig(shingles: Column, numPerms: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), numPerms))

  def word_shingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(tokens), n))

  def lsh_bucket(vec: Column, bits: Int): Column =
    GraftColumnBridge.column(LshBucket(GraftColumnBridge.expression(vec), bits))

  def array_pairs(xs: Column): Column =
    GraftColumnBridge.column(ArrayPairs(GraftColumnBridge.expression(xs)))
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExpressions._

/** SparkSessionExtensions entry point: registers the graft native
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)
  * ...")` works next to the Column API.
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; or call
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, arity, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", null, name,
          GraftExtensions.usage(name), "", "", "", "", "", "", "scala_udf"),
        GraftExtensions.checked(name, arity, builder)))
    }
}

object GraftExtensions {

  /** Usage docs surfaced by DESCRIBE FUNCTION. */
  def usage(name: String): String = name match {
    case "cosine_sim" =>
      "cosine_sim(a, b) - cosine similarity of two float/double arrays, computed in double; NULL if lengths differ."
    case "simhash64" =>
      "simhash64(tokens) - 64-bit SimHash of a string array (xxhash64 token hashes, sign counters)."
    case "portable_simhash32" =>
      "portable_simhash32(tokens) - engine-portable 32-bit SimHash of a string array (ascii/length token codes, mod-parity bits; ASCII contract)."
    case "eq_count" =>
      "eq_count(a, b) - count of positions where two bigint arrays agree (minhash signature agreement); runs over the shorter length."
    case "minhash_sig" =>
      "minhash_sig(shingles, k) - MinHash signature (array<bigint> of k permutation minima) over a string array; k must be a literal."
    case "word_shingles" =>
      "word_shingles(tokens, n) - distinct word n-grams of a string array, joined by single spaces; n must be a literal."
    case "lsh_bucket" =>
      "lsh_bucket(vec, bits) - random-hyperplane LSH bucket id in [0, 2^bits) for a float/double array; bits must be a literal."
    case "array_pairs" =>
      "array_pairs(xs) - all ordered pairs (a < b) of a bigint array as array<struct<a,b>>; input must be capped (<= 10000 elements)."
    case _ => ""
  }
  /** Wrap a builder with an arity check so a wrong argument count is a
    * clear analysis error instead of an IndexOutOfBoundsException.
    */
  private def checked(name: String, arity: Int,
                      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != arity) throw new IllegalArgumentException(
        s"$name expects $arity arguments, got ${es.length}")
      builder(es)
    }

  private def arg(es: Seq[Expression], i: Int): Expression = es(i)
  private def intArg(es: Seq[Expression], i: Int): Int = {
    val e = es(i)
    if (!e.foldable) throw new IllegalArgumentException(
      s"argument ${i + 1} must be a literal integer, got: ${e.sql}")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** (name, arity, builder) for each exposed function. */
  val definitions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", 2, es => CosineSim(arg(es, 0), arg(es, 1))),
    ("simhash64", 1, es => SimHash64(arg(es, 0))),
    ("portable_simhash32", 1, es => PortableSimHash32(arg(es, 0))),
    ("eq_count", 2, es => EqCount(arg(es, 0), arg(es, 1))),
    ("minhash_sig", 2, es => MinHashSig(arg(es, 0), intArg(es, 1))),
    ("word_shingles", 2, es => WordShingles(arg(es, 0), intArg(es, 1))),
    ("lsh_bucket", 2, es => LshBucket(arg(es, 0), intArg(es, 1))),
    ("array_pairs", 1, es => ArrayPairs(arg(es, 0))))

  /** Imperative registration on an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    definitions.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, checked(name, arity, builder), "built-in")
    }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** The seeded engine-portable MinHash-LSH form behind the round-15
  * `ns_dedup_minhash` oracle promotion: the DataFrame pipeline must
  * equal an independent in-memory reimplementation of the SAME
  * arithmetic (the parity the DuckDB twin then re-enforces
  * cross-engine), and the estimate must behave like a Jaccard
  * estimate (1.0 on clones, absent on disjoint corpora).
  */
class MinhashPortableSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000003L
  private val NumPerms = 16
  private val Bands = 8

  /** Reference model: the portable arithmetic in plain Scala. */
  private def refCodes(text: String): Set[Long] = {
    val toks = text.trim.toLowerCase.split("[ \\t\\n\\u000B\\f\\r]+")
      .toSeq
    val cs = toks.map(t =>
      ((if (t.isEmpty) 0L else t.codePointAt(0).toLong) * 131L +
        t.length) % P)
    if (cs.size >= 3)
      cs.sliding(3).map(w =>
        ((w(0) * 131071L + w(1)) % P * 131071L + w(2)) % P).toSet
    else Set(cs.foldLeft(0L)((acc, c) => (acc * 131071L + c) % P))
  }

  private def refSig(text: String): Seq[Long] = {
    val ss = refCodes(text)
    (0 until NumPerms).map { j =>
      val a = ((2L * j + 3L) * 65537L) % P
      val b = (j * 2654435761L) % P
      ss.map(s => (s * a + b) % P).min
    }
  }

  test("pipeline estimate equals the reference model's component match count") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "entirely different words compose this third document body"),
      (4L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val got = TextDedup.minhashLshPortable(docs, "text", "doc_id",
        threshold = 0.0001)
      .orderBy("id_a", "id_b").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // reference: est = matching components / 16, pairs only when the
    // two docs share at least one r=2 band bucket
    def bandKeys(sig: Seq[Long]): Set[(Int, Long)] =
      (0 until Bands).map(k =>
        k -> ((sig(2 * k) * 131071L + sig(2 * k + 1)) % P)).toSet
    val texts = Map(1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy cat tonight",
      3L -> "entirely different words compose this third document body",
      4L -> "the quick brown fox jumps over the lazy dog tonight")
    val sigs = texts.map { case (id, t) => id -> refSig(t) }
    val want = (for {
      a <- texts.keys; b <- texts.keys; if a < b
      if bandKeys(sigs(a)).intersect(bandKeys(sigs(b))).nonEmpty
      m = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      if m > 0
    } yield (a, b) -> m.toDouble / NumPerms).toMap
    assert(got == want, s"got $got want $want")
    // clones estimate 1.0; they must be present
    assert(got.get((1L, 4L)).contains(1.0))
    // near-dup (one word changed) collides and estimates high
    assert(got.getOrElse((1L, 2L), 0.0) >= 0.5)
  }

  test("disjoint corpora yield no pairs; threshold filters the weak ones") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val all = TextDedup.minhashLshPortable(docs, "text", "doc_id",
        threshold = 0.0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 3L)), all) // only the clone pair collides
    val strict = TextDedup.minhashLshPortable(docs, "text", "doc_id",
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 3L)))
  }

  test("short docs fold whole-text codes (the docShingles collapse rule)") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, "hello world"),
      (3L, "hello"),
      (4L, "hello")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.minhashLshPortable(docs, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs.get((1L, 2L)).contains(1.0))
    assert(pairs.get((3L, 4L)).contains(1.0))
    // "hello" vs "hello world": different single fold codes — the
    // signatures agree only by permutation coincidence, never 1.0
    assert(!pairs.get((1L, 3L)).contains(1.0))
  }
}

package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels for byte-pair-encoding subword tokenization
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units" — the public BPE algorithm). Shared by the
  * interpreted eval and the generated code of
  * [[VectorExpressions.BpeTokenCount]], same single-code-path pattern
  * as [[VectorKernels]].
  *
  * Encode semantics (canonical greedy): repeatedly pick the
  * LOWEST-RANK adjacent symbol pair present in the word and merge all
  * its occurrences left-to-right non-overlapping; stop when no ranked
  * pair remains. Because a merge of rank r can only ever create pairs
  * involving its output symbol — which post-dates r in training — no
  * earlier-rank pair can appear after r is exhausted, so rank order is
  * a valid processing order.
  */
object BpeKernels {

  /** Compact rank table: "l r" -> rank (space-joined key — safe
    * because symbols come from whitespace-split words and can never
    * contain a space). Built once per plan via [[ranksOf]] and shipped
    * to executors as a codegen reference object.
    */
  type Ranks = java.util.HashMap[String, Int]

  def ranksOf(merges: Seq[(String, String)]): Ranks = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + " " + r, i)
    }
    m
  }

  /** Greedy BPE segmentation of one word (codepoint-seeded). */
  def encode(word: String, ranks: Ranks): Array[String] = {
    if (word.isEmpty) return Array.empty
    var parts: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var done = false
    while (!done && parts.length > 1) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrDefault(parts(i) + " " + parts(i + 1), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge all occurrences of that pair, left-to-right non-overlap
        val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 &&
            ranks.getOrDefault(parts(j) + " " + parts(j + 1),
              Int.MaxValue) == best) {
            out += parts(j) + parts(j + 1)
            j += 2
          } else {
            out += parts(j)
            j += 1
          }
        }
        parts = out.toArray
      }
    }
    parts
  }

  /** Token count of the greedy segmentation — the kernel the codegen'd
    * expression calls.
    */
  def tokenCount(word: UTF8String, ranks: Ranks): Int =
    if (word == null) 0 else encode(word.toString, ranks).length
}

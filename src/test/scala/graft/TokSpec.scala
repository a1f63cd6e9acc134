package graft

import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis, TextDedup, Tok}

/** Pins the analysis-family tokenizer ([[graft.ext.Tok]]) on hostile
  * whitespace — tabs, CR/LF, vertical tab, double spaces, leading and
  * trailing runs. The DuckDB side of the same rule (OracleSql.wsToks)
  * is gated by running graft.Verify + tools/check_oracle.py over the
  * tools/make_ws_fixture.py corpus (see FIXTURES.md); this spec pins
  * the Spark half so a tokenizer change can't silently drift.
  */
class TokSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(Tok.tokens(col("t"))).as[Seq[String]].head()

  test("pinned tokenizer: trim + explicit whitespace class") {
    assert(toks("a b") == Seq("a", "b"))
    assert(toks("A  b") == Seq("a", "b")) // double space, lowercased
    assert(toks("a\tb") == Seq("a", "b")) // tab
    assert(toks("a\r\nb") == Seq("a", "b")) // CRLF
    assert(toks("a\u000Bb") == Seq("a", "b")) // vertical tab (RE2 \s misses it)
    assert(toks("\t a b \n") == Seq("a", "b")) // leading/trailing runs
    assert(toks(" \t x \t ") == Seq("x"))
    // pinned edge: empty / all-whitespace -> one empty token, size 1
    assert(toks("") == Seq(""))
    assert(toks(" \t\n") == Seq(""))
  }

  test("token counts agree between regex families on messy text") {
    val messy = Seq(
      (1L, "  the \t quick  brown\r\nfox "),
      (2L, "onetwo three\t"),
      (3L, "plain single spaced text")).toDF("doc_id", "text")
    val counts = messy.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n")).as[(Long, Int)]
      .collect().toMap
    assert(counts == Map(1L -> 4, 2L -> 3, 3L -> 4))
  }

  test("shingles use the pinned tokens: spacing never leaks into shingle text") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha \t beta  gamma\ndelta ")).toDF("doc_id", "text")
    val sh = TextDedup.docShingles(docs, "text", "doc_id")
      .select(col("doc"), explode(col("sh")).as("s"))
      .as[(Long, String)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    // identical shingle sets despite the whitespace noise
    assert(sh(1L) == sh(2L))
    assert(sh(1L) == Set("alpha beta gamma", "beta gamma delta"))
  }

  test("short-doc fallback shingle is the token join, not the raw text") {
    val docs = Seq((1L, "  Hello\t\tWorld ")).toDF("doc_id", "text")
    val sh = TextDedup.docShingles(docs, "text", "doc_id")
      .select(explode(col("sh"))).as[String].collect().toSeq
    assert(sh == Seq("hello world"))
  }

  test("quality features are whitespace-shape independent via the pinned rule") {
    val pair = Seq(
      (1L, "the cat sat on the mat with a hat for it"),
      (2L, "the\tcat  sat on\r\nthe mat with a hat for it")).toDF("doc_id", "text")
    // same words -> same word-derived features (char-based ones may differ)
    val rows = TextAnalysis.qualityScore(pair, "text")
      .select(col("doc_id"), col("n_words"), col("stopword_ratio"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    assert(rows(1L) == rows(2L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** HTML → text extraction: block removal, tag boundaries, entity
  * decode order, and the documented angle-bracket contract.
  */
class HtmlCleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.htmlToText(col("t")).as("c"))
      .as[String].collect().head

  test("script/style bodies vanish whole, including embedded '<'") {
    assert(clean("<script>if (1 < 2) alert('x');</script>keep" +
      "<style>a > b { color: red }</style>") == "keep")
  }

  test("tags become word boundaries; comments vanish") {
    assert(clean("one<p>two</p>three<!-- note\nacross lines -->four")
      == "one two three four")
  }

  test("entities decode once, amp last") {
    // &amp;lt; is a double-encoded literal "&lt;" — it must decode to
    // the TEXT "&lt;", never cascade to "<"
    assert(clean("x &amp;lt; y &nbsp; &lt;b&gt; &quot;q&#39; &amp;&amp; z")
      == "x &lt; y <b> \"q' && z")
  }

  test("whitespace squeezes; plain text round-trips modulo squeeze") {
    assert(clean("  plain\t\ttext\nwith   runs  ") == "plain text with runs")
  }

  test("angle-bracket contract: bare a<b prose spans strip (documented)") {
    assert(clean("a < b and c > d") == "a d")
    assert(clean("unclosed < never ends") == "unclosed < never ends",
      "a '<' with no closing '>' is not a tag and survives")
  }

  test("NULL passes through") {
    val got = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextAnalysis.htmlToText(col("t")).as("c"))
      .collect().head
    assert(got.isNullAt(0))
  }
}

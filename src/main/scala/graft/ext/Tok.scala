package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE pinned whitespace tokenizer for the analysis family (token
  * counts, quality features, vocab/TF-IDF/BM25/keywords/bigram-LM,
  * language ID, fingerprints, dedup shingles): trim the ASCII
  * whitespace run off both ends, then split on runs of the EXPLICIT
  * class `[ \t\n\x0B\f\r]+`.
  *
  * Why an explicit class and not `\s+`: Java regex `\s` (Spark) is
  * `[ \t\n\x0B\f\r]` but RE2 `\s` (DuckDB, the oracle engine) excludes
  * `\x0B` — `\s+` silently diverges on vertical-tab text. The explicit
  * class is the same byte set in both engines (probed: both split
  * "a\u000Bb" into [a, b]). Likewise plain `trim()` strips only spaces
  * in both engines, so the charset overload is used to strip all six
  * whitespace chars — otherwise text ending in "\t" yields a trailing
  * empty token (identically in both engines, since Spark's `split`
  * keeps trailing empties like DuckDB's `regexp_split_to_array`, but
  * an empty "token" pollutes vocab/df tables).
  *
  * The DuckDB mirror is `OracleSql.wsToks`/`wsToksCased`; cross-engine
  * parity is gated on a tab/CRLF/double-space fixture corpus
  * (tools/make_ws_fixture.py — see FIXTURES.md), not on the generated
  * corpus happening to be single-spaced.
  *
  * NOT this rule: [[TextDedup.blockDedup]] and
  * [[TextAnalysis.chunkDocs]] split on the exact single space with no
  * trim — their output IS text reassembled from the pieces, so
  * spacing/case are content there; Spark `split(t, " ")` and DuckDB
  * `string_split(t, ' ')` agree on every input (both keep internal and
  * trailing empty fields). `tArrayFuncs` keeps it too (the array
  * surface under test wants raw fields, not tokens).
  *
  * Edge pinned on both engines: empty or all-whitespace text
  * tokenizes to a single empty token (size 1), never an empty array.
  */
object Tok {
  /** The six ASCII whitespace chars of Java's `\s`. */
  val wsChars: String = " \t\n\u000B\f\r"

  /** Split regex — same semantics compiled by Java regex and RE2. */
  val wsRegex: String = "[ \\t\\n\\x0B\\f\\r]+"

  /** Strip leading/trailing ASCII whitespace (all six chars). */
  def trimWs(c: Column): Column = trim(c, wsChars)

  /** Lowercased analysis tokens. */
  def tokens(c: Column): Column = split(trimWs(lower(c)), wsRegex)

  /** Case-preserving analysis tokens (pure counting/budgeting sites). */
  def tokensCased(c: Column): Column = split(trimWs(c), wsRegex)

  /** Token count (case-irrelevant, uses the cased split). */
  def count(c: Column): Column = size(tokensCased(c))
}

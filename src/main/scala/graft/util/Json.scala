package graft.util

/** Minimal JSON string escaping, shared by every harness main that
  * hand-writes JSON lines (Verify's oracle dump, Bench's metric lines,
  * ScaleStress's step records). One implementation so a fix lands
  * everywhere: backslash, quote, and ALL control chars (< 0x20) are
  * escaped — a tab or CR in builder-authored SQL or an error chain
  * would otherwise make the driver's json.load fail and silently zero
  * a round's artifact.
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in double quotes — a complete JSON string token. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}

package graft

/** The one JSON string escaper (backslash, quote, and ALL control chars) —
  * Verify's oracle dump, the bronze sidecars, and the CLI all emit JSON the
  * driver/tools parse, and a stray tab or newline in any of them would
  * silently corrupt that contract. */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

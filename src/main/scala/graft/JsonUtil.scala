package graft

/** Minimal JSON string escaping shared by the Verify/Bench artifact
  * writers — backslash, quote, and ALL control chars (<0x20): a tab or
  * CR in builder-authored SQL would otherwise make the driver's
  * json.load fail and silently zero a round's artifact. */
private[graft] object JsonUtil {
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

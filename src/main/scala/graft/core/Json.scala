package graft.core

/** THE JSON string escaper. The bench's driver line, Verify's
  * `oracle_sql.json`, and the serving endpoint's wire bodies each
  * hand-rolled this before round 9 — an escaping fix (new control
  * char, lone surrogate policy, …) had to land three times or the
  * emitters diverged. One definition, named escapes for the common
  * controls, `\u00XX` for the rest.
  */
object Json {
  /** Escape `s` for inclusion inside a JSON string literal (no
    * surrounding quotes).
    */
  def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'          => b.append("\\\"")
      case '\\'         => b.append("\\\\")
      case '\n'         => b.append("\\n")
      case '\r'         => b.append("\\r")
      case '\t'         => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c            => b.append(c)
    }
    b.toString
  }

  /** `s` as a complete JSON string literal. */
  def str(s: String): String = "\"" + esc(s) + "\""
}

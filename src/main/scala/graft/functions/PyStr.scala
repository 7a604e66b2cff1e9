package graft.functions

/** Python-string-compatible helpers.
  *
  * The reference's golden outputs depend on CPython `str` semantics
  * (`.title()`, `.strip()`), which differ from `java.lang.String` /
  * Spark `initcap`/`trim` in ways the goldens exercise — e.g.
  * `"1./er.p".title() == "1./Er.P"` (digit counts as word boundary) and
  * `strip` removing all unicode whitespace, not just 0x20.
  */
object PyStr {

  /** CPython `str.title()`: a letter following a non-letter is titlecased,
    * any other letter is lowercased (reference behavior anchored by
    * src/tests.py:34-45 goldens, used at src/converters.py:60-61). */
  def title(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(if (prevCased) Character.toLowerCase(c) else Character.toTitleCase(c))
        prevCased = true
      } else {
        sb.append(c)
        prevCased = false
      }
      i += 1
    }
    sb.toString
  }

  /** CPython `str.strip()`: unicode-whitespace strip (java `String.strip`
    * matches; Spark `trim` does NOT — it only removes 0x20). */
  def strip(s: String): String = if (s == null) null else s.strip()

  /** CPython `str.strip(chars)` — strips any of `chars` from both ends
    * (used by the lenient date cast, reference prune_nonpublic.py:51). */
  def strip(s: String, chars: String): String = {
    var start = 0
    var end = s.length
    while (start < end && chars.indexOf(s.charAt(start)) >= 0) start += 1
    while (end > start && chars.indexOf(s.charAt(end - 1)) >= 0) end -= 1
    s.substring(start, end)
  }
}

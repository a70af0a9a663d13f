package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernel for [[graft.operators.Html.extractText]]: the SAME
  * nine-pass chain (4 span passes, tag pass, entity decode, 3
  * whitespace passes), each pass re-implemented as an indexOf/char
  * scan instead of a `java.util.regex` pass — `(?is)…*?` non-greedy
  * spans BACKTRACK in Java's engine, and nine engine invocations per
  * row dominate the extraction cost on real-page-sized documents
  * (A/B in BASELINE round-13: the win grows with document size).
  *
  * EQUIVALENCE IS THE CONTRACT: every pass mirrors its regex pass
  * one-for-one — same pass ORDER (a cross-nested `<style>…<script>…
  * </style>…</script>` resolves script-first exactly like the chain),
  * same first-match-then-continue scanning, same no-match fallthrough
  * (an unclosed span leaves its opener to the tag pass; a `<` with no
  * `>` to EOF stays literal text). `HtmlFastSpec` pins it property-
  * style against the regex chain on adversarial random markup, and
  * q214's DuckDB oracle (which runs the regex chain) gates it at
  * corpus scale. CodegenFallback by design: the work IS the per-row
  * scan (the DeflateLen precedent); there is no expression tree to
  * fuse into.
  */
case class HtmlExtractText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_extract"

  override protected def withNewChildInternal(newChild: Expression): HtmlExtractText =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtractText.extract(input.asInstanceOf[UTF8String].toString))
}

object HtmlExtractText {

  /** The full chain (see [[graft.operators.Html]] object doc) — pass
    * ORDER is part of the contract (cross-nested spans resolve
    * script-first exactly like the regex chain).
    */
  def extract(s: String): String = {
    val afterScript = dropSpans(s, "<script", "</script")
    val afterStyle = dropSpans(afterScript, "<style", "</style")
    val afterComment = dropLiteralSpans(afterStyle, "<!--", "-->")
    val afterCdata = dropLiteralSpans(afterComment, "<![CDATA[", "]]>")
    normalizeWhitespace(decodeEntities(genericTagPass(blockTagPass(afterCdata))))
  }

  /** `(?is)<script\b[^>]*>.*?</script[^>]*>` → ' ' (and style): scan
    * for the opener (case-insensitive, word-boundary after the name,
    * completed by a '>'), then the first closer prefix completed by a
    * '>'. A failed opener or closer leaves the text for later passes,
    * exactly like a regex no-match: the scan resumes AFTER the '<'
    * that failed (regex bumps by one; no earlier retry can match).
    */
  private def dropSpans(s: String, opener: String, closerPrefix: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<' || !regionMatchesIgnoreCase(s, i, opener) ||
        !isNonWord(s, i + opener.length)) {
        out.append(c); i += 1
      } else {
        // opener name matched with \b; complete `[^>]*>`
        val gt = s.indexOf('>', i + opener.length)
        if (gt < 0) { out.append(c); i += 1 }
        else {
          // find `</name[^>]*>` after the opener
          var k = gt + 1
          var closeEnd = -1
          while (closeEnd < 0 && k < n) {
            val cl = indexOfIgnoreCase(s, closerPrefix, k)
            if (cl < 0) k = n
            else {
              val g2 = s.indexOf('>', cl + closerPrefix.length)
              if (g2 < 0) k = n // no '>' to EOF: no closer can ever complete
              else closeEnd = g2
            }
          }
          if (closeEnd < 0) { out.append(c); i += 1 } // unclosed: regex no-match
          else { out.append(' '); i = closeEnd + 1 }
        }
      }
    }
    out.toString
  }

  /** `(?s)<!--.*?-->` / `(?s)<!\[CDATA\[.*?\]\]>` → ' ' — literal
    * delimiters, non-greedy = first closer.
    */
  private def dropLiteralSpans(s: String, opener: String, closer: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == '<' && s.regionMatches(i, opener, 0, opener.length)) {
        val end = s.indexOf(closer, i + opener.length)
        if (end < 0) { out.append(s.charAt(i)); i += 1 }
        else { out.append(' '); i = end + closer.length }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Block-level element names of [[graft.operators.Html.BlockTagPattern]]. */
  private val BlockNames: Set[String] = Set(
    "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "dl", "dt", "dd", "tr", "table", "thead", "tbody", "td", "th",
    "caption", "blockquote", "pre", "form", "section", "article", "aside",
    "nav", "header", "footer", "figure", "figcaption", "address")

  /** The block pass — its OWN scan, NOT fused with the generic pass:
    * the two regexes run sequentially over the whole string, and a
    * non-block tag with '<' inside an attribute value (`<a b="<div>">`)
    * must leave its '<' for the generic pass to re-anchor on AFTER the
    * inner block tag became '\n' — a fused single consume diverges.
    * Per position: '<', optional '/', a block name, `\b`, then
    * `[^>]*>` to the FIRST '>' → '\n'; anything else is a no-match and
    * the scan advances one char, exactly like the regex engine.
    */
  private def blockTagPass(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '<') {
        var j = i + 1
        if (j < n && s.charAt(j) == '/') j += 1
        var k = j
        while (k < n && isWordChar(s.charAt(k))) k += 1
        val name = s.substring(j, k).toLowerCase(java.util.Locale.ROOT)
        if (BlockNames.contains(name)) {
          // \b holds by construction (k is the end of the word run);
          // complete `[^>]*>`
          val gt = s.indexOf('>', k)
          if (gt >= 0) { out.append('\n'); i = gt + 1; consumed = true }
        }
      }
      if (!consumed) { out.append(c); i += 1 }
    }
    out.toString
  }

  /** The generic tag pass: `(?s)<[^>]*>` → ''; a '<' with no '>' to
    * EOF stays literal.
    */
  private def genericTagPass(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') { out.append(c); i += 1 }
      else {
        val gt = s.indexOf('>', i + 1)
        if (gt < 0) { out.append(c); i += 1 }
        else i = gt + 1
      }
    }
    out.toString
  }

  /** [[graft.operators.Html.Entities]] in their exact order: at each
    * '&', the FIRST entity (in decode order) matching at this position
    * wins; its replacement is emitted and never rescanned — identical
    * to the sequential `replace()` chain because earlier replacements
    * never create later patterns (no replacement contains '&' except
    * `&amp;`→`&`, which is LAST).
    */
  private val Entities: Array[(String, String)] =
    graft.operators.Html.Entities.toArray

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        var hit = -1
        var e = 0
        while (hit < 0 && e < Entities.length) {
          if (s.regionMatches(i, Entities(e)._1, 0, Entities(e)._1.length)) hit = e
          e += 1
        }
        if (hit < 0) { out.append(c); i += 1 }
        else { out.append(Entities(hit)._2); i += Entities(hit)._1.length }
      }
    }
    out.toString
  }

  /** The three normalization regexes fused into two scans:
    * `[ \t\r\f]+`→' ', then ` ?\n[\n ]*`→'\n', then edge trim.
    */
  private def normalizeWhitespace(s: String): String = {
    val a = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    // pass 1: horizontal runs → one space
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\f') {
        a.append(' ')
        while (i < n && { val d = s.charAt(i); d == ' ' || d == '\t' || d == '\r' || d == '\f' }) i += 1
      } else { a.append(c); i += 1 }
    }
    // pass 2: ` ?\n[\n ]*` → '\n' (regex scans left-to-right: an
    // optional single space before the first \n joins the run, then
    // any mix of \n and spaces after)
    val t = a.toString
    val b = new java.lang.StringBuilder(t.length)
    i = 0
    val m = t.length
    while (i < m) {
      val c = t.charAt(i)
      val isSpaceThenNl = c == ' ' && i + 1 < m && t.charAt(i + 1) == '\n'
      if (c == '\n' || isSpaceThenNl) {
        b.append('\n')
        i += (if (isSpaceThenNl) 2 else 1)
        while (i < m && (t.charAt(i) == '\n' || t.charAt(i) == ' ')) i += 1
      } else { b.append(c); i += 1 }
    }
    // pass 3: `^\s+|\s+$` → '' — Java regex \s is EXACTLY
    // [ \t\n\x0B\f\r] (ASCII), narrower than Character.isWhitespace;
    // unicode whitespace at the edges must survive like the regex
    // leaves it
    def isRegexWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var lo = 0
    var hi = b.length
    while (lo < hi && isRegexWs(b.charAt(lo))) lo += 1
    while (hi > lo && isRegexWs(b.charAt(hi - 1))) hi -= 1
    b.substring(lo, hi)
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** `\b` after a tag name: position at end, or next char non-word. */
  private def isNonWord(s: String, i: Int): Boolean =
    i >= s.length || !isWordChar(s.charAt(i))

  /** ASCII-only case fold. The reference lane's Java regex uses `(?i)`
    * WITHOUT `UNICODE_CASE`, which folds only A-Z↔a-z; Java's
    * `String.regionMatches(true, …)` does full Unicode folding
    * (ſ U+017F↔s, ı U+0131↔i via toUpperCase), so `<ſcript>` would
    * have opened a raw-text span in the fast kernel but not in the
    * regex chain — breaking the two lanes' equivalence contract
    * (advice r13). DuckDB RE2's `(?i)` folds differently again (ſ yes,
    * ı no), so ASCII-only — the Java regex semantics both lanes and
    * the oracle's shared chain are written against — is the one
    * definition all three agree on for ASCII tag names.
    */
  private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def regionMatchesIgnoreCase(s: String, at: Int, what: String): Boolean = {
    if (at < 0 || at > s.length - what.length) return false
    var k = 0
    while (k < what.length) {
      if (asciiLower(s.charAt(at + k)) != asciiLower(what.charAt(k))) return false
      k += 1
    }
    true
  }

  private def indexOfIgnoreCase(s: String, what: String, from: Int): Int = {
    val first = asciiLower(what.charAt(0))
    var i = math.max(0, from)
    val last = s.length - what.length
    while (i <= last) {
      if (asciiLower(s.charAt(i)) == first && regionMatchesIgnoreCase(s, i, what))
        return i
      i += 1
    }
    -1
  }
}

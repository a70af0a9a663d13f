package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup main-content extraction — the FIRST stage of a
  * web-scale corpus pipeline (round-12 verdict #1): every downstream
  * operator this engine already has (quality gates, dedup families,
  * boilerplate 5-grams, BPE, packing) assumes extracted text, and raw
  * crawl data is markup.
  *
  * Reference anchor: none — the reference ingests xlsx
  * (/root/reference/src/main.py:27); this is extended LLM-pipeline
  * surface, the q149 redaction precedent applied to markup: the whole
  * chain is RE2-SAFE regex + fixed-string replaces shared VERBATIM
  * with the DuckDB oracle (no lookahead/backreferences — RE2 has
  * neither), so extraction is oracle-replicable bit-for-bit.
  *
  * Pipeline (order matters, each step a whole-stage-codegen'd
  * `regexp_replace`/`replace` — pure map, no shuffle, scale-trivial):
  *
  *  1. drop `<script>…</script>` / `<style>…</style>` SPANS (their
  *     content is code, not text; non-greedy `.*?` to the first
  *     closer — the HTML5 parsing rule for raw-text elements),
  *  2. drop comments `<!-- … -->` and CDATA sections (their content
  *     is not rendered text),
  *  3. BLOCK-level tags → newline (paragraph/heading/list/table
  *     boundaries survive as line breaks — the block-text assembler
  *     that keeps boilerplate-gram windows (q101/q131) from spanning
  *     unrelated blocks),
  *  4. every remaining tag → '' (inline tags join their text),
  *  5. decode the fixed named/numeric entity set, `&amp;` LAST (so
  *     double-encoded `&amp;lt;` decodes one level, to `&lt;` — the
  *     standard order),
  *  6. whitespace normalize: horizontal runs → one space, newline
  *     runs (with surrounding spaces) → one newline, trim.
  *
  * Entity decoding is the FIXED set below, not general `&#NNN;`
  * numeric decode: a computed code point cannot be produced by a
  * static regex replacement in either engine, and the named set plus
  * the apostrophe codes covers what block text actually carries;
  * unknown entities pass through verbatim (visible, not silently
  * eaten). Malformed markup degrades the same way in both engines:
  * an UNCLOSED script/style span stays in place (the non-greedy span
  * never matches without its closer) and its tags are then stripped
  * as plain tags by step 4 — content leaks rather than text being
  * swallowed to end-of-document, the safe failure direction for a
  * keep-the-text pipeline.
  */
object Html {

  /** `<script …>…</script>` span, case-insensitive, dot-matches-
    * newline. `[^>]*` in the opener means an attribute value
    * containing '>' ends the opener early — the tail is then dropped
    * with the span body, an accepted (and oracle-identical)
    * approximation that avoids backtracking attribute grammars RE2
    * cannot express.
    */
  val ScriptPattern: String = "(?is)<script\\b[^>]*>.*?</script[^>]*>"

  /** `<style …>…</style>` span — same shape as [[ScriptPattern]]. */
  val StylePattern: String = "(?is)<style\\b[^>]*>.*?</style[^>]*>"

  /** HTML comment. Non-greedy: `<!-- a --> keep <!-- b -->` keeps the
    * middle. Nested comments are not a thing in HTML (the first `-->`
    * closes), which is exactly what non-greedy does.
    */
  val CommentPattern: String = "(?s)<!--.*?-->"

  /** CDATA section (XHTML/embedded-XML islands). */
  val CdataPattern: String = "(?s)<!\\[CDATA\\[.*?\\]\\]>"

  /** Open OR close tag of a block-level element → line break. */
  val BlockTagPattern: String =
    "(?is)</?(p|div|br|hr|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|tr|table|thead|tbody|td|th|caption|blockquote|pre|form|section|article|aside|nav|header|footer|figure|figcaption|address)\\b[^>]*>"

  /** Any remaining tag (inline elements, doctype, unknown) → ''. */
  val TagPattern: String = "(?s)<[^>]*>"

  /** Fixed entity set, DECODE ORDER SIGNIFICANT: `&amp;` must be last
    * so double-encoded entities decode exactly one level. Fixed-string
    * replaces (no regex), identical `replace()` in both engines.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&apos;" -> "'",
    "&#39;" -> "'",
    "&#x27;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Entity-occurrence counter pattern (audits the RAW markup,
    * independent of decode order — the q149 per-type-count idea).
    */
  val EntityPattern: String = "&(amp|lt|gt|quot|apos|nbsp|#39|#x27);"

  /** `<title>` content (first title; '' when absent in BOTH engines —
    * Spark and DuckDB regexp_extract agree on empty-on-miss).
    */
  val TitlePattern: String = "(?is)<title[^>]*>(.*?)</title"

  /** Whitespace normalization chain (see object doc, step 6). */
  val HorizontalWsPattern: String = "[ \\t\\r\\f]+"
  val NewlineRunPattern: String = " ?\\n[\\n ]*"
  val EdgeWsPattern: String = "^\\s+|\\s+$"

  private def chain(c: Column, steps: Seq[(String, String)]): Column =
    steps.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, lit(pat), lit(repl))
    }

  /** Markup stripped to block text: the object-doc pipeline, steps
    * 1-4 + 6 (no entity decode — see [[extractText]] for the full
    * chain). Exposed separately so callers that need the raw entity
    * forms (e.g. to count them per type post-strip) can.
    */
  def stripMarkup(html: Column): Column =
    chain(html, Seq(
      ScriptPattern -> " ",
      StylePattern -> " ",
      CommentPattern -> " ",
      CdataPattern -> " ",
      BlockTagPattern -> "\n",
      TagPattern -> ""))

  /** Full main-content extraction: strip + entity decode + whitespace
    * normalization. One codegen'd map chain; null in → null out.
    */
  def extractText(html: Column): Column = {
    val decoded = Entities.foldLeft(stripMarkup(html)) {
      case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch))
    }
    chain(decoded, Seq(
      HorizontalWsPattern -> " ",
      NewlineRunPattern -> "\n",
      EdgeWsPattern -> ""))
  }

  /** [[extractText]] through the fused single-kernel scanner
    * ([[graft.expressions.HtmlExtractText]]): identical output by
    * contract — every pass mirrors its regex one-for-one, pinned
    * property-style by HtmlFastSpec and at corpus scale by q214's
    * oracle (which replicates the REGEX chain in DuckDB) — at a
    * fraction of the cost: nine `java.util.regex` engine invocations
    * per row (the non-greedy span patterns backtrack) become indexOf/
    * char scans. The regex chain stays the REFERENCE definition (it is
    * what the oracle shares); this is the hot-path lane.
    */
  def extractTextFast(html: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HtmlExtractText(
        org.apache.spark.sql.graft.ColumnBridge.expression(html)))

  /** First `<title>` content, '' when absent. */
  def extractTitle(html: Column): Column =
    regexp_extract(html, TitlePattern, 1)

  /** Tag-shaped token count over the RAW markup (includes tags inside
    * script/comment spans — it audits the markup, not the extraction).
    */
  def tagCount(html: Column): Column =
    size(regexp_extract_all(html, lit(TagPattern), lit(0))).cast("long")

  /** Known-entity occurrence count over the RAW markup. */
  def entityCount(html: Column): Column =
    size(regexp_extract_all(html, lit(EntityPattern), lit(0))).cast("long")
}

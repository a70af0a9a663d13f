package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[HtmlExtractText]] ≡ the [[graft.operators.Html]] regex chain —
  * the fused kernel's entire value rests on this equivalence, so it is
  * pinned three ways: (a) an in-JVM reference implementation of the
  * chain (java.util.regex, the same engine Spark's regexp_replace
  * uses) against a seeded ADVERSARIAL markup generator plus the known
  * nasty corners from the kernel's derivation; (b) column-level
  * equality of extractText vs extractTextFast over the q214 planted
  * corpus; (c) q214's DuckDB oracle (the chain in RE2) gates the fast
  * lane at every driver round.
  */
class HtmlExtractSpec extends SparkTestBase {
  import graft.operators.Html

  /** The regex chain exactly as Spark executes it (regexp_replace =
    * java.util.regex replaceAll; replace = String.replace).
    */
  private def chainReference(s: String): String = {
    import java.util.regex.{Matcher, Pattern}
    def re(p: String, repl: String)(x: String): String =
      Pattern.compile(p).matcher(x).replaceAll(Matcher.quoteReplacement(repl))
    val stripped = Seq(
      Html.ScriptPattern -> " ",
      Html.StylePattern -> " ",
      Html.CommentPattern -> " ",
      Html.CdataPattern -> " ",
      Html.BlockTagPattern -> "\n",
      Html.TagPattern -> "").foldLeft(s) { case (acc, (p, r)) => re(p, r)(acc) }
    val decoded = Html.Entities.foldLeft(stripped) {
      case (acc, (e, c)) => acc.replace(e, c)
    }
    Seq(
      Html.HorizontalWsPattern -> " ",
      Html.NewlineRunPattern -> "\n",
      Html.EdgeWsPattern -> "").foldLeft(decoded) { case (acc, (p, r)) => re(p, r)(acc) }
  }

  private val corners = Seq(
    "", " ", "plain text only",
    // unclosed spans leak; closed spans drop
    "<script>var x=1;", "a<style>.x{}", "<script>a</script>b",
    "<script >x</script>", "<scripts>not raw</scripts>", "<script",
    "pre<script a=\"b>c\">var x;</script>post",
    // cross-nested raw-text spans: script pass runs FIRST over the
    // whole string (the fused kernel's hardest ordering case)
    "<style>A<script>B</style>C</script>D",
    "<script>A<style>B</script>C</style>D",
    "<!-- <script> -->text", "<script><!-- </script> -->x",
    "<!-- a </script> --><script>b",
    // comments/CDATA: nested-ish, unterminated, empty
    "a<!-- x <p>fake</p> -->b<!-- y -->c", "<!---->", "<!-->", "a<!-- open",
    "a<![CDATA[raw <b> ]]>b", "<![CDATA[unclosed", "<![cdata[case]]>",
    // tags: block vs inline, case, attributes with '<' and '>', bare brackets
    "<div>first</div><div>second</div>", "<DIV a=1>x</dIv>",
    "<a b=\"<div>\">y</a>", "<prefoo>x</prefoo>", "<pre foo>x</pre>",
    "</ div>z", "< p>not a block</ p>", "a < b > c", "a<b", "a>b", "<",
    ">", "<>", "< >", "<h1h>t</h1h>", "<h1>t</h1>", "<br/><hr />",
    // entities: whole set, double-encoded, bogus, truncated, adjacent
    "&lt;tag&gt; &quot;q&quot; &apos;a&apos; &#39;b&#x27; c&nbsp;d &amp; e",
    "&amp;lt; &amp;amp;", "&bogus; &#9731; &", "&am&amp;p;", "&amp",
    "&&lt;&", "&amp;&amp;",
    // ASCII-only (?i) — advice r13: Unicode case-fold homoglyphs
    // (ſ U+017F↔s, ı U+0131↔i, İ U+0130↔i under Java toLower/toUpper)
    // must NOT open raw-text spans; Java regex (?i) without
    // UNICODE_CASE treats these as ordinary tags
    "<ſcript>var x;</ſcript>after", "<scrıpt>a</scrıpt>b",
    "<SCRİPT>c</SCRİPT>d", "<ſtyle>.x{}</ſtyle>e",
    "pre<ſcript>leak<script>drop</script>keep",
    // whitespace torture
    " \t a \r\n\n b \f ", "\n\n\n", " \n \n ", "a  \n  b", "\t\r\f",
    "xy", "", "  unicode-space edge  ")

  /** Seeded adversarial generator: random concatenation of fragment
    * families, biased toward boundary abuse.
    */
  private def randomMarkup(rnd: scala.util.Random): String = {
    val words = Array("data", "Key", "row", "<", ">", "&", ";", "/", "\"", "'")
    val names = Array("script", "style", "div", "p", "b", "i", "h1", "pre",
      "SCRIPT", "Style", "DIV", "unknown", "scr", "scripts", "h1h",
      "ſcript", "scrıpt", "ſtyle") // Unicode-fold homoglyphs (advice r13)
    def name() = names(rnd.nextInt(names.length))
    def frag(): String = rnd.nextInt(14) match {
      case 0 => s"<${name()}${if (rnd.nextBoolean()) " a=\"" + words(rnd.nextInt(words.length)) + "\"" else ""}>"
      case 1 => s"</${name()}>"
      case 2 => s"<${name()}"
      case 3 => "<!--"
      case 4 => "-->"
      case 5 => "<![CDATA["
      case 6 => "]]>"
      case 7 =>
        val ents = Array("&lt;", "&gt;", "&amp;", "&quot;", "&nbsp;", "&#39;",
          "&#x27;", "&apos;", "&bogus;", "&amp;lt;", "&am", "&")
        ents(rnd.nextInt(ents.length))
      case 8 =>
        val ws = Array(" ", "\t", "\n", "\r", "\f", "  \n ", "\n\n")
        ws(rnd.nextInt(ws.length))
      case 9 => words(rnd.nextInt(words.length))
      case 10 => s"<${name()} ${words(rnd.nextInt(words.length))}>"
      case 11 => "txt" + rnd.nextInt(10)
      case 12 => ">"
      case _ => "<"
    }
    (0 until (1 + rnd.nextInt(24))).map(_ => frag()).mkString
  }

  test("fused kernel == regex chain on every corner fixture") {
    for (s <- corners)
      assert(HtmlExtractText.extract(s) == chainReference(s),
        s"DIVERGED on <<$s>>:\n fast=${HtmlExtractText.extract(s)}\nchain=${chainReference(s)}")
  }

  test("fused kernel == regex chain on 4000 adversarial random markups (seeded)") {
    val rnd = new scala.util.Random(20260816L)
    for (i <- 1 to 4000) {
      val s = randomMarkup(rnd)
      val fast = HtmlExtractText.extract(s)
      val chain = chainReference(s)
      assert(fast == chain, s"DIVERGED on case $i <<$s>>:\n fast=$fast\nchain=$chain")
    }
  }

  test("column lane: extractTextFast == extractText over the planted q214 corpus") {
    val docs = graft.Registry.byName("q214_html_extract")
      .run(spark, "/root/testdata/sf0.001")
    // q214 runs the FAST lane; recompute the chain on the same planted
    // html via the title column's source — simplest: rebuild from docs
    val base = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = base.select(col("doc_id"), graft.queries.TextQueries9.plantedHtmlForSpec.as("h"))
      .select(col("doc_id"),
        graft.operators.Html.extractText(col("h")).as("a"),
        graft.operators.Html.extractTextFast(col("h")).as("b"))
      .where(col("a") =!= col("b") ||
        col("a").isNull =!= col("b").isNull)
    assert(diff.isEmpty, s"lanes diverged on ${diff.count()} docs")
  }

  test("null in, null out") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("h")
      .select(graft.operators.Html.extractTextFast(col("h"))).head()
    assert(r.isNullAt(0))
  }
}

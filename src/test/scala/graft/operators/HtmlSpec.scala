package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Html]] main-content extraction: the RE2-safe strip/decode/
  * normalize chain on literal fixtures — well-formed documents, the
  * malformed/nested/CDATA cases the object doc promises, and the
  * degradation direction for broken markup (content LEAKS, text is
  * never swallowed). Cross-engine bit-equality is the q214 oracle's
  * job; this pins the Scala-side semantics.
  */
class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(Option(html)).toDF("h")
      .select(Html.extractText(col("h"))).head().getString(0)

  private def title(html: String): String =
    Seq(html).toDF("h").select(Html.extractTitle(col("h"))).head().getString(0)

  test("well-formed document: scripts/styles/comments dropped, blocks become lines, inline tags join, entities decode") {
    val html =
      """<!DOCTYPE html><html><head><title>T</title>
        |<style>.x{color:red}</style>
        |<script type="text/js">var a=1; if(a<2 && a>0){f("<p>fake</p>");}</script>
        |</head><body>
        |<h1>Head</h1>
        |<p>one <b>bold</b> and <i>ital</i></p>
        |<ul><li>alpha</li><li>beta</li></ul>
        |<!-- hidden -->
        |<table><tr><td>c1</td><td>c2</td></tr></table>
        |&quot;q&quot; &amp; &lt;tag&gt; &#39;s&nbsp;end
        |</body></html>""".stripMargin
    assert(extract(html) ==
      "T\nHead\none bold and ital\nalpha\nbeta\nc1\nc2\n\"q\" & <tag> 's end")
  }

  test("unclosed script/style spans degrade by LEAKING content, never by swallowing trailing text") {
    // no closer -> the span pattern cannot match; the opener is then
    // stripped as a plain tag and the code text leaks into the output
    assert(extract("<script>var x=1;") == "var x=1;")
    assert(extract("a<style>.x{}") == "a.x{}")
    // the document text AFTER the unclosed span survives
    assert(extract("<script>var x=1;<p>keep me</p>") == "var x=1;\nkeep me")
  }

  test("script opener with a '>' inside an attribute value ends the opener early — span still dropped to the real closer") {
    assert(extract("""pre<script a="b>c">var x;</script>post""") == "pre post")
  }

  test("comments: non-greedy keeps text between two comments; comment content including tags is dropped") {
    assert(extract("a<!-- x <p>fake</p> -->b<!-- y -->c") == "a b c")
  }

  test("CDATA sections drop whole, including tag-looking content") {
    assert(extract("a<![CDATA[raw <b>not bold</b> ]]>b") == "a b")
  }

  test("entity decode is one level: double-encoded stays encoded once; unknown entities pass through") {
    assert(extract("&amp;lt; &amp;amp;") == "&lt; &amp;")
    assert(extract("&bogus; &#9731;") == "&bogus; &#9731;")
  }

  test("null -> null, empty -> empty, whitespace-only -> empty") {
    val r = Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Some(" \n \t ")))
      .toDF("id", "h")
      .select(col("id"), Html.extractText(col("h")).as("t"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1))
    assert(r(1).getString(1) == "")
    assert(r(2).getString(1) == "")
  }

  test("title: first title wins; missing -> ''") {
    assert(title("<title>A</title><title>B</title>") == "A")
    assert(title("<TITLE lang=en>mixed</TITLE>") == "mixed")
    assert(title("<p>no title</p>") == "")
  }

  test("tag/entity counters audit the raw markup") {
    val r = Seq("<p>a</p><!-- c --> &amp; &bogus; <br/>").toDF("h")
      .select(Html.tagCount(col("h")).as("t"), Html.entityCount(col("h")).as("e"))
      .head()
    // <p>, </p>, <!-- c --> (tag-shaped: '<' then non-'>' run then '>'), <br/>
    assert(r.getLong(0) == 4L, s"tags=${r.getLong(0)}")
    assert(r.getLong(1) == 1L, s"entities=${r.getLong(1)}")
  }

  test("block assembly keeps boilerplate-gram windows from spanning blocks: newline survives between blocks, not inside") {
    val html = "<div>first block</div><div>second block</div>"
    assert(extract(html) == "first block\nsecond block")
  }
}

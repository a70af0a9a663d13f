package graft.functions

import graft.SparkTestBase

/** URL canonicalization edge cases: tracked params in every position,
  * default-port and case folding on the authority only, fragments, and
  * the things canonicalization must NOT touch (path case, meaningful
  * params, non-default ports).
  */
class CanonicalUrlSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(TextFunctions.canonicalUrl($"u").as("c"))
      .as[String].collect().toSeq

  test("authority folds case and default ports; path case survives") {
    assert(canon("HTTPS://WWW.Example.COM:443/Docs/A?x=1") ==
      Seq("https://www.example.com/Docs/A?x=1"))
    assert(canon("http://Host.Com:80/p") == Seq("http://host.com/p"))
    // a NON-default port is meaningful and survives
    assert(canon("https://h.com:8443/p") == Seq("https://h.com:8443/p"))
  }

  test("tracking params drop in first/middle/last/only positions") {
    assert(canon("https://h.com/p?utm_source=a&x=1") == Seq("https://h.com/p?x=1"))
    assert(canon("https://h.com/p?x=1&utm_medium=b&y=2") == Seq("https://h.com/p?x=1&y=2"))
    assert(canon("https://h.com/p?x=1&gclid=zz") == Seq("https://h.com/p?x=1"))
    assert(canon("https://h.com/p?fbclid=q") == Seq("https://h.com/p"))
    // multiple tracked params at once
    assert(canon("https://h.com/p?utm_source=a&utm_campaign=b&x=1") ==
      Seq("https://h.com/p?x=1"))
  }

  test("fragments strip; meaningful params and empty queries are stable") {
    assert(canon("https://h.com/p?x=1#sec-2") == Seq("https://h.com/p?x=1"))
    assert(canon("https://h.com/p#only-frag") == Seq("https://h.com/p"))
    assert(canon("https://h.com/p?ref=en") == Seq("https://h.com/p?ref=en"))
  }

  test("a param whose NAME merely contains a tracked name must survive") {
    // the unanchored first pass matched mid-name: "?xgclid=5&y=1" lost
    // the legitimate xgclid param and merged its prefix into y
    assert(canon("https://h.com/p?xgclid=5&y=1") == Seq("https://h.com/p?xgclid=5&y=1"))
    assert(canon("https://h.com/p?myutm_source=1") == Seq("https://h.com/p?myutm_source=1"))
  }

  test("consecutive tracked params drop as a run, in any position") {
    assert(canon("https://h.com/p?utm_a=1&utm_b=2&x=1") == Seq("https://h.com/p?x=1"))
    assert(canon("https://h.com/p?x=1&utm_a=1&utm_b=2&y=2") == Seq("https://h.com/p?x=1&y=2"))
    assert(canon("https://h.com/p?x=1&utm_a=1&utm_b=2") == Seq("https://h.com/p?x=1"))
    assert(canon("https://h.com/p?utm_a=1&utm_b=2") == Seq("https://h.com/p"))
  }

  test("default-port stripping is scheme-specific") {
    // :443 is NOT the default for http, :80 not for https — different
    // endpoints must keep distinct canonical keys
    assert(canon("http://h.com:443/p") == Seq("http://h.com:443/p"))
    assert(canon("https://h.com:80/p") == Seq("https://h.com:80/p"))
  }
}

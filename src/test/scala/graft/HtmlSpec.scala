package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.wbot.{Fixtures, Html, Oracle, UrlFuncs}

class HtmlSpec extends AnyFunSuite {

  test("findLinks: selector-group order (a, link, img, script, iframe), doc order within group") {
    val html =
      """<html><head><link href="l1"><script src="s1"></script></head>
        |<body><img src="i1"><a href="a1">x</a><iframe src="f1"></iframe>
        |<a href="a2">y</a><img src="i2"></body></html>""".stripMargin
    // reference order: all a[href], then link[href], img[src], script[src], iframe[src]
    assert(Html.findLinks(html) == Vector("a1", "a2", "l1", "i1", "i2", "s1", "f1"))
  }

  test("findLinks: script body is RAWTEXT — tags inside are not parsed") {
    val html = """<script>var s = "<a href='notalink'>";</script><a href="real">x</a>"""
    assert(Html.findLinks(html) == Vector("real"))
  }

  test("findLinks: comments and doctype skipped; entities decoded in attrs") {
    val html = """<!DOCTYPE html><!-- <a href="no"> --><a href="/p?a=1&amp;b=2">x</a>"""
    assert(Html.findLinks(html) == Vector("/p?a=1&b=2"))
  }

  test("findLinks: tags without the selected attr are skipped; unquoted attrs parse") {
    val html = """<a name="anchor-only">x</a><a href=/plain>y</a><link rel="x">"""
    assert(Html.findLinks(html) == Vector("/plain"))
  }

  test("body truncation happens BEFORE extraction (http_client.go:117-123)") {
    val html = """<a href="/first">x</a><a href="/second">y</a>"""
    val bytes = html.getBytes("UTF-8")
    assert(Html.findLinksBytes(bytes, bytes.length.toLong) == Vector("/first", "/second"))
    // cut mid-second-tag: only the first link survives
    assert(Html.findLinksBytes(bytes, 30L) == Vector("/first"))
  }

  test("extractText: whitespace collapse + entity decode + rawtext skip") {
    val html = "<html><body>\n<h1>Hello</h1>\n<p>a  b\tc</p><script>skip()</script>\n<p>&amp; done</p></body></html>"
    assert(Html.extractText(html) == "Hello a b c & done")
  }

  test("fixture invariant: extractText(html) == text byte-identically for every tiny page") {
    Fixtures.allPages(Fixtures.tiny).foreach { p =>
      val extracted = Html.extractTextBytes(p.html)
      assert(extracted == p.text, s"text mismatch for ${p.url}")
    }
  }

  test("fixture invariant holds on the small (skewed) spec too") {
    Fixtures.allPages(Fixtures.small).foreach { p =>
      assert(Html.extractTextBytes(p.html) == p.text, s"text mismatch for ${p.url}")
    }
  }

  test("all fixture page urls are valid and canonically unique") {
    val pages = Fixtures.allPages(Fixtures.tiny)
    val canons = pages.map(p => UrlFuncs.newUrl(p.url).fold(e => fail(s"${p.url}: $e"), _.canon))
    assert(canons.distinct.size == canons.size)
  }

  test("oracle smoke: tiny crawl reaches pages, metrics identities hold") {
    val spec = Fixtures.tiny
    val r = Oracle.run(Fixtures.oraclePages(spec), Fixtures.seeds(spec),
      graft.wbot.Schemas.CrawlConfig(maxDepth = 4))
    assert(r.order.nonEmpty)
    assert(r.metrics("total_requests") ==
      r.metrics("successful_requests") + r.metrics("failed_requests"))
    assert(r.metrics("total_link") ==
      r.metrics("crawled_link") + r.metrics("skipped_link") + r.metrics("duplicated_link"))
    // seq strictly increasing in stream order; depths never decrease (BFS)
    assert(r.order.map(_.seq) == r.order.map(_.seq).sorted)
    assert(r.order.map(_.depth) == r.order.map(_.depth).sorted)
    // the seed-rediscovery quirk: at least one canon crawled twice
    val dupCanons = r.order.groupBy(_.canon).filter(_._2.size > 1)
    assert(dupCanons.nonEmpty, "expected seed re-crawl (seeds not pre-marked)")
    dupCanons.values.foreach(v => assert(v.size == 2)) // exactly twice, then seen
  }
}

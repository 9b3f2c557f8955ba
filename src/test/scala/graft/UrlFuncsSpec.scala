package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.wbot.{GoUrl, UrlFuncs}

/** Golden tests for URL identity — the semantics core.
  * Vectors hand-derived from the reference's `hashLink`
  * (`/root/reference/pkg/api/wbot.go:219-238`, Go net/url serialization
  * rules) and `TestHostname`'s table
  * (`/root/reference/pkg/api/test_wbot.go:5-39`). */
class UrlFuncsSpec extends AnyFunSuite {

  // --- TestHostname table, ported verbatim (test_wbot.go:6-21)
  test("registrable domain — valid URLs (reference test table)") {
    assert(UrlFuncs.hostnameRoot("http://www.google.com") == Right("google.com"))
    assert(UrlFuncs.hostnameRoot("https://sub.domain.google.com") == Right("google.com"))
    assert(UrlFuncs.hostnameRoot("http://beta.moon.facebook.com") == Right("facebook.com"))
  }

  test("registrable domain — invalid URLs (reference test table)") {
    assert(UrlFuncs.hostnameRoot("http://www.google.invalidTLD").isLeft)
    assert(UrlFuncs.hostnameRoot("https://example.com.xxy").isLeft)
    // ftp scheme passes Hostname() (no scheme check there) but fails NewURL
    assert(UrlFuncs.newUrl("ftp://example.site").isLeft)
  }

  test("newUrl scheme / TLD / host validation (wbot.go:138-152)") {
    assert(UrlFuncs.newUrl("ftp://a.com").swap.exists(_.contains("invalid scheme")))
    assert(UrlFuncs.newUrl("http://a.unknowntld").swap.exists(_.contains("invalid TLD")))
    assert(UrlFuncs.newUrl("http://com").isLeft) // host is itself a suffix
    assert(UrlFuncs.newUrl("http:///x").isLeft) // empty host
    assert(UrlFuncs.newUrl("http://a.com/%zz").isLeft) // malformed escape → parse error
    assert(UrlFuncs.newUrl("http://a.com").isRight)
    assert(UrlFuncs.newUrl("https://a.co.uk").isLeft) // "uk" not in the 451-TLD whitelist
  }

  // --- canonicalization + sha256 golden vectors (sha256 precomputed independently)
  private val golden = Seq(
    // www strip + empty path + trailing-slash trim
    ("http://www.google.com", "google.com",
      "d4c9d9027326271a89ce51fcaf328ed673f17be33469ff979e8ab8dd501e664f"),
    ("http://www.google.com/", "google.com",
      "d4c9d9027326271a89ce51fcaf328ed673f17be33469ff979e8ab8dd501e664f"),
    // query preserved raw
    ("https://sub.domain.google.com/a/b?q=1", "sub.domain.google.com/a/b?q=1",
      "7cc2491d952847e0b34ebb182287911bacffd5053e923ca28e1f9f676bd22907"),
    // single-encoded path keeps its original escaped form (Go EscapedPath
    // prefers a RawPath that still round-trips)
    ("http://a.com/a%20b", "a.com/a%20b",
      "e4d5a007f0ab6865f550a35e906e0e2176626b43ff5b676fed3b714d8b9660ed"),
    // double-encoded path decodes ONE level (the hashLink PathUnescape step)
    ("http://a.com/a%2520b", "a.com/a%20b",
      "e4d5a007f0ab6865f550a35e906e0e2176626b43ff5b676fed3b714d8b9660ed"),
    // dot segments survive direct parse (no normalization in url.Parse)
    ("http://a.com/x/../y", "a.com/x/../y",
      "8dbc5a6d9bd77f6b98afc74d5b20e982d5177ab3d04e8c603535275a64a0e50c"),
    // TrimRight applies to the SERIALIZED string — trailing slash after query
    ("http://a.com/x?q=1/", "a.com/x?q=1",
      "8afe2cf95d31e5e4a8fb8604aff71e1cc530b7ef4ba7c805d3601ed004def62a"),
    // fragments on seeds survive into the canonical form
    ("http://a.com/x#sec", "a.com/x#sec",
      "b035c1e85aebc9f8e1cfc5c0cf6d5c369ff09a9336757acc0710f3df06a428c3"),
    // port rides along in host; www strip is on host[:port]
    ("http://www.a.com:8080/x", "a.com:8080/x",
      "7f8bd8e1370efaea33a202cbb5235cecbeeb199993a75183b14ef79f12059411"),
    // case preserved in canonical form (Go does not normalize host case)
    ("http://Example.COM/Path", "Example.COM/Path",
      "a34eb0fde305cbc7c37248e6eac5716541aaa9f3bc7b0ab4adb3d6df10ca502e"),
    // multiple trailing slashes all trimmed
    ("http://a.com/x///", "a.com/x",
      "26761ef1ecab7e735634a9efb34a8e9dfa2f83eb972d70b3ad8883f0e8bba98b")
  )

  test("canonical form + sha256 golden vectors (hashLink, wbot.go:219-238)") {
    golden.foreach { case (raw, canon, hash) =>
      val p = UrlFuncs.newUrl(raw).fold(e => fail(s"$raw: $e"), identity)
      assert(p.canon == canon, s"canon of $raw")
      assert(p.hash == hash, s"hash of $raw")
    }
  }

  test("www strip is case-sensitive and literal (strings.TrimPrefix)") {
    val p = UrlFuncs.newUrl("http://WWW.a.com/x").toOption.get
    assert(p.canon == "WWW.a.com/x") // "WWW." ≠ "www." — no strip
  }

  test("percent-encoded path that still round-trips keeps its escaped form") {
    val p = UrlFuncs.newUrl("http://a.com/d%31/p5").toOption.get
    assert(p.canon == "a.com/d%31/p5") // distinct identity from /d1/p5
    val q = UrlFuncs.newUrl("http://a.com/d1/p5").toOption.get
    assert(p.hash != q.hash)
  }

  // --- resolution (Request.ResolveURL, wbot.go:110-123 + Go ResolveReference)
  private def base(s: String) = GoUrl.parse(s).toOption.get

  test("resolve: relative, absolute-path, query-only, net-path, dot segments") {
    val b = base("http://a.com/d1/p4?q=0")
    def res(h: String) = UrlFuncs.resolveUrl(b, h).map(_.str)
    assert(res("../d2/p5") == Right("http://a.com/d2/p5"))
    assert(res("x") == Right("http://a.com/d1/x"))
    assert(res("/y") == Right("http://a.com/y"))
    assert(res("?q=2") == Right("http://a.com/d1/p4?q=2"))
    assert(res("") == Right("http://a.com/d1/p4?q=0"))
    assert(res("//b.com/z") == Right("http://b.com/z"))
    assert(res("https://c.com/w") == Right("https://c.com/w"))
    assert(res("./") == Right("http://a.com/d1/"))
    assert(res("..") == Right("http://a.com/"))
    assert(res("p5#frag") == Right("http://a.com/d1/p5")) // fragment cleared (wbot.go:120)
    assert(res("#frag").isLeft) // pure fragment rejected (wbot.go:111-113)
  }

  test("candidate pipeline drops invalid silently (http_client.go:125-136)") {
    val b = base("http://a.com/")
    assert(UrlFuncs.candidate(b, "ftp://a.com/x").isEmpty)
    assert(UrlFuncs.candidate(b, "http://b.unknowntld/x").isEmpty)
    assert(UrlFuncs.candidate(b, "#sec").isEmpty)
    val c = UrlFuncs.candidate(b, "d1/p2").get
    assert(c.urlStr == "http://a.com/d1/p2")
    assert(c.root == "a.com")
  }

  test("URL edge cases: userinfo, uppercase scheme, ports, opaque, empty") {
    // userinfo rides through serialization and canonicalization
    val p = UrlFuncs.newUrl("http://user:pw@a.com/x").toOption.get
    assert(p.urlStr == "http://user:pw@a.com/x")
    assert(p.canon == "user:pw@a.com/x")
    // scheme is lowercased at parse (Go getScheme)
    assert(UrlFuncs.newUrl("HTTP://a.com/x").toOption.get.canon == "a.com/x")
    // port stripped for domain extraction, kept in canonical host
    assert(UrlFuncs.newUrl("http://a.com:80/").toOption.get.canon == "a.com:80")
    // opaque form (no //) has empty host → domain error
    assert(UrlFuncs.newUrl("http:a.com/x").isLeft)
    // empty / garbage
    assert(UrlFuncs.newUrl("").isLeft)
    assert(UrlFuncs.newUrl("   ").isLeft)
    assert(UrlFuncs.newUrl("http://").isLeft)
    // control characters rejected like Go url.Parse
    assert(UrlFuncs.newUrl("http://a.com/xy").isLeft)
    // scheme-relative parse (no scheme) fails the scheme check
    assert(UrlFuncs.newUrl("//a.com/x").swap.exists(_.contains("invalid scheme")))
  }

  test("rate limit parse (limiter.go:61-90)") {
    import graft.wbot.Schemas._
    assert(parseRateLimit("10/1s") == Budget(10, 1000L))
    assert(parseRateLimit("5/2M") == Budget(5, 120000L))
    assert(parseRateLimit("3/1h") == Budget(3, 3600000L))
    assert(parseRateLimit("bogus") == Budget(10, 1000L)) // fallback to default
    assert(parseRateLimit("5/1x") == Budget(10, 1000L))
    assert(parseRateLimit("a/1s") == Budget(10, 1000L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.wbot.{Fixtures, GoUrl, UrlFuncs}

/**
 * The single-parse candidate fast path must be observationally identical to
 * the reference's literal resolve → String → NewURL re-parse pipeline
 * (`/root/reference/pkg/services/fetcher/http_client.go:125-136`), across
 * the full href grammar the fixtures and the fetcher can produce.
 */
class CandidateFastPathSpec extends AnyFunSuite {

  private val hosts = Gen.oneOf("site0.com", "www.site1.net", "sub.x.site2.org",
    "a.co.uk", "UPPER.Site3.dev", "bad.unknowntld", "com", "x.site0.com.evil.org")
  private val paths = Gen.oneOf("", "/", "/d1/p4", "/d1/p4/", "/a b", "/a%20b",
    "/a%2520b", "/x/../y", "/./z", "/files/doc.pdf", "/d%31/p5", "/p?q=1", "/p?q=1/",
    "/p#frag", "/%zz", "//double")
  private val bases: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https")
    h <- Gen.oneOf("site0.com", "www.site1.net", "sub.site2.org")
    p <- Gen.oneOf("/", "/d1/p4", "/d2/p9?q=0")
  } yield s"$scheme://$h$p"
  private val hrefs: Gen[String] = Gen.oneOf(
    for { h <- hosts; p <- paths } yield s"http://$h$p",
    for { h <- hosts; p <- paths } yield s"//$h$p",
    paths,
    Gen.oneOf("#frag", "p5", "../d2/p7", "d0/p3", "?q=2", "", "ftp://a.com/x",
      "mailto:x@y.com", "javascript:void(0)", "x:y", "p5#s", "./", ".."))

  test("fast path ≡ reparse pipeline across the href grammar (property)") {
    val gen = for { b <- bases; h <- hrefs } yield (b, h)
    (0 until 5000).foreach { i =>
      val (base, href) = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val b = GoUrl.parse(base).toOption.get
      val fast = UrlFuncs.candidate(b, href)
      val slow = UrlFuncs.candidateViaReparse(b, href)
      assert(fast.map(p => (p.urlStr, p.canon, p.hash, p.root, p.host)) ==
        slow.map(p => (p.urlStr, p.canon, p.hash, p.root, p.host)),
        s"base=$base href=$href")
    }
  }

  test("fast path ≡ reparse on every href of the small fixture site") {
    val spec = Fixtures.small
    (0 until spec.totalPages by 7).foreach { g =>
      val (h, l) = spec.hostOf(g)
      val base = GoUrl.parse(Fixtures.pageUrl(spec, h, l)).toOption.get
      val (as, link, img, script, iframe) = Fixtures.hrefsOf(spec, h, l)
      (as :+ link :+ img :+ script :+ iframe).foreach { href =>
        val fast = UrlFuncs.candidate(base, href).map(p => (p.urlStr, p.canon, p.hash, p.root))
        val slow = UrlFuncs.candidateViaReparse(base, href).map(p => (p.urlStr, p.canon, p.hash, p.root))
        assert(fast == slow, s"base=${base.str} href=$href")
      }
    }
  }
}

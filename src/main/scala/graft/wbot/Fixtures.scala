package graft.wbot

/**
 * Deterministic synthetic-web generator (FIXTURES.md §A): emits a closed
 * site graph as rows of the authoritative input schema
 * `pages(url, warc_ts, html, text, lang)` plus seed lists. Pure function of
 * (spec, page index) — no RNG state, no wall clock — so the same spec can be
 * materialized driver-side for unit tests (tiny) or distributed via
 * `spark.range(n).mapPartitions` for benchmarks (large), bit-identically.
 *
 * The link mix deliberately exercises every reference quirk: relative /
 * absolute / www-aliased / percent-encoded hrefs, off-root and
 * substring-superset hosts (Q1 quirk, `/root/reference/crawler.go:252`),
 * bad-extension links (`filter.go:10`), fragment-only hrefs
 * (`wbot.go:111-113`), in-page duplicates, links back to seeds
 * (seeds-not-pre-marked quirk, `in_memory.go:26-30`), and links to missing
 * URLs (fetch error path, `crawler.go:230-234`).
 */
object Fixtures {

  final case class SiteSpec(
      nHosts: Int,
      pagesPerHost: Int,
      skewFactor: Int = 1, // host 0 holds skewFactor × pagesPerHost pages
      seed: Long = 42L,
      fanMin: Int = 3, // leaf out-link fan-out = fanMin + rnd(fanRand)
      fanRand: Int = 3,
      robotsEvery: Int = 0 // >0: every Nth host serves /robots.txt (Disallow: /d2/)
  ) {
    val hostPages: Array[Int] =
      Array.tabulate(nHosts)(h => if (h == 0) skewFactor * pagesPerHost else pagesPerHost)
    val totalPages: Int = hostPages.sum
    val robotsHosts: Vector[Int] =
      if (robotsEvery <= 0) Vector.empty
      else (0 until nHosts).filter(_ % robotsEvery == 0).toVector
    val totalRows: Int = totalPages + robotsHosts.size
    private val cumulative: Array[Int] = hostPages.scanLeft(0)(_ + _)
    def hostOf(g: Int): (Int, Int) = { // (hostIdx, localIdx)
      var h = 0
      while (g >= cumulative(h + 1)) h += 1
      (h, g - cumulative(h))
    }
    def globalOf(h: Int, l: Int): Int = cumulative(h) + l
  }

  private val tldCycle = Vector("com", "net", "org", "dev", "io")
  private val langCycle = Vector("en", "de", "fr")
  private val words = Vector("crawl", "frontier", "spark", "shuffle", "page", "link",
    "host", "depth", "queue", "hash", "bloom", "budget", "robots", "seed", "graph",
    "fetch", "parse", "text", "data", "scale")

  // splitmix64 — deterministic per-index randomness
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rnd(spec: SiteSpec, i: Long, salt: Long, mod: Int): Int =
    if (mod <= 0) 0 else Math.floorMod(mix(mix(i ^ spec.seed) ^ salt), mod.toLong).toInt

  def hostName(spec: SiteSpec, h: Int): String = s"site$h.${tldCycle(h % tldCycle.size)}"
  def rootOf(spec: SiteSpec, h: Int): String = hostName(spec, h)

  def pathOf(l: Int): String = if (l == 0) "/" else s"/d${l % 3}/p$l"
  def pageUrl(spec: SiteSpec, h: Int, l: Int): String = s"http://${hostName(spec, h)}${pathOf(l)}"

  final case class PageRow(url: String, warcTsMs: Long, html: Array[Byte], text: String, lang: String)

  /** The raw hrefs embedded in page (h, l), in template slot order:
    * (aHrefs, linkHref, imgSrc, scriptSrc, iframeSrc). */
  def hrefsOf(spec: SiteSpec, h: Int, l: Int): (Vector[String], String, String, String, String) = {
    val g = spec.globalOf(h, l).toLong
    val k = spec.hostPages(h)
    val host = hostName(spec, h)
    def tgt(salt: Long): Int = rnd(spec, g, salt, k)
    val a = Vector.newBuilder[String]
    // fan-out: index pages link widely, leaf pages link 3-5
    val fan = if (l == 0) math.min(10, k) else spec.fanMin + rnd(spec, g, 7L, spec.fanRand)
    (0 until fan).foreach { j =>
      val t = if (l == 0) (j * math.max(1, k / math.max(1, fan))) % k else tgt(100L + j)
      val p = pathOf(t)
      rnd(spec, g, 200L + j, 6) match {
        case 0 => a += p // absolute path
        case 1 => a += s"http://$host$p" // absolute URL
        case 2 => a += s"http://www.$host$p" // www alias (same canon)
        case 3 if t != 0 => a += s"p$t".prependedAll(if (l == 0) "d" + (t % 3) + "/" else "../d" + (t % 3) + "/") // relative
        case 4 if p.length > 2 => a += p.substring(0, 2) + "%" + f"${p.charAt(2).toInt}%02X" + p.substring(3) // percent-encoded
        case _ => a += s"http://$host$p?ref=$l" // query variant (distinct canon, miss)
      }
    }
    // quirk links
    if (rnd(spec, g, 301L, 3) == 0) a += "#frag" + l.toString // fragment-only: dropped
    if (rnd(spec, g, 302L, 3) == 0) { val p = pathOf(tgt(303L)); a += p; a += p } // in-page duplicate
    if (rnd(spec, g, 304L, 4) == 0) a += s"http://othersite${rnd(spec, g, 305L, 5)}.net/x$l" // off-root: Q1 skip
    if (rnd(spec, g, 306L, 5) == 0) a += s"http://x.$host.evil.org/y$l" // Q1 substring-superset quirk: passes, 404s
    if (rnd(spec, g, 307L, 4) == 0) a += s"/missing/m$l" // valid, absent from pages → fetch error
    if (rnd(spec, g, 308L, 5) == 0) a += s"http://sub.$host${pathOf(tgt(309L))}" // subdomain: same root, absent → 404
    if (rnd(spec, g, 310L, 6) == 0) a += pageUrl(spec, h, 0) // back to this host's index (seed rediscovery)
    if (rnd(spec, g, 311L, 4) == 0) a += s"/files/doc$l.pdf" // bad extension → Q3 skip
    if (rnd(spec, g, 312L, 7) == 0) a += s"ftp://$host/ftp$l" // invalid scheme → dropped at parse
    if (rnd(spec, g, 313L, 8) == 0) a += s"http://site$h.invalidtld/z$l" // invalid TLD → dropped
    val linkHref = if (rnd(spec, g, 400L, 2) == 0) "/static/main.css" else pathOf(tgt(401L)) // link[href]: sometimes a real page
    val imgSrc = s"/images/img$l.png" // always bad-ext
    val scriptSrc = if (rnd(spec, g, 402L, 3) == 0) pathOf(tgt(403L)) else "/static/app.js"
    val iframeSrc = if (rnd(spec, g, 404L, 2) == 0) pageUrl(spec, h, tgt(405L)) else s"/embed/e$l"
    (a.result(), linkHref, imgSrc, scriptSrc, iframeSrc)
  }

  /** Build one page; html and text are assembled independently from the same
    * word choices (the extractText invariant is a real cross-check, not a
    * tautology). */
  def page(spec: SiteSpec, g: Int): PageRow = {
    val (h, l) = spec.hostOf(g)
    val url = pageUrl(spec, h, l)
    val (aHrefs, linkHref, imgSrc, scriptSrc, iframeSrc) = hrefsOf(spec, h, l)
    def w(salt: Long): String = words(rnd(spec, g.toLong, salt, words.size))
    val title = s"${w(1)} ${w(2)} $l"
    val h1 = s"${w(3)} ${hostName(spec, h)}"
    val para1 = (0 until 4 + rnd(spec, g.toLong, 4L, 5)).map(j => w(10L + j)).mkString(" ")
    val para2 = (0 until 3 + rnd(spec, g.toLong, 5L, 4)).map(j => w(30L + j)).mkString(" ")
    val anchors = aHrefs.zipWithIndex.map { case (href, j) => (href, s"${w(50L + j)}$j") }
    val html = new StringBuilder
    html.append("<html>\n<head>\n<title>").append(title).append("</title>\n")
    html.append("<link href=\"").append(linkHref).append("\" rel=\"stylesheet\">\n")
    html.append("<script src=\"").append(scriptSrc).append("\"></script>\n</head>\n<body>\n")
    html.append("<h1>").append(h1).append("</h1>\n<p>").append(para1).append("</p>\n")
    anchors.foreach { case (href, txt) =>
      html.append("<a href=\"").append(href).append("\">").append(txt).append("</a>\n")
    }
    html.append("<p>").append(para2).append("</p>\n")
    html.append("<img src=\"").append(imgSrc).append("\">\n")
    html.append("<iframe src=\"").append(iframeSrc).append("\"></iframe>\n")
    html.append("</body>\n</html>")
    // independent text assembly: document-order words, single-space joined
    val text = (Seq(title, h1, para1) ++ anchors.map(_._2) ++ Seq(para2)).mkString(" ")
    val ts = 1704067200000L + Math.floorMod(mix(g.toLong ^ spec.seed), 365L * 86400) * 1000L
    PageRow(url, ts, html.toString.getBytes("UTF-8"), text, langCycle(h % langCycle.size))
  }

  /** robots.txt row for host h (plain-text body; text = the whitespace-
    * collapsed body, satisfying the extractText invariant trivially). */
  def robotsPage(spec: SiteSpec, h: Int): PageRow = {
    val host = hostName(spec, h)
    val body = s"# robots for $host\nUser-agent: *\nDisallow: /d2/\n"
    val text = Html.extractText(body)
    val ts = 1704067200000L + (h.toLong * 1000L)
    PageRow(s"http://$host/robots.txt", ts, body.getBytes("UTF-8"), text, langCycle(h % langCycle.size))
  }

  /** Row for global index i over [0, totalRows): regular pages first, then
    * one robots.txt row per robots-serving host. */
  def rowAt(spec: SiteSpec, i: Int): PageRow =
    if (i < spec.totalPages) page(spec, i)
    else robotsPage(spec, spec.robotsHosts(i - spec.totalPages))

  def allPages(spec: SiteSpec): Vector[PageRow] =
    (0 until spec.totalRows).map(rowAt(spec, _)).toVector

  /** Pages keyed by canonical form — the Oracle's fetch table. */
  def oraclePages(spec: SiteSpec): Map[String, Oracle.Page] =
    allPages(spec).map { p =>
      val parsed = UrlFuncs.newUrl(p.url).fold(e => sys.error(s"fixture url invalid: ${p.url}: $e"), identity)
      parsed.canon -> Oracle.Page(p.url, p.html, p.text)
    }.toMap

  /** One resolved-candidate row per surviving link of every page: the
    * extract → resolve → validate UDF pipeline (pinned by the HtmlSpec /
    * UrlFuncs golden vectors) reified as DATA, so a full crawl superstep
    * minus the UDFs — fetch-join → explode → Q1/Q3 → first-occurrence →
    * anti-join → rank — can be expressed in pure ANSI SQL over it and
    * DuckDB-checked (SparkEntry q30). Columns:
    * (parent_canon, link_pos, url, canon, hash, host, root, path). */
  def linkManifest(spec: SiteSpec): Vector[(String, Int, String, String, String, String, String, String)] =
    allPages(spec).flatMap { p =>
      val parsed = UrlFuncs.newUrl(p.url)
        .fold(e => sys.error(s"fixture url invalid: ${p.url}: $e"), identity)
      Html.findLinksBytes(p.html, Schemas.defaultMaxBodySize).zipWithIndex.flatMap {
        case (href, pos) =>
          UrlFuncs.candidate(parsed.url, href).map(c =>
            (parsed.canon, pos, c.urlStr, c.canon, c.hash, c.host, c.root, c.url.path))
      }
    }

  /** Default seeds: host0 index via its www alias (www-strip at seed level) +
    * host1 index. */
  def seeds(spec: SiteSpec): Seq[String] = {
    val s0 = s"http://www.${hostName(spec, 0)}/"
    if (spec.nHosts > 1) Seq(s0, pageUrl(spec, 1, 0)) else Seq(s0)
  }

  /** One seed per host (benchmark mode: the whole synthetic web reachable). */
  def seedsAll(spec: SiteSpec): Seq[String] =
    (0 until spec.nHosts).map(h => pageUrl(spec, h, 0))

  val tiny: SiteSpec = SiteSpec(nHosts = 3, pagesPerHost = 16, skewFactor = 1)
  val small: SiteSpec = SiteSpec(nHosts = 40, pagesPerHost = 60, skewFactor = 41) // host0 ≈ 50%

  /** Distributed generation of the pages table: `page(spec, i)` is a pure
    * function of the index, so the same spec materializes bit-identically
    * whether built driver-side (tests) or via `spark.range` partition-mapped
    * (benchmarks at scale — generation itself is embarrassingly parallel). */
  def pagesDf(spark: org.apache.spark.sql.SparkSession, spec: SiteSpec): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(spec.totalRows.toLong)
      .mapPartitions(_.map { i =>
        val p = rowAt(spec, i.toInt)
        (p.url, new java.sql.Timestamp(p.warcTsMs), p.html, p.text, p.lang)
      })
      .toDF("url", "warc_ts", "html", "text", "lang")
  }
}

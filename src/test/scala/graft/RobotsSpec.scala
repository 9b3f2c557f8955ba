package graft

import graft.wbot._
import graft.wbot.Schemas._

class RobotsSpec extends SparkSuite {

  test("robots.txt parser: groups, comments, multiple agents, empty disallow") {
    val body =
      """# comment
        |User-agent: *
        |Disallow: /private/
        |Disallow: /tmp/
        |
        |User-agent: WBot
        |User-agent: OtherBot
        |Disallow: /wbot-only/
        |Allow: /wbot-only/except
        |
        |User-agent: FreeBot
        |Disallow:
        |Sitemap: http://a.com/sitemap.xml
        |""".stripMargin
    val rules = Robots.parse("a.com", body)
    assert(rules.toSet == Set(
      RobotsRule("a.com", "*", allow = false, "/private/"),
      RobotsRule("a.com", "*", allow = false, "/tmp/"),
      RobotsRule("a.com", "WBot", allow = false, "/wbot-only/"),
      RobotsRule("a.com", "WBot", allow = true, "/wbot-only/except"),
      RobotsRule("a.com", "OtherBot", allow = false, "/wbot-only/"),
      RobotsRule("a.com", "OtherBot", allow = true, "/wbot-only/except")))
    // enforcement semantics
    assert(!robotsAllowed(rules, "a.com", "/private/x", "AnyAgent/1.0"))
    assert(robotsAllowed(rules, "a.com", "/public/x", "AnyAgent/1.0"))
    assert(!robotsAllowed(rules, "a.com", "/wbot-only/x", "WBot/v0.2.0"))
    assert(robotsAllowed(rules, "b.com", "/private/x", "AnyAgent/1.0")) // other host
    // RFC 9309 Allow precedence: longer Allow overrides shorter Disallow
    assert(robotsAllowed(rules, "a.com", "/wbot-only/except/page", "WBot/v0.2.0"))
    // group selection: a named group REPLACES the * group for that agent
    assert(robotsAllowed(rules, "a.com", "/private/x", "WBot/v0.2.0"))
  }

  test("RFC 9309 precedence: longest match wins, Allow beats Disallow on ties") {
    val body =
      """User-agent: *
        |Disallow: /
        |Allow: /public/
        |Disallow: /public/private/
        |Allow: /fish*.php$
        |Disallow: /*.php
        |Allow: /tie/
        |Disallow: /tie/
        |""".stripMargin
    val rules = Robots.parse("a.com", body)
    // Allow: /public/ (len 8) beats Disallow: / (len 1)
    assert(robotsAllowed(rules, "a.com", "/public/x", "UA"))
    // Disallow: /public/private/ (len 16) beats Allow: /public/ (len 8)
    assert(!robotsAllowed(rules, "a.com", "/public/private/x", "UA"))
    // bare Disallow: / blocks everything else
    assert(!robotsAllowed(rules, "a.com", "/other", "UA"))
    // wildcard + anchor: /fish*.php$ (len 11) beats /*.php (len 6)
    assert(robotsAllowed(rules, "a.com", "/fishheads/catfish.php", "UA"))
    assert(!robotsAllowed(rules, "a.com", "/fish.php?q=1", "UA")) // $ does not match query tail
    assert(!robotsAllowed(rules, "a.com", "/cgi/script.php", "UA"))
    // equal length: Allow wins
    assert(robotsAllowed(rules, "a.com", "/tie/x", "UA"))
  }

  test("RFC 9309 group selection: most specific agent group applies alone") {
    val body =
      """User-agent: *
        |Disallow: /all/
        |User-agent: WBot
        |Disallow: /wbot/
        |User-agent: WBot/v0.2
        |Disallow: /specific/
        |""".stripMargin
    val rules = Robots.parse("a.com", body)
    // most specific named group (longest agent token the UA contains) wins
    assert(!robotsAllowed(rules, "a.com", "/specific/x", "WBot/v0.2.0"))
    assert(robotsAllowed(rules, "a.com", "/wbot/x", "WBot/v0.2.0")) // not merged
    assert(robotsAllowed(rules, "a.com", "/all/x", "WBot/v0.2.0")) // * ignored
    assert(!robotsAllowed(rules, "a.com", "/all/x", "SomeOther/1.0")) // * applies
  }

  test("robots rules bootstrap from the pages snapshot and gate the crawl") {
    val spec = Fixtures.SiteSpec(nHosts = 4, pagesPerHost = 12, robotsEvery = 2)
    val pages = SparkTestBase.pagesDf(spec)
    val rules = Robots.rulesFromPages(spark, pages)
    val expected = spec.robotsHosts.map(h =>
      RobotsRule(Fixtures.hostName(spec, h), "*", allow = false, "/d2/")).toSet
    assert(rules.toSet == expected)

    val cfg = CrawlConfig(maxDepth = 3, partitions = 4,
      robots = rules, robotsStandardMode = true)
    // engine ≡ oracle under the bootstrapped rules
    val oracle = Oracle.run(Fixtures.oraclePages(spec), Fixtures.seeds(spec), cfg)
    val run = SparkCrawler.run(spark, pages, Fixtures.seeds(spec), cfg)
    val engineOrder = run.order.orderBy("seq").select("seq", "canon", "depth").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toVector
    assert(engineOrder == oracle.order.map(c => (c.seq, c.canon, c.depth)))
    assert(run.metrics == oracle.metrics)

    // and the gate actually bites: no /d2/ page is ever crawled via a link
    // naming the robots-serving host EXACTLY (robots.txt is per exact host,
    // RFC 9309 — a www-alias is a different host with its own robots.txt)
    val crawled = run.order.select("url").collect().map(_.getString(0)).toSet
    val blockedHost = Fixtures.hostName(spec, 0)
    assert(!crawled.exists(u => u.startsWith(s"http://$blockedHost/d2/")),
      s"robots Disallow /d2/ violated for $blockedHost")
    // a non-robots host's /d2/ pages can still be crawled
    assert(run.metrics("skipped_link") > Oracle.run(Fixtures.oraclePages(spec),
      Fixtures.seeds(spec), cfg.copy(robots = Seq.empty)).metrics("skipped_link"))
  }

  test("rulesFromPages: prepared-snapshot overload ≡ raw path, and runWithRobots wires it") {
    val spec = Fixtures.SiteSpec(nHosts = 4, pagesPerHost = 12, robotsEvery = 2)
    val pages = SparkTestBase.pagesDf(spec)
    val raw = Robots.rulesFromPages(spark, pages)
    val prep = SparkCrawler.preparePages(pages, 4)
    try {
      // the zero-UDF-pass bootstrap over the cached prep yields the same table
      assert(Robots.rulesFromPages(spark, pages, Some(prep)).toSet == raw.toSet)
    } finally prep.unpersist()
    // runWithRobots = prep + bootstrap + standard-mode crawl, one snapshot pass
    val cfg = CrawlConfig(maxDepth = 2, partitions = 4)
    val run = SparkCrawler.runWithRobots(spark, pages, Fixtures.seeds(spec), cfg)
    val oracle = Oracle.run(Fixtures.oraclePages(spec), Fixtures.seeds(spec),
      cfg.copy(robots = raw, robotsStandardMode = true))
    assert(run.metrics == oracle.metrics)
  }

  test("rulesFromPages: ported authority keys rules by hostname-only") {
    val s = spark
    import s.implicits._
    val robotsBody = "User-agent: *\nDisallow: /d2/\n"
    val df = Seq(
      ("http://x.com:8080/", "<html></html>"),
      ("http://x.com:8080/robots.txt", robotsBody))
      .map { case (u, h) => (u, new java.sql.Timestamp(0L), h.getBytes("UTF-8"), "", "en") }
      .toDF("url", "warc_ts", "html", "text", "lang")
    assert(Robots.rulesFromPages(spark, df).toSet ==
      Set(RobotsRule("x.com", "*", allow = false, "/d2/")))
  }

  test("robots pages keep the extractText invariant") {
    val spec = Fixtures.SiteSpec(nHosts = 4, pagesPerHost = 6, robotsEvery = 2)
    Fixtures.allPages(spec).foreach { p =>
      assert(Html.extractTextBytes(p.html) == p.text, s"mismatch for ${p.url}")
    }
  }
}

package graft.wbot

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * robots.txt support. The reference carries a robots manager that is never
 * fed (`/root/reference/robot.go:32-41` — no caller of AddRobotsTxt, so the
 * gate is a no-op); the north rule wants real robots enforcement, so this
 * module supplies it:
 *
 *  - [[parse]]: a robots.txt parser (user-agent groups, Disallow/Allow
 *    lines with `*`/`$` patterns — what the reference's robotstxt dependency
 *    would enforce), per RFC 9309 grouping rules; precedence (longest match
 *    wins, Allow beats Disallow on ties) lives in `Schemas.robotsAllowed`.
 *  - [[rulesFromPages]]: bootstrap the robots table from the pages snapshot
 *    itself — fetch `http://<host>/robots.txt` for every host like a real
 *    crawler's robots prefetch, parse bodies distributedly, and collect the
 *    (small) host-keyed rule table for broadcast.
 */
object Robots {

  /** Parse one robots.txt body into (agent, allow?, prefix) rules for `host`.
    * Grouping per RFC 9309: consecutive User-agent lines open a group that
    * the following Allow/Disallow lines attach to; '#' starts a comment;
    * empty Disallow means allow-all (emits no rule). */
  def parse(host: String, body: String): Seq[Schemas.RobotsRule] = {
    val out = Vector.newBuilder[Schemas.RobotsRule]
    var agents: List[String] = Nil
    var inGroupBody = false
    body.linesIterator.foreach { raw =>
      val line = {
        val i = raw.indexOf('#')
        (if (i >= 0) raw.substring(0, i) else raw).trim
      }
      if (line.nonEmpty) {
        val sep = line.indexOf(':')
        if (sep > 0) {
          val key = line.substring(0, sep).trim.toLowerCase
          val value = line.substring(sep + 1).trim
          key match {
            case "user-agent" =>
              if (inGroupBody) { agents = Nil; inGroupBody = false } // new group
              agents = value :: agents
            case "disallow" =>
              inGroupBody = true
              if (value.nonEmpty) agents.foreach(a =>
                out += Schemas.RobotsRule(host, a, allow = false, value))
            case "allow" =>
              inGroupBody = true
              if (value.nonEmpty) agents.foreach(a =>
                out += Schemas.RobotsRule(host, a, allow = true, value))
            case _ => // crawl-delay, sitemap, unknown: ignored
          }
        }
      }
    }
    out.result()
  }

  /** Fetch + parse robots.txt for every host authority present in the pages
    * snapshot (one join against the snapshot, parse distributed, rules
    * collected — the table is hosts-sized, i.e. broadcast-small).
    *
    * Rule keys are PORT-STRIPPED hostnames (Go `URL.Hostname()` semantics):
    * the crawl gate compares the candidate's `hostnameOnly` against them
    * (matching `Oracle`'s `target.url.hostnameOnly` at `Oracle.scala`), so a
    * `site.com:8080` snapshot yields rules that gate `site.com[:anyport]`
    * candidates — RFC 9309 per-authority scoping reduced to the engine's
    * port-merged host identity. */
  def rulesFromPages(spark: SparkSession, pages: DataFrame): Seq[Schemas.RobotsRule] =
    rulesFromPages(spark, pages, None)

  /** As above, but when the caller already holds the [[SparkCrawler
    * .preparePages]] output (canon-keyed, cached), the robots-body side reads
    * its precomputed canon instead of re-running the URL canonicalizer over
    * the full snapshot — at 10^10 rows that second pass is the whole cost of
    * the bootstrap. The hosts dimension is a pure-column authority extraction
    * over the raw urls (a codegen'd regexp, no UDF pass): the robots-join key
    * is `wwwStrip(authority) + "/robots.txt"`, which IS the canonical form of
    * `http://<authority>/robots.txt` (scheme dropped, leading `www.` trimmed,
    * `/robots.txt` has nothing to percent-decode or slash-trim). */
  def rulesFromPages(spark: SparkSession, pages: DataFrame,
      pagesPrep: Option[DataFrame]): Seq[Schemas.RobotsRule] = {
    import spark.implicits._
    val parseRules = udf((host: String, body: Array[Byte]) =>
      if (body == null) Seq.empty[Schemas.RobotsRule]
      else parse(host, new String(body, "UTF-8")))
    // authority of each snapshot url (host[:port], userinfo-free fixture
    // grammar) — no URL parse, stays inside whole-stage codegen
    val hosts = pages
      .select(regexp_extract(col("url"), "^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]+)", 1).as("host"))
      .where(col("host") =!= "")
      .distinct()
      .withColumn("canon",
        concat(regexp_replace(col("host"), "^www\\.", ""), lit("/robots.txt")))
    val robotsPages = pagesPrep match {
      case Some(prep) => prep.select(col("canon"), col("html")) // cached, canon precomputed
      case None =>
        // duplicate-canon robots rows must resolve to the SAME winner the
        // prepared snapshot holds (latest warc_ts, max url on ties —
        // preparePages' max_by), not the union of every duplicate's rules;
        // carried as __ord and reduced after the hosts join (hosts-sized agg,
        // not a full-snapshot one)
        val ordCol =
          if (pages.columns.contains("warc_ts")) struct(col("warc_ts"), col("url"))
          else struct(col("url"))
        pages
          .withColumn("pcanon", exprs.UrlExprs.canonicalizeUrl(col("url")))
          .where(col("pcanon").isNotNull)
          .select(col("pcanon").as("canon"), col("html"), ordCol.as("__ord"))
    }
    val joined0 = hosts.join(robotsPages, Seq("canon"))
    val joined =
      if (joined0.columns.contains("__ord"))
        joined0.groupBy(col("canon"), col("host"))
          .agg(max_by(col("html"), col("__ord")).as("html"))
      else joined0
    joined
      .select(explode(parseRules(col("host"), col("html"))).as("r"))
      .select(col("r.host"), col("r.agent"), col("r.allow"), col("r.pattern"))
      .as[(String, String, Boolean, String)]
      .collect()
      // key by port-stripped hostname (driver-side — rules are already
      // collected); distinct: `x.com` and `x.com:8080` spellings collapse
      .map { case (h, a, al, p) => Schemas.RobotsRule(GoUrl.stripPort(h), a, al, p) }
      .distinct.toSeq
  }
}

package graft.wbot

import scala.collection.mutable
import Schemas._

/**
 * Sequential reference simulator — the executable spec for the Spark engine.
 *
 * Replays the reference crawl loop (`/root/reference/crawler.go:109-291`) at
 * `WithParallel(1)` (the only configuration where the reference's observable
 * ordering is deterministic): FIFO queue (`queue.go:37-49`), test-and-set
 * seen store (`store/in_memory.go:22-33`), exact predicate order
 * (`crawler.go:249-288`), depth semantics (`crawler.go:223-225,242-246`),
 * and the 7 metrics counters (`metrics/metrics.go:45-55`).
 *
 * "Fetch" is the sandbox model shared with the Spark engine: a lookup of the
 * canonical URL in the pages table (hit → 200 + body, miss → fetch error →
 * failed request, no expansion — like an unreachable host at
 * `crawler.go:230-234`).
 */
object Oracle {

  /** One page of the synthetic web. */
  final case class Page(url: String, html: Array[Byte], text: String)

  final case class Crawled(seq: Long, url: String, canon: String, hash: String,
      depth: Int, status: Int, ua: String, proxy: String)

  final case class Result(
      order: Vector[Crawled], // stream order == FIFO fetch order (successful fetches)
      attempts: Vector[(Long, String, Int, Boolean)], // (seq, canon, depth, hit) all pops
      seen: Set[String], // final URL-seen set (sha256 hex)
      metrics: Map[String, Long],
      frontierSizes: Vector[Int] // frontier size per depth (for engine cross-check)
  )

  private final case class Req(parsed: UrlFuncs.Parsed, depth: Int, ua: String,
      proxy: String, seq: Long)

  /** Run the sequential crawl. Invalid seeds abort (crawler.go:124-130). */
  def run(pages: Map[String, Page], seeds: Seq[String], cfg: CrawlConfig): Result = {
    // --- seed parse + fail-fast validation (crawler.go:115-130)
    val parsedSeeds = seeds.map(s => s -> UrlFuncs.newUrl(s))
    val errs = parsedSeeds.collect { case (s, Left(e)) => s"$s: $e" }
    if (errs.nonEmpty) throw new IllegalArgumentException(s"invalid links: ${errs.mkString("; ")}")
    val targets = parsedSeeds.collect { case (_, Right(p)) => p }
    if (targets.isEmpty) throw new IllegalArgumentException("no valid links")

    val queue = mutable.Queue.empty[Req]
    val seen = mutable.HashSet.empty[String]
    val m = mutable.Map(
      "total_requests" -> 0L, "successful_requests" -> 0L, "failed_requests" -> 0L,
      "total_link" -> 0L, "crawled_link" -> 0L, "skipped_link" -> 0L,
      "duplicated_link" -> 0L)

    var seqCounter = 0L
    // seeds enqueued in argument order at depth 0; UA round-robin per seed
    // (crawler.go:132-134,173-194); the seen store is NOT touched (Q4a quirk).
    targets.zipWithIndex.foreach { case (t, i) =>
      queue.enqueue(Req(t, 0, cfg.uaFor(i), cfg.proxyFor(i), seqCounter)); seqCounter += 1
    }

    val order = Vector.newBuilder[Crawled]
    val attempts = Vector.newBuilder[(Long, String, Int, Boolean)]
    val frontierSizes = mutable.ArrayBuffer.empty[Int]
    var currentDepth = -1
    var depthCount = 0

    while (queue.nonEmpty) {
      val req = queue.dequeue()
      if (req.depth != currentDepth) {
        if (currentDepth >= 0) frontierSizes += depthCount
        currentDepth = req.depth; depthCount = 0
      }
      depthCount += 1
      m("total_requests") += 1
      // depth > maxDepth-1 → status stopped (crawler.go:223-225); sequentially
      // this only means "drain without refilling", which the loop below does
      // naturally since expansion is blocked by nextDepth > maxDepth.
      pages.get(req.parsed.canon) match {
        case None =>
          m("failed_requests") += 1
          attempts += ((req.seq, req.parsed.canon, req.depth, false))
        case Some(page) =>
          m("successful_requests") += 1
          attempts += ((req.seq, req.parsed.canon, req.depth, true))
          order += Crawled(req.seq, req.parsed.urlStr, req.parsed.canon,
            req.parsed.hash, req.depth, 200, req.ua, req.proxy)
          val nextDepth = req.depth + 1
          if (nextDepth <= cfg.maxDepth) {
            // body truncation BEFORE link extraction (http_client.go:117-123)
            val links = Html.findLinksBytes(page.html, cfg.maxBodySize)
            // resolve + validate, silently dropping failures (http_client.go:125-136)
            val candidates = links.flatMap(h => UrlFuncs.candidate(req.parsed.url, h))
            candidates.foreach { target =>
              m("total_link") += 1
              // Q1 substring same-root (crawler.go:252-255)
              if (!target.host.contains(req.parsed.root)) m("skipped_link") += 1
              // Q2 robots gate. Reference mode: the robots map is never
              // populated (no caller of AddRobotsTxt), checked against the
              // PARENT url (crawler.go:257-261, robot.go:35-38) → always
              // allowed. Standard mode: real host-keyed prefix rules against
              // the candidate.
              else if (cfg.robotsStandardMode &&
                !robotsAllowed(cfg.robots, target.url.hostnameOnly, target.url.path, req.ua))
                m("skipped_link") += 1
              // Q3 extension + rule filter (filter.go:30-57)
              else if (!filterAllow(cfg.filterRules, target.root, target.url.path, target.urlStr))
                m("skipped_link") += 1
              // Q4 test-and-set dedup (in_memory.go:22-33)
              else if (!seen.add(target.hash)) m("duplicated_link") += 1
              else {
                queue.enqueue(Req(target, nextDepth, req.ua, req.proxy, seqCounter))
                seqCounter += 1
                m("crawled_link") += 1
              }
            }
          }
      }
    }
    if (currentDepth >= 0) frontierSizes += depthCount
    Result(order.result(), attempts.result(), seen.toSet, m.toMap, frontierSizes.toVector)
  }
}

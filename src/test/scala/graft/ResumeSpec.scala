package graft

import graft.wbot._
import graft.wbot.Schemas._
import java.nio.file.Files

/** §5.2.5: kill after superstep k, resume from the snapshot tables, final
  * (order, seen, metrics) identical to the uninterrupted run. */
class ResumeSpec extends SparkSuite {

  test("resume after interrupted superstep reproduces the uninterrupted run") {
    val spec = Fixtures.tiny
    val seeds = Fixtures.seeds(spec)
    val dir = Files.createTempDirectory("wbot_ckpt").toString
    val cfgFull = CrawlConfig(maxDepth = 3, partitions = 4, checkpointDir = Some(dir))

    val pages = SparkTestBase.pagesDf(spec)
    val pagesPrep = SparkCrawler.preparePages(pages, 4)

    // "crash" after 2 supersteps
    SparkCrawler.runPrepared(spark, pagesPrep, seeds, cfgFull.copy(maxSupersteps = 2))
    // resume to completion from the committed snapshot
    val resumed = SparkCrawler.resumePrepared(spark, pagesPrep, cfgFull)

    // ground truth: oracle
    val oracle = Oracle.run(Fixtures.oraclePages(spec), seeds, cfgFull)
    val order = resumed.order.orderBy("seq")
      .select("seq", "url", "canon", "hash", "depth").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4))).toVector
    assert(order == oracle.order.map(c => (c.seq, c.url, c.canon, c.hash, c.depth)))
    assert(resumed.seen.select("hash").collect().map(_.getString(0)).toSet == oracle.seen)
    assert(resumed.metrics == oracle.metrics)
    pagesPrep.unpersist()
  }
}

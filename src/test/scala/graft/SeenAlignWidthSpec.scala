package graft

import graft.wbot._
import graft.wbot.Schemas._
import java.nio.file.Files

/** The seen-delta alignment width (`CrawlConfig.seenAlignPartitions`) is a
  * pure performance knob: results — crawl order, seen set, metrics — must be
  * byte-identical at any width, and a resume must stay correct when the
  * resuming session asks for a DIFFERENT width than the one the snapshot was
  * committed at (the bucketed layout then degrades to plain leaves plus one
  * O(residue) re-shuffle, never to wrong answers). */
class SeenAlignWidthSpec extends SparkSuite {

  private def runAt(width: Option[Int], bound: Long): SparkCrawler.CrawlRun = {
    val spec = Fixtures.tiny
    val pages = SparkTestBase.pagesDf(spec)
    val pagesPrep = SparkCrawler.preparePages(pages, 4)
    val run = SparkCrawler.runPrepared(spark, pagesPrep, Fixtures.seeds(spec),
      CrawlConfig(maxDepth = 3, partitions = 4, smallSeenBound = bound,
        seenAlignPartitions = width))
    pagesPrep.unpersist()
    run
  }

  private def orderKey(r: SparkCrawler.CrawlRun): Vector[(Long, String, String, Int)] =
    r.order.orderBy("seq").select("seq", "url", "hash", "depth").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getInt(3))).toVector

  test("crawl results are invariant across alignment widths (1, 4, 16)") {
    // bound = 0 forces the aligned path from the first expansion, so every
    // width actually exercises alignDelta/alignedUnion at that width
    val base = runAt(None, 0L)
    val k0 = orderKey(base)
    val s0 = base.seen.select("hash").collect().map(_.getString(0)).toSet
    for (w <- Seq(1, 4, 16)) {
      val r = runAt(Some(w), 0L)
      assert(orderKey(r) == k0, s"order diverged at width $w")
      assert(r.seen.select("hash").collect().map(_.getString(0)).toSet == s0,
        s"seen set diverged at width $w")
      assert(r.metrics == base.metrics, s"metrics diverged at width $w")
    }
  }

  test("resume at a different width than the committed snapshot stays exact") {
    val spec = Fixtures.tiny
    val seeds = Fixtures.seeds(spec)
    val dir = Files.createTempDirectory("wbot_ckpt_width").toString
    val pages = SparkTestBase.pagesDf(spec)
    val pagesPrep = SparkCrawler.preparePages(pages, 4)
    // commit bucketed at width 4 (bound 0 → aligned commits from step 0)...
    val cfg4 = CrawlConfig(maxDepth = 3, partitions = 4, smallSeenBound = 0L,
      checkpointDir = Some(dir), seenAlignPartitions = Some(4))
    SparkCrawler.runPrepared(spark, pagesPrep, seeds, cfg4.copy(maxSupersteps = 2))
    // ...resume asking for width 16: on-disk aligned_p=4 mismatches, deltas
    // reload as plain leaves (aligned=false) and re-align once — correctness
    // must be untouched
    val st = new Storage(dir)
    val snap = st.readManifest().get
    val mism = st.readSeenDeltas(spark, snap.lastStep, snap.seenBaseStep, 16, 160L)
    assert(mism.nonEmpty && mism.forall(!_.aligned),
      "width-mismatched deltas must reload unaligned (plain leaves)")
    val resumed = SparkCrawler.resumePrepared(spark, pagesPrep,
      cfg4.copy(seenAlignPartitions = Some(16)))
    val oracle = Oracle.run(Fixtures.oraclePages(spec), seeds, cfg4)
    val order = resumed.order.orderBy("seq")
      .select("seq", "url", "canon", "hash", "depth").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4))).toVector
    assert(order == oracle.order.map(c => (c.seq, c.url, c.canon, c.hash, c.depth)))
    assert(resumed.seen.count() == oracle.seen.size)
    assert(resumed.seen.select("hash").collect().map(_.getString(0)).toSet == oracle.seen)
    assert(resumed.metrics == oracle.metrics)
    pagesPrep.unpersist()
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.wbot._
import graft.wbot.Schemas._
import java.nio.file.Files

/** The streaming skin must produce exactly the batch engine's output: seeds
  * arriving as a stream → same crawl order + seen set as a direct run. */
class StreamingCrawlSpec extends SparkSuite {

  test("seed stream via foreachBatch reproduces the batch crawl") {
    val sp = spark
    import sp.implicits._
    val spec = Fixtures.tiny
    val cfg = CrawlConfig(maxDepth = 2, partitions = 4)
    val pagesPrep = SparkCrawler.preparePages(SparkTestBase.pagesDf(spec), 4)

    val out = Files.createTempDirectory("wbot_stream_out").toString
    val ckpt = Files.createTempDirectory("wbot_stream_ckpt").toString
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[String]
    mem.addData(Fixtures.seeds(spec): _*)
    val q = StreamingCrawl.start(sp, mem.toDF(), pagesPrep, cfg, out, ckpt)
    q.awaitTermination(120000)

    val streamed = sp.read.parquet(s"$out/crawled").orderBy("seq")
      .select("seq", "canon", "depth").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toVector
    val direct = SparkCrawler.runPrepared(sp, pagesPrep, Fixtures.seeds(spec), cfg)
      .order.orderBy("seq").select("seq", "canon", "depth").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toVector
    assert(streamed == direct)

    val streamedSeen = sp.read.parquet(s"$out/seen").select("hash")
      .collect().map(_.getString(0)).toSet
    val oracleSeen = Oracle.run(Fixtures.oraclePages(spec), Fixtures.seeds(spec), cfg).seen
    assert(streamedSeen == oracleSeen)
    pagesPrep.unpersist()
  }
}

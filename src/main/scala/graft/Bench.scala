package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query (forced to full
  * execution via the noop sink — `count()` would let Catalyst prune the
  * computed columns away) plus the end-to-end crawl throughput, as ONE JSON
  * line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", sys.env.getOrElse("SPARK_GRAFT_OFFHEAP", "8g"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JIT + codegen + parquet footer caches (uncounted; same
    // methodology as CrawlBench's untimed warm-up crawl — the queries measure
    // steady-state engine cost, not first-call JIT)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      val warmSpec = graft.wbot.Fixtures.SiteSpec(nHosts = 2, pagesPerHost = 6)
      val warmPrep = graft.wbot.SparkCrawler.preparePages(
        graft.wbot.Fixtures.pagesDf(spark, warmSpec), 4)
      graft.wbot.SparkCrawler.runPrepared(spark, warmPrep,
        graft.wbot.Fixtures.seeds(warmSpec),
        graft.wbot.Schemas.CrawlConfig(maxDepth = 2, partitions = 4))
      warmPrep.unpersist()
    } catch { case _: Throwable => }

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { force(fn(spark, sfDir)); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // crawl throughput at this parallelism (matches CrawlBench methodology)
    val crawlRate = try {
      val spec = graft.wbot.Fixtures.SiteSpec(nHosts = 100, pagesPerHost = 1000,
        fanMin = 12, fanRand = 4)
      val pages = graft.wbot.Fixtures.pagesDf(spark, spec)
      val cfg = graft.wbot.Schemas.CrawlConfig(maxDepth = 4, partitions = cpus.toInt,
        recordStreams = false, bloomMinSeen = 500000L)
      val prep = graft.wbot.SparkCrawler.preparePages(pages, cpus.toInt)
      prep.count()
      val t0 = System.nanoTime()
      val run = graft.wbot.SparkCrawler.runPrepared(spark, prep, graft.wbot.Fixtures.seedsAll(spec),
        cfg, saltedPoliteness = true)
      run.metrics("total_requests") / ((System.nanoTime() - t0) / 1e9)
    } catch { case e: Throwable => System.err.println(s"[bench] crawl: ${e.getMessage}"); -1.0 }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl_urls_per_sec":$crawlRate,"cpus":$cpus}""")
    spark.stop()
  }
}

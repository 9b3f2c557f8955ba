package graft.wbot

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Two-parallelism scaling bench — the sandbox substitute for the N → 4N
 * executor criterion (BASELINE.md): the identical crawl (same generated
 * input, same seeds, same politeness budget) at `local[8]` and `local[32]`
 * with `spark.sql.shuffle.partitions` matched to cores; reports URLs/s and
 * per-superstep wall-time at both plus scaling efficiency
 * (R_32 / R_8) / 4, written to BENCH/BASELINE.md.
 *
 *   sbt "runMain graft.wbot.CrawlBench [nHosts] [pagesPerHost] [skew] [maxDepth] [levels]"
 */
object CrawlBench {

  final case class LevelResult(cores: Int, wallSec: Double, urls: Long, urlsPerSec: Double,
      steps: Vector[SparkCrawler.StepStat], metrics: Map[String, Long])

  def runAt(cores: Int, spec: Fixtures.SiteSpec, maxDepth: Int): LevelResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"wbot-crawl-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // JIT / codegen warm-up: a small untimed crawl in the same session
      val warmSpec = Fixtures.SiteSpec(nHosts = 4, pagesPerHost = 20)
      val warmPrep = SparkCrawler.preparePages(Fixtures.pagesDf(spark, warmSpec), cores)
      SparkCrawler.runPrepared(spark, warmPrep, Fixtures.seeds(warmSpec),
        Schemas.CrawlConfig(maxDepth = 3, partitions = cores, recordStreams = false))
      warmPrep.unpersist()

      val pages = Fixtures.pagesDf(spark, spec)
      val cfg = Schemas.CrawlConfig(maxDepth = maxDepth, partitions = cores,
        recordStreams = false)
      val pagesPrep = SparkCrawler.preparePages(pages, cores)
      pagesPrep.count() // materialize input outside the timed section
      val t0 = System.nanoTime()
      val run = SparkCrawler.runPrepared(spark, pagesPrep, Fixtures.seedsAll(spec), cfg,
        saltedPoliteness = true)
      val wall = (System.nanoTime() - t0) / 1e9
      val urls = run.metrics("total_requests")
      LevelResult(cores, wall, urls, urls / wall, run.steps, run.metrics)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nHosts = args.lift(0).map(_.toInt).getOrElse(40)
    val pph = args.lift(1).map(_.toInt).getOrElse(60)
    val skew = args.lift(2).map(_.toInt).getOrElse(41)
    val maxDepth = args.lift(3).map(_.toInt).getOrElse(6)
    val levels = args.lift(4).getOrElse(sys.env.getOrElse("SPARK_GRAFT_BENCH_LEVELS", "8,32"))
      .split(",").map(_.trim.toInt).toVector
    val fanMin = args.lift(5).map(_.toInt).getOrElse(8)
    val fanRand = args.lift(6).map(_.toInt).getOrElse(4)
    val spec = Fixtures.SiteSpec(nHosts = nHosts, pagesPerHost = pph, skewFactor = skew,
      fanMin = fanMin, fanRand = fanRand)
    println(s"[crawl-bench] pages=${spec.totalPages} hosts=$nHosts skew=$skew maxDepth=$maxDepth levels=$levels")

    val results = levels.map { c =>
      val r = runAt(c, spec, maxDepth)
      println(f"[crawl-bench] local[$c%d]: wall=${r.wallSec}%.1fs urls=${r.urls} rate=${r.urlsPerSec}%.1f urls/s")
      r.steps.foreach(s => println(
        f"  depth=${s.depth} frontier=${s.frontierSize} fetched=${s.fetched} cand=${s.candidates} fresh=${s.fresh} intervals=${s.intervals} wall=${s.wallMs}ms"))
      r
    }

    if (results.size >= 2) {
      val lo = results.head; val hi = results.last
      val ratio = hi.cores.toDouble / lo.cores
      val eff = (hi.urlsPerSec / lo.urlsPerSec) / ratio
      println(f"[crawl-bench] scaling efficiency local[${lo.cores}]→local[${hi.cores}]: $eff%.3f (target ≥ 0.8)")
      writeReport(spec, maxDepth, results, eff)
    }
    val json = results.map(r =>
      s""""local_${r.cores}":{"wall_sec":${r.wallSec},"urls":${r.urls},"urls_per_sec":${r.urlsPerSec},"steps":[${
        r.steps.map(s => s"""{"depth":${s.depth},"frontier":${s.frontierSize},"wall_ms":${s.wallMs}}""").mkString(",")}]}""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"crawl_scaling","levels":$json}""")
  }

  private def writeReport(spec: Fixtures.SiteSpec, maxDepth: Int,
      results: Vector[LevelResult], eff: Double): Unit = {
    Files.createDirectories(Paths.get("BENCH"))
    val sb = new StringBuilder
    sb.append("# BENCH/BASELINE — crawl throughput + scaling evidence\n\n")
    sb.append(s"Input: synthetic Common-Crawl-style pages table, ${spec.totalPages} pages, ")
    sb.append(s"${spec.nHosts} hosts (host 0 skewed ×${spec.skewFactor}), maxDepth=$maxDepth, ")
    sb.append("default politeness budget 10/host/interval (limiter.go:12-14 semantics), salted skew handling on.\n\n")
    sb.append("Same job, same input, two parallelism levels (the sandbox substitute for N vs 4N executors —\n")
    sb.append("on a real cluster the identical code path runs via\n")
    sb.append("`spark-submit --master yarn --num-executors N --conf spark.sql.shuffle.partitions=<4N·cores>`).\n\n")
    sb.append("| level | wall (s) | URLs fetched | URLs/s |\n|---|---|---|---|\n")
    results.foreach(r => sb.append(
      f"| local[${r.cores}] | ${r.wallSec}%.1f | ${r.urls} | ${r.urlsPerSec}%.1f |\n"))
    sb.append(f"\n**Scaling efficiency (R_${results.last.cores} / R_${results.head.cores}) / ${results.last.cores / results.head.cores} = $eff%.3f** (target ≥ 0.8)\n\n")
    sb.append("Per-superstep frontier-expansion wall-times (ms):\n\n")
    sb.append("| depth | frontier | " + results.map(r => s"local[${r.cores}]").mkString(" | ") + " |\n")
    sb.append("|---|---|" + results.map(_ => "---").mkString("|") + "|\n")
    val byDepth = results.head.steps.indices
    byDepth.foreach { i =>
      val d = results.head.steps(i)
      sb.append(s"| ${d.depth} | ${d.frontierSize} | " +
        results.map(r => r.steps.lift(i).map(_.wallMs.toString).getOrElse("-")).mkString(" | ") + " |\n")
    }
    sb.append("\nMetrics (reference counters) at the last level: " +
      results.last.metrics.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ") + "\n")
    Files.writeString(Paths.get("BENCH/BASELINE.md"), sb.toString)
    println("[crawl-bench] wrote BENCH/BASELINE.md")
  }
}

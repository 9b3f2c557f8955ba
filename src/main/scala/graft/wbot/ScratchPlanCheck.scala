package graft.wbot

import org.apache.spark.sql.SparkSession

/** Dev-only probe (not part of the library surface). */
object ScratchPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "2g")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val p = qe.executedPlan.toString
        if (p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop")) {
          // record one line per join shape: join type + build side + first line of build subtree
          "BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], ([A-Za-z]+), (Build[A-Za-z]+)".r
            .findAllMatchIn(p).foreach { m0 =>
              seen.merge(s"${m0.group(1)} ${m0.group(2)}", 1, (a, b) => a + b)
            }
        }
      }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    val spec = Fixtures.SiteSpec(nHosts = 200, pagesPerHost = 2000, fanMin = 12, fanRand = 4)
    val prep = SparkCrawler.preparePages(Fixtures.pagesDf(spark, spec), 16)
    prep.count()
    val t0 = System.nanoTime()
    val run = SparkCrawler.runPrepared(spark, prep, Fixtures.seedsAll(spec),
      Schemas.CrawlConfig(maxDepth = 4, partitions = 16, recordStreams = false, bloomMinSeen = 500000L),
      saltedPoliteness = true)
    println(s"[scratch] wall=${(System.nanoTime()-t0)/1e9}s reqs=${run.metrics("total_requests")} steps=${run.steps.map(s => s"d${s.depth}:${s.frontierSize}:${s.wallMs}ms").mkString(",")}")
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq.sortBy(-_._2).foreach { case (k, n) => println(s"[scratch] bhj: $k x$n") }
    spark.stop()
  }
}

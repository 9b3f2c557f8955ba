package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-volume evidence for the partitioned connected-components path: a
  * ~10^7-edge graph of millions of tiny components (the LSH-dominant shape)
  * plus ONE long chain (the adversarial diameter case). Records wall time,
  * per-round change counts (set SPARK_GRAFT_CC_LOG=1 to see them), peak
  * cached storage (sampled), and verifies the labeling: every chain node
  * must reach cluster 0 and exactly one representative per component must
  * be kept. The graph is far above `spark.graft.cc.smallGraphEdges`, so this
  * exercises the delta-frontier + adaptive-jump big path, not the
  * single-task fast path. Usage:
  *   SPARK_GRAFT_CC_LOG=1 sbt "runMain graft.ops.CcScaleBench [tinyPairs chainLen]" */
object CcScaleBench {
  def main(args: Array[String]): Unit = {
    val tinyPairs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val chainLen = args.drop(1).headOption.map(_.toLong).getOrElse(4096L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // chain 0-1-2-...-(chainLen-1), then disjoint pairs (2i+B, 2i+1+B)
    val chain = spark.range(chainLen - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val base = chainLen
    val tiny = spark.range(tinyPairs)
      .select((col("id") * 2 + base).as("id_a"), (col("id") * 2 + 1 + base).as("id_b"))
    val pairs = chain.unionByName(tiny)

    @volatile var running = true
    @volatile var peakBytes = 0L
    val sampler = new Thread(() => while (running) {
      val s = spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
      if (s > peakBytes) peakBytes = s
      Thread.sleep(100)
    }, "cc-storage-sampler")
    sampler.setDaemon(true); sampler.start()

    val t0 = System.nanoTime()
    val out = Dedup.nearDupClusters(pairs, maxIter = 100)
    val (nRows, nKeep) = {
      val r = out.agg(count(lit(1)), sum(col("keep"))).first()
      (r.getLong(0), r.getLong(1))
    }
    val badChain = out.where(col("id") < chainLen && col("cluster_id") =!= 0L).count()
    val wall = (System.nanoTime() - t0) / 1e9
    running = false

    val edges = 2L * (chainLen - 1 + tinyPairs)
    val expectRows = chainLen + 2L * tinyPairs
    val expectKeep = 1L + tinyPairs
    println(f"[cc-scale] edges=$edges rows=$nRows (expect $expectRows) " +
      f"keep=$nKeep (expect $expectKeep) badChain=$badChain " +
      f"wall=$wall%.1fs peakCachedMB=${peakBytes / 1024 / 1024}")
    require(nRows == expectRows && nKeep == expectKeep && badChain == 0L,
      "clustering incorrect at volume")
    spark.stop()
  }
}

package graft.wbot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Seen-set scale bench: measures the Q4b dedup path — Bloom-segment
 * pre-filter + exact anti-join — against a large synthetic seen set, i.e.
 * the component that carries the 10^10-URL design (the reference's in-memory
 * map caps at ~10^8, `store/in_memory.go:10-15`).
 *
 *   sbt "runMain graft.wbot.SeenScaleBench [seenRows] [candRows] [dupFrac%] [partitions]"
 *
 * Prints wall-times for (a) exact anti-join only, (b) Bloom prefilter +
 * anti-join on survivors, plus the prefilter's kill rate — the evidence that
 * the segments pay for themselves once the seen set dwarfs the candidates.
 */
object SeenScaleBench {
  def main(args: Array[String]): Unit = {
    val seenRows = args.lift(0).map(_.toLong).getOrElse(100000000L) // 1e8
    val candRows = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val dupPct = args.lift(2).map(_.toInt).getOrElse(30)
    val p = args.lift(3).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("wbot-seen-scale")
      .config("spark.sql.shuffle.partitions", (2 * cpus.toInt).toString)
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic seen set: hash identity of urls u0..uN (the sha256 hex is the
    // exact key, xxhash64 the partition/Bloom key — same layout as the engine)
    def urls(n: Long, offset: Long) =
      spark.range(n).select((col("id") + offset).as("uid"))
        .select(concat(lit("url-"), col("uid")).as("u"))
        .select(sha2(col("u"), 256).as("hash"), xxhash64(col("u")).as("hash64"))

    val seen = urls(seenRows, 0L)
      .repartition(p, col("hash64"))
      .persist(org.apache.spark.storage.StorageLevel.OFF_HEAP)
    println(s"[seen-scale] building seen set: ${seen.count()} rows, P=$p")

    // candidates: dupPct% point into the seen id space, rest are fresh
    val cands = spark.range(candRows).select(
      when(pmod(col("id"), lit(100)) < dupPct,
        concat(lit("url-"), pmod(col("id") * 2654435761L, lit(seenRows))))
        .otherwise(concat(lit("new-"), col("id"))).as("u"))
      .select(sha2(col("u"), 256).as("hash"), xxhash64(col("u")).as("hash64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    println(s"[seen-scale] candidates: ${cands.count()} rows (~$dupPct% dups)")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[seen-scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // (a) exact anti-join only
    val freshExact = timed("exact anti-join only") {
      cands.join(seen.select("hash"), Seq("hash"), "left_anti").count()
    }

    // (b)/(c) Bloom segments through the distributed SegmentStore — build
    // (one-time, amortized over the whole crawl), then the per-superstep
    // prefilter + anti-join on survivors under BOTH distribution strategies:
    // transient broadcast (sandbox scale) and pid-co-partitioned hash join
    // (the 10^10 path where broadcasting every segment everywhere would cost
    // ~12 GB per executor).
    val numBytes = BloomSeen.bytesFor(seenRows / p, 10)
    def runMode(label: String, broadcastMax: Long): Long = {
      val store = new BloomSeen.SegmentStore(spark, p, numBytes, broadcastMax)
      timed(s"bloom build ($p segments, 10 bits/key) [$label]") {
        store.update(seen.select("hash64"))
      }
      val (fresh, killRate) = timed(s"bloom prefilter + anti-join on survivors [$label]") {
        // cogroup mode: materialize the probe once — both legs scan it (the
        // crawl loop does the same, SparkCrawler cogroup branch)
        val marked0 = store.withMight(cands, col("hash64"))
        val marked = if (store.usesCogroup) marked0.localCheckpoint(true) else marked0
        val sure = marked.where(!col("__might")).drop("__might")
        val suspect = marked.where(col("__might")).drop("__might")
          .join(seen.select("hash"), Seq("hash"), "left_anti")
        val sureN = sure.count()
        val f = sureN + suspect.count()
        (f, sureN.toDouble / math.max(1, candRows - candRows * dupPct / 100))
      }
      println(f"[seen-scale] [$label] fresh=$fresh; prefilter killed " +
        f"${killRate * 100}%.1f%% of the anti-join's non-dup input")
      fresh
    }
    val freshBcast = runMode("broadcast", Long.MaxValue)
    val freshJoin = runMode("pid-join", 0L)
    require(freshExact == freshBcast && freshExact == freshJoin,
      s"bloom changed results: exact=$freshExact bcast=$freshBcast join=$freshJoin")
    println(s"[seen-scale] fresh=$freshExact identical on all three paths; " +
      s"segment bytes/seg=$numBytes, total bloom footprint: " +
      s"${p.toLong * numBytes / 1024 / 1024} MB (10^10 keys at 10 bits/key → " +
      s"~12 GB split into P per-task-joinable segments)")
    spark.stop()
  }
}

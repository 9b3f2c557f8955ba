package graft.wbot

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable deterministic global ranking — reifies the reference's FIFO queue
 * order (`/root/reference/pkg/services/queue/queue.go:37-49`) as an explicit
 * `seq` column WITHOUT a single-partition window (which would serialize the
 * whole frontier through one task at 10^10 scale).
 *
 * Pattern: range-partition by the sort keys, rank within partitions, then add
 * per-partition offsets (the tiny per-partition counts are the only thing
 * that crosses the driver). Wall-clock cost is one range shuffle + one narrow
 * window per call; every stage is fully parallel.
 */
object Ranks {

  /**
   * Adds `outCol` = 1-based dense global row number of `df` ordered by `keys`
   * (which must be unique per row). Scales: no global single-partition window.
   */
  def globalRank(df: DataFrame, keys: Seq[Column], outCol: String, numPartitions: Int): DataFrame =
    globalRankWithCount(df, keys, outCol, numPartitions).df

  /** Ranked output plus the total row count (free from the offset pass) and
    * the internal range-partitioned cache handle so callers can unpersist it
    * once downstream results are materialized. */
  final case class RankResult(df: DataFrame, total: Long, cached: DataFrame)

  /** As [[globalRank]], but also returns the total row count — already known
    * from the per-partition offsets, so callers that need `count()` anyway
    * (the crawl loop's fresh-frontier size) save one action. */
  def globalRankWithCount(df: DataFrame, keys: Seq[Column], outCol: String,
      numPartitions: Int): RankResult = {
    // cache the INPUT: repartitionByRange adds a sampling pass, which would
    // otherwise recompute the (typically expensive) upstream chain twice.
    // Off-heap when available: these are bulk row caches, not driver state.
    val offHeap = org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.memory.offHeap.enabled").contains("true")
    val in = df.persist(
      if (offHeap) org.apache.spark.storage.StorageLevel.OFF_HEAP
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val ranged = in.repartitionByRange(math.max(1, numPartitions), keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts → cumulative offsets (≤ numPartitions rows cross
    // the driver — the only non-distributed state)
    val counts = ranged.groupBy(col("__pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var total = 0L
    val offsets: Map[Int, Long] =
      counts.map { case (pid, c) => val o = (pid, total); total += c; o }.toMap
    in.unpersist() // ranged is materialized by the counts action above
    // literal-map lookup (≤ numPartitions entries): stays inside whole-stage
    // codegen, unlike a per-row Scala UDF
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val out = ranged
      .withColumn(outCol, row_number().over(w).cast("long") + offsetExpr)
      .drop("__pid")
    RankResult(out, total, ranged)
  }
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Catalyst-lineage cut WITHOUT `localCheckpoint`: wraps a (cached)
  * DataFrame's physical RDD in a fresh LogicalRDD leaf, exactly like
  * `Dataset.checkpoint` does internally (`private[sql]`, hence this one-hop
  * bridge — same pattern as [[ColumnBridge]]).
  *
  * Why not `localCheckpoint(eager, storageLevel)`: its level transform
  * FORCES the blocks on-heap — `localCheckpoint(false, OFF_HEAP)` measures
  * as `StorageLevel(disk, memory, ser)` (no off-heap), so a crawl holding
  * every superstep's fresh set as checkpoint blocks slowly fills the
  * executor HEAP with serialized bytes and dies re-caching evicted blocks
  * (observed at the 11.5M-request deep bench). A `persist(OFF_HEAP)` +
  * this cut keeps the bytes in the accounted off-heap pool (disk-backed
  * eviction, direct-buffer re-cache), AND, unlike checkpoint blocks, the
  * cache scan can recompute a lost partition from its one-superstep-deep
  * physical plan instead of failing the job.
  */
object DatasetBridge {
  def lineageCut(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema)
  }
}

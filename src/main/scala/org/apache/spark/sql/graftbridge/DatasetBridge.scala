package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution

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
  /** @param sizeHint (rowCount, sizeInBytes) when known: without stats the
    *   cut leaf reports the session default size (effectively infinite), so a
    *   genuinely small side would never broadcast (the round-4 lost-pair
    *   lesson). Partitioning is NOT declared here — use
    *   [[lineageCutPartitioned]] when the layout matters. */
  def lineageCut(df: DataFrame, sizeHint: Option[(Long, Long)] = None): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    sizeHint match {
      case None =>
        cdf.sparkSession.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema)
      case Some((rows, bytes)) =>
        val rdd = cdf.queryExecution.toRdd
        val output = cdf.queryExecution.analyzed.output
        val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt(bytes), rowCount = Some(BigInt(rows)))
        classic.Dataset.ofRows(cdf.sparkSession,
          execution.LogicalRDD(output, rdd,
            org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
              rdd.getNumPartitions),
            Nil, isStreaming = false)(cdf.sparkSession, Some(stats), None))
    }
  }

  /** As [[lineageCut]] but DECLARING the leaf's hash partitioning: a cut
    * `repartition(p, key)` store keeps reporting `HashPartitioning(key, p)`,
    * so downstream joins/aggregations on `key` add NO exchange over it.
    *
    * The partitioning is declared, not captured: `LogicalRDD.fromDataset`
    * (Dataset.checkpoint's capture path) reads the origin's
    * `executedPlan.outputPartitioning`, which an AQE-wrapped or cached plan
    * reports as `UnknownPartitioning` — measured, hence this explicit form.
    * The CALLER asserts the data really is laid out that way (i.e. this df
    * is exactly a `repartition(numPartitions, keyCols)` output); the only
    * machine-checkable part — the partition count — is required here. */
  /** @param sizeHint (rowCount, sizeInBytes) when known — WITHOUT stats the
    *   leaf reports the session default size (effectively infinite), so a
    *   genuinely small side would never be broadcast by the planner. */
  def lineageCutPartitioned(df: DataFrame, keyCols: Seq[String],
      numPartitions: Int, sizeHint: Option[(Long, Long)] = None): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cdf.queryExecution.toRdd
    require(rdd.getNumPartitions == numPartitions,
      s"declared $numPartitions partitions, rdd has ${rdd.getNumPartitions}")
    val output = cdf.queryExecution.analyzed.output
    val attrs = keyCols.map(k => output.find(_.name == k).getOrElse(
      sys.error(s"partition key $k not in output ${output.map(_.name)}")))
    val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(attrs, numPartitions)
    val stats = sizeHint.map { case (rows, bytes) =>
      org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(bytes), rowCount = Some(BigInt(rows)))
    }
    classic.Dataset.ofRows(cdf.sparkSession,
      execution.LogicalRDD(output, rdd, part, Nil, isStreaming = false)(
        cdf.sparkSession, stats, None))
  }

  /** Partition-pruned scan of a hash-partitioned (cached) DataFrame: keeps
    * only `keepPids` partitions; pruned partitions become EMPTY iterators
    * that never touch the cache (no batch decompression, no block fetch,
    * no computation), while the partition COUNT — and hence the declared
    * `HashPartitioning(keyCols, numPartitions)` and per-partition ordering —
    * stays intact, so a join on the key still adds no exchange and no sort
    * over the scan. This is the in-engine equivalent of Iceberg/bucketed-
    * table bucket pruning: a frontier that hashes into k of P buckets reads
    * k/P of the corpus instead of streaming all of it through the join.
    *
    * The caller's contract (as in [[lineageCutPartitioned]]): `df` really is
    * laid out as `HashPartitioning(keyCols, numPartitions)` with partitions
    * sorted by `orderedBy` — and every row whose key hashes into a pruned
    * partition must be irrelevant to the query (for a join: no probe-side
    * key hashes there). */
  def prunedCacheScan(df: DataFrame, keepPids: Set[Int], keyCols: Seq[String],
      numPartitions: Int, orderedBy: Seq[String]): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cdf.queryExecution.toRdd
    require(rdd.getNumPartitions == numPartitions,
      s"declared $numPartitions partitions, rdd has ${rdd.getNumPartitions}")
    val keep = Array.tabulate(numPartitions)(keepPids.contains)
    val pruned = new PartitionPrunedRDD(rdd, keep)
    val output = cdf.queryExecution.analyzed.output
    def attrOf(k: String) = output.find(_.name == k).getOrElse(
      sys.error(s"column $k not in output ${output.map(_.name)}"))
    val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
      keyCols.map(attrOf), numPartitions)
    val ordering = orderedBy.map(k => org.apache.spark.sql.catalyst.expressions.SortOrder(
      attrOf(k), org.apache.spark.sql.catalyst.expressions.Ascending))
    classic.Dataset.ofRows(cdf.sparkSession,
      execution.LogicalRDD(output, pruned, part, ordering, isStreaming = false)(
        cdf.sparkSession, None, None))
  }

  /** debug: physical output partitioning + leaf partitioning of a plan */
  def debugPartitioning(df: DataFrame): String = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val ep = cdf.queryExecution.executedPlan
    s"executed=${ep.getClass.getSimpleName} partitioning=${ep.outputPartitioning} " +
      s"logical=${cdf.queryExecution.optimizedPlan.getClass.getSimpleName}" +
      (cdf.queryExecution.optimizedPlan match {
        case l: execution.LogicalRDD => s" leafPartitioning=${l.outputPartitioning}"
        case _ => ""
      })
  }

  /** Partition-wise union of same-partitioning DataFrames: output partition i
    * is the concatenation of every input's partition i, declared with the
    * FIRST input's physical partitioning/ordering-free layout. Unlike
    * `Dataset.union` (whose physical `UnionExec` reports unknown
    * partitioning), the result keeps `HashPartitioning` visible — the
    * mechanism behind the crawl's accumulated seen set: each superstep's
    * delta is hash-partitioned ONCE at birth (O(delta)), and every later
    * anti-join reads the union with zero exchange on the seen side, instead
    * of re-shuffling the full accumulated set per superstep (O(seen),
    * quadratic cumulative). On a real cluster this is the in-memory analogue
    * of appending to a bucketed Iceberg table and storage-partitioned joins.
    *
    * Requirements: identical schemas, identical partition counts, and all
    * inputs ACTUALLY partitioned by the same key layout (the caller's
    * contract — this bridge only asserts count equality). Ordering is NOT
    * preserved (concatenated sorted runs are not sorted). */
  def alignedUnion(parts: Seq[DataFrame], keyCols: Seq[String],
      numPartitions: Int, sizeHint: Option[(Long, Long)] = None): DataFrame = {
    require(parts.nonEmpty, "alignedUnion of nothing")
    if (parts.size == 1) return parts.head
    val cparts = parts.map(_.asInstanceOf[classic.Dataset[Row]])
    val rdds = cparts.map(_.queryExecution.toRdd)
    require(rdds.forall(_.getNumPartitions == numPartitions),
      s"alignedUnion inputs must all have $numPartitions partitions: " +
        rdds.map(_.getNumPartitions).mkString(","))
    val head = cparts.head
    val union = new PartitionAlignedUnionRDD(head.sparkSession.sparkContext, rdds)
    val output = head.queryExecution.analyzed.output
    val attrs = keyCols.map(k => output.find(_.name == k).getOrElse(
      sys.error(s"partition key $k not in output ${output.map(_.name)}")))
    val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(attrs, numPartitions)
    val stats = sizeHint.map { case (rows, bytes) =>
      org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(bytes), rowCount = Some(BigInt(rows)))
    }
    classic.Dataset.ofRows(head.sparkSession,
      execution.LogicalRDD(output, union, part, Nil, isStreaming = false)(
        head.sparkSession, stats, None))
  }
}

private final case class AlignedPart(index: Int) extends org.apache.spark.Partition

/** Same partitions as the parent; pruned ones compute to empty without ever
  * touching the parent iterator (the cache block is neither fetched nor
  * decompressed, and an uncomputed partition stays uncomputed). */
private final class PartitionPrunedRDD(
    parent: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
    keep: Array[Boolean])
  extends org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow](parent) {

  override def getPartitions: Array[org.apache.spark.Partition] = parent.partitions

  override def compute(split: org.apache.spark.Partition,
      context: org.apache.spark.TaskContext): Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    if (keep(split.index)) firstParent[org.apache.spark.sql.catalyst.InternalRow].iterator(split, context)
    else Iterator.empty

  override def getPreferredLocations(split: org.apache.spark.Partition): Seq[String] =
    if (keep(split.index)) parent.preferredLocations(split) else Nil
}

/** Partition-wise union of RDDs with identical partition counts (and, by the
  * caller's contract, identical partitioners): narrow dependencies only —
  * partition i depends on every parent's partition i. */
private final class PartitionAlignedUnionRDD(
    sc: org.apache.spark.SparkContext,
    parents: Seq[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]])
  extends org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow](
    sc, parents.map(p => new org.apache.spark.NarrowDependency(p) {
      override def getParents(pid: Int): Seq[Int] = Seq(pid)
    })) {

  override def getPartitions: Array[org.apache.spark.Partition] =
    Array.tabulate(parents.head.getNumPartitions)(AlignedPart(_))

  override def compute(split: org.apache.spark.Partition,
      context: org.apache.spark.TaskContext): Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    parents.iterator.flatMap(p => p.iterator(p.partitions(split.index), context))

  override def getPreferredLocations(split: org.apache.spark.Partition): Seq[String] =
    parents.flatMap(p => p.preferredLocations(p.partitions(split.index))).distinct
}

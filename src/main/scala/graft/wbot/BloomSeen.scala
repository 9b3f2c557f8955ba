package graft.wbot

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/**
 * Partitioned Bloom pre-filter over the URL-seen set (SURVEY.md §2.6 A2).
 *
 * The reference holds the whole seen set as an in-memory `map[string]bool`
 * (`/root/reference/pkg/services/store/in_memory.go:10-15`) — its scale
 * ceiling. At 10^10 URLs the engine instead:
 *   - stores the exact seen set as a hash-partitioned table (anti-join = the
 *     exact membership test, the correctness backstop);
 *   - maintains P per-partition Bloom segments over `xxhash64(canon)` keyed
 *     by `pmod(hash64, P)`, so ~99% of duplicate candidates die before the
 *     anti-join shuffle.
 *
 * The segments themselves live DISTRIBUTED, as a `(pid, bits)` dataset that
 * is merged and checkpointed per superstep ([[SegmentStore]]) — never as a
 * driver-resident array. Membership testing picks its physical strategy by
 * total segment size:
 *   - small (≤ broadcastMaxBytes): transient collect + broadcast + codegen'd
 *     probe — the sandbox-scale fast path (a few MB);
 *   - large: candidates shuffle on `pid` and hash-join their OWN segment
 *     row — at the 10^10 design point (~12 GB of segments) each task holds
 *     exactly one ~12 MB segment instead of every executor holding all 12 GB.
 *
 * The filter is a plain double-hashed bitset (k probes derived from the
 * 64-bit key — standard Kirsch–Mitzenmacher construction), byte-addressed so
 * buffers ride `Encoders.BINARY` (no Java serialization in the aggregator
 * hot path), exact-merge via bitwise OR.
 */
object BloomSeen {

  def numHashes: Int = 5

  /** Segment size in BYTES for the expected per-segment key count. */
  def bytesFor(expectedKeys: Long, bitsPerKey: Int): Int = {
    val bits = math.max(64L, expectedKeys * bitsPerKey.toLong)
    // cap a segment at 2^30 bits (128 MB)
    (math.min(bits, 1L << 30) / 8L).toInt.max(8)
  }

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Byte], key: Long): Unit = {
    val m = bits.length.toLong * 8L
    val h1 = mix(key); val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((idx >>> 3).toInt) = (bits((idx >>> 3).toInt) | (1 << (idx & 7)).toByte).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], key: Long): Boolean = {
    val m = bits.length.toLong * 8L
    val h1 = mix(key); val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((idx >>> 3).toInt) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Typed two-level merge aggregator: per-pid Bloom segment from hash64
    * keys. Partial/final aggregation is Catalyst's tree merge; buffers are
    * raw bytes (`Encoders.BINARY`) — no ObjectOutputStream per partial.
    *
    * `zero` is a 0-length SENTINEL, not a zeroed segment: with the BINARY
    * encoder the zero value's backing bytes can be shared across groups, so
    * mutating it in `reduce` would leak one group's bits into the next
    * (observed: segment i accumulating the OR of segments 0..i). Each group
    * therefore allocates its own buffer on first reduce/merge. */
  final class SegmentAgg(numBytes: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(b: Array[Byte], key: Long): Array[Byte] = {
      val buf = if (b.length == 0) new Array[Byte](numBytes) else b
      add(buf, key); buf
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.length == 0) return b.clone() // adopt defensively: b may alias a decoded row
      if (b.length == 0) return a
      var i = 0; while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }; a
    }
    def finish(r: Array[Byte]): Array[Byte] = if (r.length == 0) new Array[Byte](numBytes) else r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** OR-merge of already-built segments (delta ∪ previous). Same 0-length
    * zero sentinel as [[SegmentAgg]]; inputs are cloned before first use so
    * no decoded row buffer is ever mutated. */
  final class OrAgg(numBytes: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(b: Array[Byte], x: Array[Byte]): Array[Byte] = {
      if (b.length == 0) return x.clone()
      var i = 0; while (i < b.length) { b(i) = (b(i) | x(i)).toByte; i += 1 }; b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.length == 0) return b
      if (b.length == 0) return a
      var i = 0; while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }; a
    }
    def finish(r: Array[Byte]): Array[Byte] = if (r.length == 0) new Array[Byte](numBytes) else r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a `hash64` column into per-pid segments (pids with no keys are
    * simply absent — an absent segment means "definitely fresh").
    *
    * PLAN SHAPE (the 100 TB term): keys are hash-aligned to their segment's
    * partition BEFORE the aggregation, and the grouping is UNTYPED so the
    * repartition's `HashPartitioning(pid, p)` satisfies the aggregate's
    * required distribution — partial ≡ final in one exchange-free stage, and
    * the only shuffle carries raw `(pid, hash64)` rows (~12 B/key). The
    * previous typed `groupByKey` shape map-side-partial-aggregated instead:
    * one `numBytes` zero-heavy buffer per (pid × map partition) — at p=160 ×
    * 294 map partitions that is 47k × 82 KB ≈ 3.9 GB of real partial state
    * that compresses ~100×, so AQE coalesced the reduce into 3 giant tasks
    * that decompressed and OR-merged it serially (measured: 827 s of the d3
    * superstep's wall on the deep bench's one-time Bloom catch-up). At the
    * 10^10 design point (P=1024, ~12 MB segments) the partial state would be
    * terabytes. The explicit width-p repartition is also AQE-coalesce-proof
    * (user-specified numPartitions is never coalesced). */
  private def segmentsOf(spark: SparkSession, df: DataFrame, p: Int,
      numBytes: Int): DataFrame = {
    df.select(pmod(col("hash64"), lit(p)).cast("int").as("pid"), col("hash64"))
      .repartition(p, col("pid"))
      .groupBy(col("pid"))
      .agg(udaf(new SegmentAgg(numBytes), Encoders.scalaLong)
        .apply(col("hash64")).as("bits"))
  }

  /**
   * The distributed segment table: `(pid, bits)`, OR-merged and checkpointed
   * per update. All driver state is this handle — the bit arrays themselves
   * never accumulate on the driver.
   */
  final class SegmentStore(spark: SparkSession, val p: Int, val numBytes: Int,
      broadcastMaxBytes: Long) {
    private var segs: Option[DataFrame] = None // (pid, bits), localCheckpointed
    // broadcast-mode cache: collected segments + the live Broadcast handle,
    // refreshed on update — the per-probe collect job disappears from the
    // superstep loop. Only populated below the broadcast cutover (small-mode);
    // the large path never materializes segments off the executors.
    private var segB: Option[org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]]] = None

    def totalBytes: Long = p.toLong * numBytes
    def segments: Option[DataFrame] = segs

    /** True when probes run as a pid-cogroup (total segments past the
      * broadcast cutover) — callers materialize multi-consumer probe output
      * once instead of paying the cogroup per consumer. */
    def usesCogroup: Boolean = segs.nonEmpty && totalBytes > broadcastMaxBytes

    /** OR fresh keys (a `hash64` column) into the store — one distributed
      * merge + eager checkpoint, nothing collected (broadcast mode refreshes
      * its collected cache here, off the probe path). */
    def update(fresh: DataFrame): Unit = {
      import spark.implicits._
      val delta = segmentsOf(spark, fresh, p, numBytes)
      val merged = segs match {
        case None => delta
        case Some(prev) =>
          prev.unionByName(delta)
            .as[(Int, Array[Byte])]
            .groupByKey(_._1)
            .mapValues(_._2)
            .agg(new OrAgg(numBytes).toColumn.name("bits"))
            .toDF("pid", "bits")
      }
      val ck = merged.localCheckpoint(true)
      segs = Some(ck)
      segB = None // stale; ContextCleaner reclaims the old broadcast
      if (totalBytes <= broadcastMaxBytes) {
        val arr = new Array[Array[Byte]](p)
        ck.collect().foreach(r => arr(r.getInt(0)) = r.getAs[Array[Byte]](1))
        segB = Some(spark.sparkContext.broadcast(arr))
      }
    }

    /**
     * Adds a boolean `__might` column: false ⇒ definitely unseen (no false
     * negatives). Broadcast-probes when the whole table is small; otherwise
     * COGROUPS `df` with the segment table on pid — candidates shuffle to
     * their segment's group, the segment row is decoded ONCE per group (never
     * per candidate row), and each task holds exactly one segment.
     */
    def withMight(df: DataFrame, hash64Col: Column): DataFrame = segs match {
      case None => df.withColumn("__might", lit(false))
      case Some(_) if totalBytes <= broadcastMaxBytes =>
        val b = segB.getOrElse(sys.error("broadcast segment cache not populated"))
        // codegen'd native probe (no scala UDF on the candidate hot path —
        // the projection stays inside whole-stage codegen)
        df.withColumn("__might",
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            exprs.BloomMightContain(
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(hash64Col), b, p)))
      case Some(s) =>
        import spark.implicits._
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
        val withPid = df.withColumn("__h64", hash64Col)
          .withColumn("__pid", pmod(hash64Col, lit(p)).cast("int"))
        val inSchema = withPid.schema
        val pidIdx = inSchema.fieldIndex("__pid")
        val h64Idx = inSchema.fieldIndex("__h64")
        val outSchema = StructType(
          df.schema.fields :+ StructField("__might", BooleanType, nullable = false))
        val nOut = df.schema.length
        val candK = withPid.groupByKey(_.getInt(pidIdx))
        val segK = s.as[(Int, Array[Byte])].groupByKey(_._1)
        val cogrouped = candK.cogroup(segK) { (_, cands, segIt) =>
          val seg = if (segIt.hasNext) segIt.next()._2 else null
          cands.map { r =>
            val vals = new Array[Any](nOut + 1)
            var i = 0; while (i < nOut) { vals(i) = r.get(i); i += 1 }
            vals(nOut) = seg != null && mightContain(seg, r.getLong(h64Idx))
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
        cogrouped.toDF()
    }
  }
}

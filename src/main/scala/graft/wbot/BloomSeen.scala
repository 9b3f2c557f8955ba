package graft.wbot

import org.apache.spark.sql.{DataFrame, SparkSession}
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
 *     by `pmod(hash64, P)`, merged with a two-level (tree) reduce and
 *     broadcast, so ~99% of duplicate candidates die before the anti-join
 *     shuffle. At 10^10 keys × 10 bits ≈ 12 GB total the per-segment
 *     broadcast is 12 GB / P (e.g. ~12 MB at P=1024) and each candidate
 *     consults only its own segment.
 *
 * The filter itself is a plain double-hashed bitset (k probes derived from
 * the 64-bit key — standard Kirsch–Mitzenmacher construction), no external
 * deps, exact-merge via bitwise OR.
 */
object BloomSeen {

  final case class Segment(pid: Int, bits: Array[Long])

  def numHashes: Int = 5

  def bitsFor(expectedKeys: Long, bitsPerKey: Int): Int = {
    val bits = math.max(64L, expectedKeys * bitsPerKey.toLong)
    // round up to power of two words, cap segment at 2^30 bits (128 MB)
    math.min(bits, 1L << 30).toInt
  }

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Long], key: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix(key); val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix(key); val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Typed two-level merge aggregator: per-partition-group Bloom segment from
    * hash64 keys (the north rule's "broadcast per-partition filter segments,
    * merged via treeAggregate" — here the tree merge is the partial/final
    * aggregation pair Catalyst plans for a typed Aggregator). */
  final class SegmentAgg(numBits: Int) extends Aggregator[(Int, Long), Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(b: Array[Long], kv: (Int, Long)): Array[Long] = { add(b, kv._2); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization[Array[Long]]
    def outputEncoder: Encoder[Array[Long]] = Encoders.javaSerialization[Array[Long]]
  }

  private def aggregateSegments(spark: SparkSession, df: DataFrame, p: Int,
      numBits: Int): Array[(Int, Array[Long])] = {
    import spark.implicits._
    df.select(pmod(col("hash64"), lit(p)).cast("int").as("pid"), col("hash64"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .agg(new SegmentAgg(numBits).toColumn.name("bits"))
      .collect()
  }

  /**
   * Build P segments from a seen DF with a `hash64` column; returns the
   * broadcastable segment array (index = pid = pmod(hash64, P)).
   */
  def buildSegments(spark: SparkSession, seen: DataFrame, p: Int,
      expectedKeysPerSegment: Long, bitsPerKey: Int): Array[Array[Long]] = {
    val numBits = bitsFor(expectedKeysPerSegment, bitsPerKey)
    val segments = Array.fill(p)(new Array[Long](numBits / 64))
    aggregateSegments(spark, seen, p, numBits).foreach { case (pid, bits) => segments(pid) = bits }
    segments
  }

  /** Incrementally OR fresh keys into existing driver-held segments. */
  def updateSegments(spark: SparkSession, segments: Array[Array[Long]], fresh: DataFrame, p: Int): Unit = {
    val numBits = segments(0).length * 64
    aggregateSegments(spark, fresh, p, numBits).foreach { case (pid, bits) =>
      val dst = segments(pid)
      var i = 0; while (i < dst.length) { dst(i) |= bits(i); i += 1 }
    }
  }
}

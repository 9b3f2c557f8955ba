package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.wbot.BloomSeen

/** Bit-level properties of the byte-addressed Bloom segment: no false
  * negatives ever, and the false-positive rate near the design point
  * (10 bits/key, k=5 → ~1%). */
class BloomSpec extends AnyFunSuite {

  test("no false negatives; FPR ~1% at 10 bits/key") {
    val n = 100000
    val bits = new Array[Byte](BloomSeen.bytesFor(n, 10))
    val rnd = new java.util.Random(42)
    val keys = Array.fill(n)(rnd.nextLong())
    keys.foreach(BloomSeen.add(bits, _))
    assert(keys.forall(BloomSeen.mightContain(bits, _)), "false negative!")
    val probes = Array.fill(n)(rnd.nextLong())
    val keySet = keys.toSet // O(1) membership — the array scan was O(n^2)
    val fp = probes.count(k => !keySet.contains(k) && BloomSeen.mightContain(bits, k))
    val fpr = fp.toDouble / n
    assert(fpr < 0.05, s"false-positive rate too high: $fpr")
  }
}

/** Distributed SegmentStore: aggregation + incremental merge + both probe
  * strategies must preserve no-false-negatives and the design FPR. */
class SegmentStoreSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  private def keysDf(n: Int, tag: String) = {
    import spark.implicits._
    spark.range(n).select(xxhash64(concat(lit(tag), col("id"))).as("hash64"))
  }

  test("store build + probe: no false negatives, FPR near design point") {
    val p = 4
    val n = 40000
    val numBytes = BloomSeen.bytesFor(n / p, 10)
    for (bcastMax <- Seq(Long.MaxValue, 0L)) { // broadcast mode, join mode
      val store = new BloomSeen.SegmentStore(spark, p, numBytes, bcastMax)
      store.update(keysDf(n, "seen-"))
      val seenMarked = store.withMight(keysDf(n, "seen-"), col("hash64"))
      assert(seenMarked.where(!col("__might")).count() == 0, "false negative!")
      val freshMarked = store.withMight(keysDf(n, "fresh-"), col("hash64"))
      val fpr = freshMarked.where(col("__might")).count().toDouble / n
      assert(fpr < 0.05, s"false-positive rate too high (bcastMax=$bcastMax): $fpr")
    }
  }

  test("incremental update accumulates (second delta does not lose the first)") {
    val p = 4
    val store = new BloomSeen.SegmentStore(spark, p, BloomSeen.bytesFor(20000, 10), Long.MaxValue)
    store.update(keysDf(10000, "a-"))
    store.update(keysDf(10000, "b-"))
    val a = store.withMight(keysDf(10000, "a-"), col("hash64"))
    val b = store.withMight(keysDf(10000, "b-"), col("hash64"))
    assert(a.where(!col("__might")).count() == 0, "first delta lost after merge!")
    assert(b.where(!col("__might")).count() == 0, "second delta missing!")
  }
}

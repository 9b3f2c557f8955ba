package graft

import org.apache.spark.sql.functions._
import graft.wbot.{Politeness, Schemas}
import graft.wbot.Schemas.{Budget, CrawlConfig}

/**
 * O2 drain-order unit properties: the frontier drains as a depth/score
 * priority queue expressed as a ranked window — higher scores occupy earlier
 * rate intervals within a host; constant score degenerates to pure FIFO.
 */
class PolitenessSpec extends SparkSuite {

  private def frontier(rows: Seq[(String, Long, Long)]) = { // (root, score, seq)
    import spark.implicits._
    rows.toDF("root", "score", "seq")
      .withColumn("depth", lit(0))
      .withColumn("hash64", xxhash64(col("seq")))
  }

  test("higher scores drain in earlier intervals within a host") {
    val cfg = CrawlConfig(rateLimits = Map("*" -> Budget(2, 1000L)))
    val f = frontier(Seq(
      ("a.com", 10L, 0L), ("a.com", 50L, 1L), ("a.com", 30L, 2L),
      ("a.com", 50L, 3L), ("a.com", 90L, 4L), ("b.com", 1L, 5L)))
    val out = Politeness.assignIntervals(f, cfg, salted = false)
      .select("root", "seq", "interval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // a.com drain order by (score desc, seq): 4(90), 1(50), 3(50), 2(30), 0(10)
    // budget 2 → intervals: 4,1 → 0; 3,2 → 1; 0 → 2
    assert(out == Set(
      ("a.com", 4L, 0), ("a.com", 1L, 0),
      ("a.com", 3L, 1), ("a.com", 2L, 1),
      ("a.com", 0L, 2), ("b.com", 5L, 0)))
  }

  test("constant score is exactly the FIFO drain (seq order)") {
    val cfg = CrawlConfig(rateLimits = Map("*" -> Budget(2, 1000L)))
    val rows = (0L until 10L).map(i => ("a.com", 0L, i))
    val out = Politeness.assignIntervals(frontier(rows), cfg, salted = false)
      .select("seq", "interval").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert((0L until 10L).forall(i => out(i) == (i / 2).toInt))
  }

  test("salted drain never exceeds budget and respects score within a salt") {
    val cfg = CrawlConfig(rateLimits = Map("*" -> Budget(3, 1000L)))
    val rows = (0L until 200L).map(i => ("a.com", i % 7, i))
    val out = Politeness.assignIntervals(frontier(rows), cfg, salted = true)
    val over = out.groupBy("root", "interval").count()
      .where(col("count") > 3).count()
    assert(over == 0, "salted schedule exceeded budget")
  }
}

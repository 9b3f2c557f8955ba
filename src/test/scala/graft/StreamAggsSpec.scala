package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.ops.StreamAggs
import java.sql.Timestamp

/** Watermarked windowed aggregation: the streaming result (Append mode,
  * windows finalized by the watermark) must agree with the same query run
  * as a batch DataFrame — Spark's unified-semantics contract. */
class StreamAggsSpec extends SparkSuite {

  test("streaming windowed counts with watermark == batch windowed counts") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    def ts(min: Int, sec: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    val batch1 = Seq(
      (ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0), (ts(0, 50), "view", 3.0),
      (ts(1, 5), "click", 4.0), (ts(1, 30), "view", 5.0))
    val batch2 = Seq(
      (ts(0, 55), "click", 6.0), // late but within the 2m watermark → counted
      (ts(5, 0), "view", 7.0), (ts(6, 0), "view", 8.0), // advance watermark
      (ts(9, 0), "click", 9.0))
    val rows = batch1 ++ batch2

    val mem = MemoryStream[(Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamAggs.windowedCounts(sdf, "ts", "event_type", "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append()).start()
    // watermark advances at batch boundaries; closed windows emit in the NEXT
    // batch — so feed incrementally and finish with a flushing batch
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    mem.addData((ts(20, 0), "flush", 0.0)); q.processAllAvailable()
    q.stop()

    // batch reference on the same data (sans the flush sentinel); Append mode
    // emits exactly the windows the final watermark closed
    // (end <= 00:20 - 2m = 00:18)
    val batch = StreamAggs.windowedCounts(rows.toDF("ts", "event_type", "value"),
      "ts", "event_type", "1 minute", "2 minutes")
      .where($"window_end" <= ts(18, 0))
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val streamed = sp.table("winagg")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty)
    // the late-but-in-watermark event was aggregated
    assert(streamed.exists { case (w, k, n, total) =>
      k == "click" && n == 3 && w == ts(0, 0) && total == 9.0 })
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time streaming aggregations for pipeline telemetry (crawl metrics,
 * fetch logs, event tables): watermarked tumbling-window aggregation — the
 * standard Structured Streaming shape (`readStream → withWatermark →
 * groupBy(window(...)) → agg`), usable identically on a batch DataFrame
 * (Spark's unified semantics) which is how the oracle-checked batch query
 * validates the streaming one.
 */
object StreamAggs {

  /** Tumbling-window counts per key with late-data bound `watermark`.
    * Works on both streaming and batch inputs (same plan semantics). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))
}

package graft.wbot

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Structured-Streaming skin over the batch superstep engine (SURVEY.md
 * §2.10 / §7.8): a stream of seed URLs drives the same deterministic
 * frontier-expansion pipeline via `foreachBatch` — each micro-batch of seeds
 * runs a full crawl against the pages snapshot and appends the stream
 * (order) and seen deltas to parquet sinks. No stateful streaming operators
 * are needed: all crawl state lives in the engine's tables, which is what
 * makes the crawl order reproducible (and the reference has no event-time
 * semantics to model — `crawler.go:195-291` is a pull loop).
 *
 * Use `Trigger.AvailableNow` for drain-and-stop semantics or a processing-
 * time trigger for a continuous service.
 */
object StreamingCrawl {

  /**
   * @param seedStream streaming DataFrame with a `value: String` column of
   *                   seed URLs (file source, Kafka value, MemoryStream…)
   * @param invalidSeedsAreFatal the reference aborts a Run on any invalid
   *                   seed (crawler.go:124-126); a long-running service can
   *                   choose to skip bad batches instead
   */
  def start(spark: SparkSession, seedStream: DataFrame, pagesPrep: DataFrame,
      cfg: Schemas.CrawlConfig, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      invalidSeedsAreFatal: Boolean = true): StreamingQuery = {
    seedStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val seeds = batch.select("value").collect().map(_.getString(0)).toSeq
        if (seeds.nonEmpty) {
          try {
            val run = SparkCrawler.runPrepared(spark, pagesPrep, seeds, cfg)
            run.order
              .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
              .write.mode("append").parquet(s"$outDir/crawled")
            run.seen
              .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
              .write.mode("append").parquet(s"$outDir/seen")
          } catch {
            case e: IllegalArgumentException if !invalidSeedsAreFatal =>
              System.err.println(s"[streaming-crawl] batch $batchId skipped: ${e.getMessage}")
          }
        }
        ()
      }
      .start()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the canonical Structured
  * Streaming aggregate (the streaming form of the batch `window_tumbling`
  * key): frame traffic bucketed into fixed event-time windows, counts +
  * byte sums per window, emitted in APPEND mode, i.e. a window row is
  * produced exactly once, when the watermark proves the window can no
  * longer receive data.
  *
  * Scale notes: partial aggregation happens before the shuffle (counts
  * and sums combine map-side), state holds only open windows (closed
  * ones are evicted on emission), and late frames below the watermark
  * are dropped rather than reopening finalized windows — the append
  * contract downstream sinks (files, Kafka) need for exactly-once.
  */
object WindowedCounts {

  def stream(
      spark: SparkSession,
      frames: Dataset[TimedFrame],
      windowLength: String = "1 hour",
      delayThreshold: String = "20 seconds"): DataFrame =
    frames
      .withWatermark("ts", delayThreshold)
      .groupBy(window(col("ts"), windowLength).as("w"), col("uuid"))
      .agg(count(lit(1)).as("n_frames"), sum(length(col("payload"))).as("n_bytes"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("uuid"), col("n_frames"), col("n_bytes"))
}

package graft.streaming

import java.sql.Timestamp

import graft.functions.MisraGries.misra_gries
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** An item observation on the event-time axis. */
final case class TimedItem(ts: Timestamp, item: String)

/** Watermarked per-window frequent-items sketch — the streaming face of
  * the batch `heavy_hitters` key: which items dominated each event-time
  * window, with BOUNDED state.
  *
  * The aggregation value per open window is one Misra-Gries buffer
  * ([[graft.functions.MisraGries]]) of at most k counters, merged across
  * micro-batches through the state store exactly like any other partial
  * aggregate — so state is O(open_windows × k) REGARDLESS of the item
  * domain, where an exact per-item streaming count grows with the number
  * of distinct items seen (unbounded on an open-vocabulary stream: the
  * state-eviction problem that makes exact streaming top-k a non-starter
  * at ingest scale). The MG guarantees are merge-order-independent, so
  * they survive arbitrary micro-batch slicing: when the watermark closes
  * a window, the emitted row carries every item whose true in-window
  * count exceeds n/(k+1), each with an estimate in
  * [true − n/(k+1), true].
  *
  * Emission is APPEND mode — one row per window, exactly once, when the
  * watermark proves the window complete; late items below the watermark
  * are dropped, never reopen a finalized sketch. Downstream consumers
  * that need exact counts run the same second pass as the batch key: the
  * candidate list is ≤k rows per window — broadcast it at the archived
  * window data and recount (lossless by the superset guarantee).
  */
object FrequentItems {

  def stream(
      spark: SparkSession,
      items: Dataset[TimedItem],
      k: Int,
      windowLength: String = "1 hour",
      delayThreshold: String = "20 seconds"): DataFrame =
    items
      .withWatermark("ts", delayThreshold)
      .groupBy(window(col("ts"), windowLength).as("w"))
      // count(item), not count(*): the sketch skips null items, and the
      // documented second-pass threshold cnt·(k+1) > n is stated against
      // the NON-null row count — an inflated n would silently raise the
      // bar past the sketch guarantee
      .agg(misra_gries(col("item"), k).as("candidates"), count(col("item")).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("n"), col("candidates"))
}

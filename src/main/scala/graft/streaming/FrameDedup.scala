package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Transport-level duplicate suppression — the reference's seq-equality
  * dedup (`transf_server.cpp:267-273` REJECTs a frame whose seq was
  * already accepted) lifted to a composable stream stage: retransmitted
  * frames (same uuid + seq) are dropped before they reach the stateful
  * reassembly, so the session operator only spends REJECT cycles on
  * genuine protocol violations, not on network retries.
  *
  * `dropDuplicatesWithinWatermark` keys state on (uuid, seq) and — unlike
  * plain `dropDuplicates`, whose state grows forever on an unbounded
  * stream — evicts each key once the watermark passes its event time +
  * delay: exactly the reference's TTL reasoning applied to dedup state.
  * At scale the state store is bounded by the retransmission window, not
  * the stream history.
  */
object FrameDedup {

  def stream(
      spark: SparkSession,
      frames: Dataset[TimedFrame],
      delayThreshold: String = Reassembly.DefaultTtl): Dataset[TimedFrame] =
    frames
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("uuid", "seq")
}

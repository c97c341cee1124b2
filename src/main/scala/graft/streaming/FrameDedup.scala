package graft.streaming

import org.apache.spark.sql.Dataset

/** Watermark-bounded exactly-once-ish ingest dedup: collapses an
  * at-least-once delivered event stream to one row per (uuid, seq) key —
  * the standard pre-aggregation dedup stage of an event pipeline (think
  * duplicated deliveries from a replaying upstream, NOT the transfer
  * protocol's in-session seq check).
  *
  * Deliberately NOT composed in front of [[Reassembly]]: the protocol is
  * stop-and-wait, so a frame the session REJECTed (e.g. it arrived ahead
  * of its turn) is legitimately retransmitted later with the same
  * (uuid, seq) and must reach the session operator then — and a uuid
  * reused after DONE starts a fresh generation whose seqs intentionally
  * repeat. A first-seen-wins key filter would swallow both. The
  * reference's in-session duplicate rejection lives where it belongs, in
  * [[Reassembly.processFrames]] (`transf_server.cpp:267-273`).
  *
  * `dropDuplicatesWithinWatermark` — unlike plain `dropDuplicates`, whose
  * state grows forever on an unbounded stream — evicts each key once the
  * watermark passes its event time + delay: state is bounded by the
  * duplication window, not stream history.
  */
object FrameDedup {

  def stream(
      frames: Dataset[TimedFrame],
      delayThreshold: String = Reassembly.DefaultTtl): Dataset[TimedFrame] =
    frames
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("uuid", "seq")
}

package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One TRANSFER frame (SURVEY §1.2): keyed by session uuid, 1-based seq,
  * with the session's total size carried on every frame (the batch analog
  * of the HS handshake's filesize field, `transf_server.cpp:156-161`).
  */
final case class Frame(uuid: String, seq: Int, payload: String, filesize: Long)

/** A frame with an event timestamp — the input of the event-time variant
  * ([[Reassembly.streamEventTime]]), where idle-session expiry follows the
  * WATERMARK (stream time) rather than the wall clock.
  */
final case class TimedFrame(uuid: String, seq: Int, payload: String, filesize: Long, ts: Timestamp)

/** Keyed session state — the `TransferInfo` struct of the reference
  * (`transf_server.cpp:49-70`): next expected seq, bytes written, declared
  * size, and a rejected-frame counter. `lastEventMs` (event-time mode
  * only) carries the newest frame timestamp seen across batches, so the
  * TTL deadline never moves backward when an out-of-order frame arrives in
  * a later batch.
  *
  * Deliberately O(1) PER KEY: the state holds offsets only — accepted
  * payload bytes leave the operator on their ack ([[AckEvent.chunk]]) in
  * the same micro-batch and are flushed by the sink, exactly as the
  * reference streams each frame straight to the open file
  * (`transf_server.cpp:275-294`) instead of buffering the transfer in the
  * session map. A 100 GB transfer costs the state store the same ~40
  * bytes as a 1 KB one.
  *
  * NOTE: changing these fields changes the state-store schema — streaming
  * queries CANNOT resume from checkpoints written by an older state shape
  * (Spark fails the state schema compatibility check); restart such
  * queries from a fresh checkpoint location.
  */
final case class SessionState(
    expected: Int, written: Long, filesize: Long, rejected: Int,
    lastEventMs: Long = 0L, gen: Int = 0)

/** Per-frame server replies: RECEIVED/DONE (`transf_server.cpp:295-326`),
  * REJECT for dup/out-of-order seq (`transf_server.cpp:267-273`), and
  * EXPIRED when the TTL sweep evicts an idle session
  * (`transf_server.cpp:78-131`). `chunk` carries the ACCEPTED (clamped)
  * payload slice on RECEIVED/DONE — the per-frame byte flow to the sink —
  * and is empty on REJECT/EXPIRED. The accepted frame's seq is
  * `next_seq - 1`.
  */
/** `gen` is the uuid's session GENERATION within this state lifetime: 0
  * for the first session, +1 each time a completed uuid reopens within
  * the same micro-batch (see [[Reassembly.processFrames]]). Together with
  * the sink's batch id it totally orders a uuid's generations — (batch,
  * gen) is lexicographically the arrival order — which is what lets
  * [[FileSink.assembled]] pick the newest generation deterministically
  * instead of tie-breaking on chunk content.
  */
final case class AckEvent(uuid: String, kind: String, next_seq: Int, written: Long, chunk: String, gen: Int = 0)

/** Structured-Streaming ordered reassembly with TTL state expiry — the
  * streaming form of the `roundtrip_pipeline` batch query, in two flavors:
  *
  *   - [[stream]]: processing-time TTL — the literal replay of the
  *     reference's wall-clock GC sweep (`transf_server.cpp:653-655`);
  *   - [[streamEventTime]]: event-time TTL — `withWatermark` +
  *     `EventTimeTimeout`, the semantics an event pipeline actually needs:
  *     sessions expire when the STREAM has provably moved past their last
  *     frame (watermark > last event time + TTL), independent of wall
  *     clock, and late frames older than the watermark are dropped before
  *     they can corrupt state (the reference has no analog — UDP just
  *     loses them; SURVEY §1.4 maps A13 to exactly this pair).
  *
  * Scale notes: state lives in the state store partitioned by uuid (no
  * global locks — the reference's mutex-per-session maps to partition
  * locality); per-key state is O(1) — offsets only, bytes flush per batch; timeouts
  * replace the reference's sweeper thread. Exactly-once sink semantics
  * come from checkpointing, vs the reference's at-most-once seq-equality
  * dedup.
  */
object Reassembly {

  /** Reference default: timeout_send + timeout_recv = 20 s. */
  val DefaultTtl: String = "20 seconds"
  val DefaultTtlMs: Long = 20000L

  /** Core per-batch session-state transition, shared by both time modes.
    *
    * Within a micro-batch, frames may arrive unordered; the protocol is
    * stop-and-wait so seq order is the delivery order — process in seq
    * order and REJECT anything that isn't the next expected frame. Once
    * the session completes, it is closed (`transf_server.cpp:295-326`
    * erases the map entry): a trailing seq-1 frame REOPENS the uuid as a
    * fresh session GENERATION (`gen + 1` — the reference's
    * overwrite-on-collision, a new handshake on a finished uuid
    * overwrites the file, `transf_server.cpp:171-184`); any other
    * trailing frame draws REJECT, never a second DONE for the closed
    * generation. Two generations fully INTERLEAVED in one batch (the new
    * opener sorting before the old generation's closing frame) still
    * degrade to rejects for the newcomer — seq order is the only delivery
    * order a batch carries — and the stop-and-wait client resolves that
    * by retrying in the next batch, where `gen`/batch ordering takes over.
    *
    * Returns (final state, acks, completed) — completed = the LAST
    * generation in the batch finished (no open session remains).
    */
  private[graft] def processFrames(
      uuid: String, st0: SessionState, frames: Seq[Frame]): (SessionState, Seq[AckEvent], Boolean) = {
    var st = st0
    var done = false
    val acks = ArrayBuffer.empty[AckEvent]
    frames.sortBy(_.seq).foreach { f =>
      if (st.filesize < 0) st = st.copy(filesize = f.filesize)
      if (done && f.seq == 1) {
        // overwrite-on-collision: completion erased the session, so a
        // fresh seq-1 frame in the same batch opens the next generation
        st = SessionState(1, 0L, f.filesize, 0, st.lastEventMs, st.gen + 1)
        done = false
      }
      if (done || f.seq != st.expected) {
        st = st.copy(rejected = st.rejected + 1)
        acks += AckEvent(uuid, "REJECT", st.expected, st.written, "", st.gen)
      } else {
        // A10 clamp: never write past the declared filesize.
        val room = st.filesize - st.written
        val take = math.max(0L, math.min(room, f.payload.length.toLong)).toInt
        val accepted = f.payload.substring(0, take)
        st = st.copy(expected = st.expected + 1, written = st.written + take)
        // the accepted bytes leave on the ack — state keeps offsets only
        if (st.written >= st.filesize) {
          done = true
          acks += AckEvent(uuid, "DONE", st.expected, st.written, accepted, st.gen)
        } else {
          acks += AckEvent(uuid, "RECEIVED", st.expected, st.written, accepted, st.gen)
        }
      }
    }
    (st, acks.toSeq, done)
  }

  private def expire(uuid: String, state: GroupState[SessionState]): Iterator[AckEvent] = {
    // A13: evict the idle session; partial content is discarded, exactly
    // like the sweeper deleting the partial file.
    val st = state.getOption
    state.remove()
    Iterator.single(AckEvent(uuid, "EXPIRED",
      st.map(_.expected).getOrElse(1), st.map(_.written).getOrElse(0L), "",
      st.map(_.gen).getOrElse(0)))
  }

  /** Processing-time state-update function, factored out so unit tests can
    * drive it directly with `TestGroupState` (incl. the timeout path, which
    * wall clocks make impractical to exercise through a real trigger).
    *
    * `ttl` mirrors the wiring's timeout mode: with NoTimeout,
    * `setTimeoutDuration` would throw, so bounded (batch-like) runs pass
    * ttl = false.
    */
  def update(ttl: Boolean)(uuid: String, frames: Iterator[Frame], state: GroupState[SessionState]): Iterator[AckEvent] = {
    if (state.hasTimedOut) expire(uuid, state)
    else {
      val st0 = state.getOption.getOrElse(SessionState(1, 0L, -1L, 0))
      val (st, acks, done) = processFrames(uuid, st0, frames.toSeq)
      if (done) {
        // A11: close + erase session.
        state.remove()
      } else {
        state.update(st)
        if (ttl) state.setTimeoutDuration(DefaultTtl)
      }
      acks.iterator
    }
  }

  /** Event-time state-update function: the TTL deadline is
    * `max(newest frame time EVER seen, watermark) + ttlMs` — the session
    * expires once the watermark passes 20 s beyond its newest frame, the
    * event-time reading of the reference's `last_update_time` sweep
    * (`transf_server.cpp:78-131`). The newest-seen time persists in
    * state (`lastEventMs`): a late out-of-order frame in a later batch
    * must not shrink the deadline below what earlier frames established.
    */
  def updateEventTime(ttlMs: Long = DefaultTtlMs)(
      uuid: String, frames: Iterator[TimedFrame], state: GroupState[SessionState]): Iterator[AckEvent] = {
    if (state.hasTimedOut) expire(uuid, state)
    else {
      val fs = frames.toSeq
      val st0 = state.getOption.getOrElse(SessionState(1, 0L, -1L, 0))
      val (st1, acks, done) =
        processFrames(uuid, st0, fs.map(f => Frame(f.uuid, f.seq, f.payload, f.filesize)))
      if (done) state.remove()
      else {
        val newest = math.max(st0.lastEventMs, fs.map(_.ts.getTime).max)
        state.update(st1.copy(lastEventMs = newest))
        state.setTimeoutTimestamp(math.max(newest, state.getCurrentWatermarkMs()) + ttlMs)
      }
      acks.iterator
    }
  }

  /** Wires the processing-time stateful op over a (streaming or batch)
    * Dataset of frames.
    *
    * Default = production mode with the 20 s processing-time TTL. NOTE:
    * with ProcessingTimeTimeout Spark schedules no-data batches on every
    * trigger indefinitely (to evaluate timeouts), so bounded test/demo runs
    * pass `GroupStateTimeout.NoTimeout` and cover eviction via
    * `TestGroupState` instead.
    */
  def stream(
      spark: SparkSession,
      frames: Dataset[Frame],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[AckEvent] = {
    import spark.implicits._
    val ttl = timeout == GroupStateTimeout.ProcessingTimeTimeout
    frames
      .groupByKey(_.uuid)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update(ttl))
  }

  /** Event-time wiring: watermark on `ts` (late frames below the watermark
    * are dropped by the stateful operator before reaching [[updateEventTime]])
    * + `EventTimeTimeout` eviction. Timeouts fire on watermark advancement —
    * driven by data, not wall clock, so bounded runs terminate naturally.
    */
  def streamEventTime(
      spark: SparkSession,
      frames: Dataset[TimedFrame],
      delayThreshold: String = DefaultTtl,
      ttlMs: Long = DefaultTtlMs): Dataset[AckEvent] = {
    import spark.implicits._
    frames
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.uuid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateEventTime(ttlMs))
  }
}

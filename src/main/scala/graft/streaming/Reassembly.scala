package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One TRANSFER frame (SURVEY §1.2): keyed by session uuid, 1-based seq,
  * with the session's total size carried on every frame (the batch analog
  * of the HS handshake's filesize field, `transf_server.cpp:156-161`).
  */
final case class Frame(uuid: String, seq: Int, payload: String, filesize: Long)

/** Keyed session state — the `TransferInfo` struct of the reference
  * (`transf_server.cpp:49-70`): next expected seq, bytes written, content
  * accumulated so far, declared size, and a rejected-frame counter.
  */
final case class SessionState(
    expected: Int, written: Long, content: String, filesize: Long, rejected: Int)

/** Per-frame server replies: RECEIVED/DONE (`transf_server.cpp:295-326`),
  * REJECT for dup/out-of-order seq (`transf_server.cpp:267-273`), and
  * EXPIRED when the TTL sweep evicts an idle session
  * (`transf_server.cpp:78-131`). `content` is populated only on DONE.
  */
final case class AckEvent(uuid: String, kind: String, next_seq: Int, written: Long, content: String)

/** Structured-Streaming ordered reassembly with TTL state expiry — the
  * streaming form of the `roundtrip_pipeline` batch query.
  *
  * Scale notes: state lives in the state store partitioned by uuid (no
  * global locks — the reference's mutex-per-session maps to partition
  * locality); per-key state is bounded by the declared filesize; the
  * processing-time timeout replays the reference's 20 s GC sweep
  * (`transf_server.cpp:653-655`) without a sweeper thread. Exactly-once
  * sink semantics come from checkpointing, vs the reference's at-most-once
  * seq-equality dedup.
  */
object Reassembly {

  /** Reference default: timeout_send + timeout_recv = 20 s. */
  val DefaultTtl: String = "20 seconds"

  /** State-update function, factored out so unit tests can drive it
    * directly with `TestGroupState` (incl. the timeout path, which wall
    * clocks make impractical to exercise through a real trigger).
    *
    * `ttl` mirrors the wiring's timeout mode: with NoTimeout,
    * `setTimeoutDuration` would throw, so bounded (batch-like) runs pass
    * ttl = false.
    */
  def update(ttl: Boolean)(uuid: String, frames: Iterator[Frame], state: GroupState[SessionState]): Iterator[AckEvent] = {
    if (state.hasTimedOut) {
      // A13: evict the idle session; partial content is discarded, exactly
      // like the sweeper deleting the partial file.
      val st = state.getOption
      state.remove()
      Iterator.single(AckEvent(uuid, "EXPIRED",
        st.map(_.expected).getOrElse(1), st.map(_.written).getOrElse(0L), ""))
    } else {
      var st = state.getOption.getOrElse(SessionState(1, 0L, "", -1L, 0))
      val acks = ArrayBuffer.empty[AckEvent]
      // Within a micro-batch, frames may arrive unordered; the protocol is
      // stop-and-wait so seq order is the delivery order — process in seq
      // order and REJECT anything that isn't the next expected frame.
      frames.toSeq.sortBy(_.seq).foreach { f =>
        if (st.filesize < 0) st = st.copy(filesize = f.filesize)
        if (f.seq != st.expected) {
          st = st.copy(rejected = st.rejected + 1)
          acks += AckEvent(uuid, "REJECT", st.expected, st.written, "")
        } else {
          // A10 clamp: never write past the declared filesize.
          val room = st.filesize - st.written
          val take = math.max(0L, math.min(room, f.payload.length.toLong)).toInt
          st = SessionState(st.expected + 1, st.written + take,
            st.content + f.payload.substring(0, take), st.filesize, st.rejected)
          if (st.written >= st.filesize)
            acks += AckEvent(uuid, "DONE", st.expected, st.written, st.content)
          else
            acks += AckEvent(uuid, "RECEIVED", st.expected, st.written, "")
        }
      }
      if (acks.exists(_.kind == "DONE")) {
        // A11: close + erase session (even if trailing duplicates in the
        // same batch drew REJECTs after completion).
        state.remove()
      } else {
        state.update(st)
        if (ttl) state.setTimeoutDuration(DefaultTtl)
      }
      acks.iterator
    }
  }

  /** Wires the stateful op over a (streaming or batch) Dataset of frames.
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
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A sent TRANSFER frame, as the client's retransmit bookkeeping sees it
  * (`transf_client.cpp:163-175`: send, then block on the matching ack).
  */
final case class SentFrame(uuid: String, seq: Int, ts: Timestamp)

/** A server ack (`transf_server.cpp:318-323`): echoes the session uuid and
  * carries next_seq = seq + 1.
  */
final case class AckFrame(ack_uuid: String, ack_seq: Int, ack_ts: Timestamp)

/** Streaming ack verification — the stream-stream form of the batch
  * `ack_verify` key (A12, `transf_client.cpp:174-194`): sent frames
  * left-outer interval-joined to acks on (uuid, seq+1) within the 20 s
  * ack window.
  *
  * Semantics: a sent frame matched by a well-formed ack inside
  * [ts, ts + 20 s] emits `matched = true` immediately; a frame whose ack
  * never arrives emits `matched = false` — but only once BOTH watermarks
  * have passed its window, i.e. when the stream can prove no ack is still
  * in flight (Spark holds the frame in join state until then). That is
  * exactly the client's timeout-abort decision, made with event-time
  * rigor instead of a wall clock.
  *
  * Scale notes: both sides shuffle once on the equi-key (uuid); join
  * state is bounded by the watermark (frames older than ts + 20 s and
  * acks older than the window are evicted), so state size tracks the
  * in-flight window, not the stream history.
  */
object AckMatch {

  val AckWindow = "20 seconds"

  def stream(spark: SparkSession, sent: Dataset[SentFrame], acks: Dataset[AckFrame]): DataFrame = {
    val s = sent.withWatermark("ts", AckWindow)
    val a = acks.withWatermark("ack_ts", AckWindow)
    s.join(a,
      expr(s"""ack_uuid = uuid AND ack_seq = seq + 1
              | AND ack_ts >= ts AND ack_ts <= ts + interval $AckWindow""".stripMargin),
      "leftOuter")
      .select(col("uuid"), col("seq"), col("ts"),
        col("ack_seq").isNotNull.as("matched"))
  }
}

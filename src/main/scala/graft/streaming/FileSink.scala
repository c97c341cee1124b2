package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The reference's file sink (A14: `CreateDirectory` + binary ofstream
  * write + overwrite-on-collision, `transf_server.cpp:171-184`) as a
  * streaming parquet sink: completed sessions (DONE acks carry the full
  * reassembled content) land as parquet rows under `path`.
  *
  * Exactly-once: foreachBatch can replay a micro-batch after a failure,
  * so the write must be idempotent — each batch overwrites its own
  * `batch=<id>` subdirectory (the deterministic batch id is the replay
  * key), which together with the checkpoint gives end-to-end
  * exactly-once file output, strictly stronger than the reference's
  * at-most-once overwrite. Readers see one row per completed session:
  * `(uuid, written, content)`.
  */
object FileSink {

  /** Wires `acks` (from [[Reassembly.stream]] or
    * [[Reassembly.streamEventTime]]) to an idempotent parquet sink.
    * Returns the writer so callers pick trigger/checkpoint placement.
    */
  def completedToParquet(acks: Dataset[AckEvent], path: String): DataStreamWriter[AckEvent] =
    acks.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: Dataset[AckEvent], batchId: Long) =>
        ds.filter(_.kind == "DONE")
          .select("uuid", "written", "content")
          .write.mode("overwrite")
          .parquet(s"$path/batch=$batchId")
      }
}

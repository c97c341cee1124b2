package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The reference's file sink (A14: `CreateDirectory` + binary ofstream
  * write + overwrite-on-collision, `transf_server.cpp:171-184`) as a
  * streaming parquet sink. The reference appends each accepted frame to
  * the open file as it arrives (`transf_server.cpp:275-294`) — the
  * parquet-native analog is one CHUNK ROW per accepted frame, flushed per
  * micro-batch, with [[assembled]] reconstructing completed transfers at
  * read time. Nothing upstream buffers a whole file: the stateful operator
  * keeps offsets only (see [[SessionState]]) and each batch lands only the
  * bytes it received.
  *
  * Exactly-once: foreachBatch can replay a micro-batch after a failure,
  * so the write must be idempotent — each batch overwrites its own
  * `batch=<id>` subdirectory (the deterministic batch id is the replay
  * key), which together with the checkpoint gives end-to-end exactly-once
  * chunk output, strictly stronger than the reference's at-most-once
  * overwrite.
  */
object FileSink {

  /** Wires `acks` (from [[Reassembly.stream]] or
    * [[Reassembly.streamEventTime]]) to an idempotent per-chunk parquet
    * sink: one row per ACCEPTED frame `(uuid, seq, chunk, done, written)`.
    * Returns the writer so callers pick trigger/checkpoint placement.
    */
  def chunksToParquet(acks: Dataset[AckEvent], path: String): DataStreamWriter[AckEvent] =
    acks.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: Dataset[AckEvent], batchId: Long) =>
        ds.filter(a => a.kind == "RECEIVED" || a.kind == "DONE")
          .toDF()
          .select(col("uuid"), (col("next_seq") - 1).as("seq"), col("chunk"),
            (col("kind") === "DONE").as("done"), col("written"), col("gen"))
          .write.mode("overwrite")
          .parquet(s"$path/batch=$batchId")
      }

  /** Read-side reassembly over the chunk rows: completed sessions (those
    * with a DONE chunk) concatenated in seq order → one row per transfer
    * `(uuid, written, content)`, byte-identical to the source. The
    * per-session collect is bounded by the transfer's own chunk count and
    * runs as one hash-partitioned aggregation — sessions assemble in
    * parallel across the cluster.
    *
    * A uuid can carry MULTIPLE session generations (state is erased on
    * DONE, so a replayed frame opens a fresh session — possibly within
    * the SAME micro-batch; an expired session may be retried): chunk rows
    * from different generations share (uuid, seq). The reference's
    * semantics are overwrite-on-collision (`transf_server.cpp:171-184`),
    * reproduced here by (a) keeping the chunk of the latest `(batch,
    * gen)` per (uuid, seq) — `gen` is the per-uuid generation counter
    * [[Reassembly.processFrames]] assigns when a completed uuid reopens
    * in-batch, so the pair is lexicographically the true arrival order
    * and the winner is DETERMINISTIC even when two generations share a
    * batch — and (b) truncating the concatenation to the latest DONE's
    * `written`: a newer complete generation fully masks an older one's
    * bytes, including a stale longer tail. (As in the reference, a NEWER
    * partial overwrite on top of an older complete file is unrecoverable
    * corruption either way.)
    */
  def assembled(spark: SparkSession, path: String): DataFrame = {
    // basePath keeps the batch=N partition column for latest-wins
    // ordering; mergeSchema because a directory may MIX pre-generation
    // batch dirs (no gen column) with post-generation ones — without it
    // Spark can infer the schema from an old footer and silently DROP
    // the real gen values in newer batches, regressing same-batch
    // ordering to the nondeterministic content tie-break
    val raw = spark.read
      .option("basePath", path).option("mergeSchema", "true").parquet(path)
    // chunk dirs written before the generation counter existed lack the
    // column (all-old dirs) or carry nulls for it (mixed dirs after the
    // merged-schema read); gen 0 reproduces the old ordering there
    val rows =
      if (raw.columns.contains("gen"))
        raw.withColumn("gen", coalesce(col("gen"), lit(0)))
      else raw.withColumn("gen", lit(0))
    val latest = rows
      .groupBy("uuid", "seq")
      .agg(max(struct(col("batch"), col("gen"), col("chunk"))).as("lc"))
      .select(col("uuid"), col("seq"), col("lc.chunk").as("chunk"))
    val doneInfo = rows.filter(col("done"))
      .groupBy("uuid")
      .agg(max(struct(col("batch"), col("gen"), col("seq"), col("written"))).as("d"))
      .select(col("uuid"), col("d.written").as("written"))
    latest.join(doneInfo, "uuid")
      .groupBy("uuid")
      .agg(min("written").as("written"),
        array_join(
          transform(array_sort(collect_list(struct(col("seq"), col("chunk")))),
            x => x.getField("chunk")), "").as("raw"))
      .select(col("uuid"), col("written"),
        expr("substr(raw, 1, CAST(written AS INT))").as("content"))
  }
}

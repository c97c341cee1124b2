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
        // EXPIRED acks land as MARKER rows (empty chunk, expired=true):
        // the sink-side record of the reference's TTL sweep deleting the
        // partial file (`transf_server.cpp:78-131`) — [[assembled]]
        // ignores them, [[compactExpiredChunks]] consumes them to drop
        // the expired generation's chunk rows
        ds.filter(a => a.kind == "RECEIVED" || a.kind == "DONE" || a.kind == "EXPIRED")
          .toDF()
          .select(col("uuid"), (col("next_seq") - 1).as("seq"), col("chunk"),
            (col("kind") === "DONE").as("done"), col("written"), col("gen"),
            (col("kind") === "EXPIRED").as("expired"))
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
    // merged-schema read); gen 0 reproduces the old ordering there. Same
    // evolution story for the expired-marker column; marker rows carry an
    // EMPTY chunk and must not reach latest-wins (a marker sharing (uuid,
    // seq) with a real chunk row would mask its bytes), so they are
    // filtered here
    val rows = normalized(raw).filter(!col("expired"))
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

  /** Schema evolution in one place: dirs written before the `gen` /
    * `expired` columns existed read as gen 0 / not-expired (all-old dirs
    * lack the column, mixed dirs carry nulls after the merged-schema
    * read).
    */
  private def normalized(raw: DataFrame): DataFrame = {
    val withGen =
      if (raw.columns.contains("gen")) raw.withColumn("gen", coalesce(col("gen"), lit(0)))
      else raw.withColumn("gen", lit(0))
    if (withGen.columns.contains("expired"))
      withGen.withColumn("expired", coalesce(col("expired"), lit(false)))
    else withGen.withColumn("expired", lit(false))
  }

  /** Storage GC for TTL-evicted sessions — the missing half of the
    * reference's sweep: the sweeper doesn't just drop the session entry,
    * it DELETES the partial file (`transf_server.cpp:78-131`), while this
    * sink's chunk rows for an expired session would otherwise accumulate
    * forever (a real storage leak in a long-running ingest, since an
    * expired generation has no DONE and can never assemble). Rewrites
    * ONLY the affected `batch=N` directories in place (untouched batches
    * keep their files; the partition value each surviving row re-reads
    * is unchanged, so latest-wins ordering is preserved). Returns the
    * number of rows dropped.
    *
    * WHICH rows die is subtler than "(uuid, gen) with a marker": `gen`
    * counts generations within ONE state lifetime and restarts at 0 when
    * a completed (or expired) uuid reopens in a LATER batch — (uuid,
    * gen) alone is NOT a generation identity, only (batch, gen) order
    * is. Deleting every (uuid, gen) row would therefore also destroy a
    * COMPLETED earlier instance that shares gen 0 with an expired retry.
    * The correct scope: a marker at batch bm dooms exactly the rows of
    * its (uuid, gen) in the interval (lastDone, bm], where lastDone is
    * that pair's newest done-carrying batch ≤ bm — an instance that
    * completed at batch bd keeps every row (they sit ≤ bd), the expired
    * instance's rows sit strictly after the last completion and up to
    * the marker, and rows of a LATER successful retry sit after bm.
    * With this scope a completed generation masked by a newer expired
    * partial becomes cleanly readable again after compaction — a
    * strictly better recovery than the reference, whose
    * overwrite-then-delete destroys the completed bytes too.
    *
    * The marker list and the implicated pairs' done batches are
    * collected to the driver (one marker per expired session since the
    * last compaction — metadata scale, same class as the IVF codebook)
    * and re-broadcast as doom intervals for the per-directory anti-join.
    * The per-directory rewrite is write-tmp → delete → rename: a crash
    * between the last two steps can lose that directory's surviving
    * rows, the classic non-transactional object-store compaction
    * window — a production deployment would run this as a DELETE on a
    * transactional table format; this sink stays plain parquet by
    * design (zero added dependencies).
    */
  def compactExpiredChunks(spark: SparkSession, path: String): Long = {
    val all = normalized(spark.read
      .option("basePath", path).option("mergeSchema", "true").parquet(path))
    // plan everything over the ORIGINAL file listing before any rewrite
    val markers = all.filter(col("expired")).select("uuid", "gen", "batch").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getAs[Number](2).longValue()))
    if (markers.isEmpty) return 0L
    val keysDf = spark.createDataFrame(markers.map(m => (m._1, m._2)).distinct.toSeq)
      .toDF("uuid", "gen")
    val doneBatches = all.filter(col("done"))
      .join(broadcast(keysDf), Seq("uuid", "gen"), "left_semi")
      .select("uuid", "gen", "batch").distinct().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getAs[Number](2).longValue()))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // one doom interval per marker: (lastDone ≤ marker batch, marker batch]
    val intervals = markers.map { case (u, g, bm) =>
      val lo = doneBatches.getOrElse((u, g), Seq.empty[Long])
        .filter(_ <= bm).lastOption.getOrElse(-1L)
      (u, g, lo, bm)
    }
    val iDf = spark.createDataFrame(intervals.toSeq).toDF("iu", "ig", "lo", "hi")
    def doomCond(rows: DataFrame) =
      rows("uuid") === iDf("iu") && rows("gen") === iDf("ig") &&
        rows("batch") > iDf("lo") && rows("batch") <= iDf("hi")
    // left_semi: overlapping intervals (two markers, no completion
    // between) can cover one row twice without double-counting it
    val doomed = all.join(broadcast(iDf), doomCond(all), "left_semi")
    val affectedBatches = doomed.select("batch").distinct().collect()
      .map(_.getAs[Number](0).longValue()).sorted
    val dropped = doomed.count()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affectedBatches.foreach { b =>
      val dst = new org.apache.hadoop.fs.Path(path, s"batch=$b")
      val tmp = new org.apache.hadoop.fs.Path(path, s".compact-batch=$b")
      // intervals covering THIS directory's batch, keyed on (uuid, gen)
      // alone — the batch condition is resolved driver-side
      val forB = intervals.filter(iv => iv._3 < b && b <= iv._4).map(iv => (iv._1, iv._2))
      val forBDf = spark.createDataFrame(forB.distinct.toSeq).toDF("uuid", "gen")
      // fresh single-directory read: the global frame's file listing goes
      // stale as directories are swapped out under it
      normalized(spark.read.option("mergeSchema", "true").parquet(dst.toString))
        .join(broadcast(forBDf), Seq("uuid", "gen"), "left_anti")
        .select("uuid", "seq", "chunk", "done", "written", "gen", "expired")
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(dst, true)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"compaction rename failed for $dst")
    }
    dropped
  }
}

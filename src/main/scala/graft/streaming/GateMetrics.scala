package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a [[StreamingQueryListener]] that retains
  * each micro-batch's progress — input rows, processing rate, trigger
  * duration, and state-store row counts — in a BOUNDED per-JVM ring
  * buffer, queryable as a DataFrame.
  *
  * The 100 TB point: on a long-running ingest gate the first sign of
  * trouble is a drifting batch duration (the probe literal-plan
  * regression of r14 showed up exactly there), a falling processing
  * rate, or an unbounded state-rows curve (a missing watermark, a hot
  * key) — and Spark surfaces all of these ONLY through listener
  * progress events, which are print-and-lose unless something retains
  * them. Retention is bounded by construction (`capacity` most-recent
  * events): an ops view wants the recent window; unbounded history
  * belongs in an external sink, not driver memory — [[flushTo]] is that
  * handoff (idempotent ring → parquet rotation).
  *
  * Thread-safety: progress events arrive on Spark's listener bus thread
  * while readers snapshot from test/ops threads — all buffer access is
  * synchronized on the deque (events are tiny; contention is nil at
  * micro-batch cadence).
  */
final class GateMetrics(capacity: Int = 1024) extends StreamingQueryListener {
  require(capacity > 0, "capacity must be positive")

  private val buf = new java.util.ArrayDeque[GateMetrics.BatchMetric]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val duration = Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(-1L)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val m = GateMetrics.BatchMetric(
      p.id.toString, p.runId.toString, p.batchId, p.timestamp,
      p.numInputRows, p.processedRowsPerSecond, duration, stateRows)
    buf.synchronized {
      buf.addLast(m)
      while (buf.size > capacity) { buf.removeFirst(): Unit }
    }
  }

  /** The retained window, oldest first. */
  def snapshot: Seq[GateMetrics.BatchMetric] = buf.synchronized {
    val out = Seq.newBuilder[GateMetrics.BatchMetric]
    buf.forEach(m => out += m)
    out.result()
  }

  /** Test/replay seam: re-offer a metric to the ring outside the listener
    * bus (the bus event types have private constructors, so a crash
    * between [[flushTo]]'s append and its rotation can only be simulated
    * by refilling the ring with the already-persisted rows).
    */
  private[graft] def offer(m: GateMetrics.BatchMetric): Unit = buf.synchronized {
    buf.addLast(m)
    while (buf.size > capacity) { buf.removeFirst(): Unit }
  }

  /** Rotate the retained ring into a persisted parquet sink — the
    * external-history handoff the class doc promises: the ring stays the
    * bounded RECENT window, the sink owns unbounded history. Appends only
    * snapshot rows whose (run_id, batch_id) — a progress event's identity
    * — is not already persisted (the `appendNewSigsIdempotent` anti-join
    * discipline), then drops the flushed rows from the ring. At-least-once
    * callers are safe: a periodic flusher that retries after a failure, or
    * a crash between append and rotation, re-offers the same rows and the
    * anti-join lands them exactly once. Returns the rows appended.
    *
    * Scale shape: both sides of the anti-join are metric-scale (≤ capacity
    * ring rows vs the sink's key projection — batch counts, not data), so
    * a flush is a driver-cheap maintenance action at any corpus size; a
    * deployment calls it on a timer or every N batches beside the query.
    */
  /** Serializes [[flushTo]]: two flushes racing the same path would both
    * pass the anti-join before either append commits and land duplicate
    * keys the sink can never shed (a timer tick overlapping a batch-hook
    * call is exactly the documented usage). Cross-PROCESS flushers are
    * out of scope — the ring is per-JVM driver state, so one listener
    * has one flusher by construction.
    */
  private val flushLock = new Object

  def flushTo(spark: SparkSession, path: String): Long = flushLock.synchronized {
    import spark.implicits._
    val snap = snapshot
    if (snap.isEmpty) return 0L
    val df = snap.toDF()
    val existing =
      try Some(spark.read.parquet(path).select("run_id", "batch_id"))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    // materialize the novel rows ONCE (metric-scale: ≤ capacity rows) —
    // count-then-write would run the anti-join and the sink scan twice
    // and could report a count the write no longer matches
    val novelRows = existing.fold(df)(e =>
      df.join(e, Seq("run_id", "batch_id"), "left_anti"))
      // the using-column join moves the keys to column 0 — restore the
      // declared order so every flush generation lands schema-identical
      .select(df.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .as[GateMetrics.BatchMetric].collect()
    if (novelRows.nonEmpty)
      novelRows.toSeq.toDF().write.mode("append").parquet(path)
    // rotation AFTER the append commits: a crash in between re-offers
    // the rows and the anti-join absorbs them
    buf.synchronized { snap.foreach(m => buf.removeFirstOccurrence(m): Unit) }
    novelRows.length.toLong
  }

  /** The retained window as a DataFrame — joinable against the audit log
    * on batch_id for per-batch cost attribution.
    */
  def toDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
}

object GateMetrics {
  final case class BatchMetric(
      query_id: String,
      run_id: String,
      batch_id: Long,
      ts: String,
      input_rows: Long,
      rows_per_sec: Double,
      trigger_ms: Long,
      state_rows: Long)

  /** Registers a fresh listener on the session and returns it — the
    * caller owns deregistration (`spark.streams.removeListener`).
    */
  def attach(spark: SparkSession, capacity: Int = 1024): GateMetrics = {
    val gm = new GateMetrics(capacity)
    spark.streams.addListener(gm)
    gm
  }
}

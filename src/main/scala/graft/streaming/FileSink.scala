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
    *
    * STORAGE ASSUMPTION (shared with [[compactExpiredChunks]]): replay
    * idempotence rides on atomically replacing a whole `batch=<id>`
    * directory, which requires HDFS/posix rename-and-visibility
    * semantics. On an S3-class store (no atomic rename) deploy this sink
    * on a transactional table format instead — the decided answer and
    * its rationale live in SURVEY §2's file-sink entry.
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
    // self-healing read: a committed-but-unswapped compaction manifest
    // rolls forward here (under an atomic claim — safe against other
    // readers and a live compactor), so readers see the compacted state
    // without any caller running compactExpiredChunks first. Pre-commit
    // crash debris (orphan tmp dirs) is NOT touched on the read path —
    // readers cannot distinguish it from a live compaction's in-flight
    // phase 1, and the originals are untouched either way; the next
    // compaction entry cleans it. On the no-crash path this is one
    // filesystem metadata probe.
    recoverForRead(spark, path)
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
    * The interval's OPEN lower end (rows at batch `lastDone` survive) is
    * safe against a DONE and a retry sharing that batch: within one
    * micro-batch a completed uuid's reopen always gets `gen + 1`
    * ([[Reassembly.processFrames]] — all of a uuid's frames in a batch
    * flow through ONE invocation, so a remove-then-recreate inside a
    * batch is structurally impossible), and `gen` restarts to 0 only
    * when the state was ABSENT at the batch's start, i.e. the completion
    * happened in a strictly earlier batch. Likewise an EXPIRED marker
    * never shares a batch with a same-generation DONE (timeouts fire
    * only for keys with no data in the batch). Hence two instances of a
    * uuid can never collide on (batch, gen), and rows excluded at
    * `batch == lastDone` are always the completed instance's own —
    * pinned by StreamingSpec's same-batch-reopen test.
    *
    * The marker list and the implicated pairs' done batches are
    * collected to the driver (one marker per expired session since the
    * last compaction — metadata scale, same class as the IVF codebook)
    * and re-broadcast as doom intervals for the per-directory anti-join.
    *
    * CRASH SAFETY is a manifest-based two-phase commit (no added
    * dependencies, plain parquet + one hidden file):
    *   phase 1  every affected directory's surviving rows are written to
    *            a hidden `.compact-batch=N` sibling — originals
    *            untouched, readers unaffected (dot-prefixed paths are
    *            invisible to Spark's file index);
    *   commit   the batch list is published as `_compaction_manifest`
    *            via write-hidden-tmp → rename — the single atomic commit
    *            point (rename atomicity holds on HDFS/posix; on an
    *            S3-class store use a transactional table format — the
    *            decided deployment answer, SURVEY §2 file-sink entry);
    *   phase 2  the swapper CLAIMS the manifest (atomic rename to a
    *            unique hidden `.claimed-*` name — exactly one of this
    *            compactor and any concurrently-recovering reader wins),
    *            then each original is deleted and its compacted sibling
    *            renamed into place; the claim file is removed last.
    * [[recoverCompaction]] makes any crash point benign and runs at
    * every compaction entry: an AGED claim (crashed mid-swap) is
    * adopted by atomic re-claim and finished (idempotent — a completed
    * swap leaves no tmp dir); a YOUNG claim fails the entry loudly (a
    * presumed-live swapper is working); a committed manifest is claimed
    * and rolled forward; otherwise orphaned tmp dirs roll back (the
    * originals were never touched). The one unrecoverable window of the
    * previous write-tmp → delete → rename per-directory scheme — a
    * crash between delete and rename silently losing that directory's
    * surviving rows — is gone: deletion only ever happens after the
    * manifest commits the intent, and the replacement bytes are already
    * on disk. Trade recorded: a mid-swap crash leaves a half-compacted
    * (per-directory consistent) view for up to [[ClaimGraceMs]] before
    * any actor may adopt — the price of making concurrent swappers
    * structurally impossible.
    */
  def compactExpiredChunks(spark: SparkSession, path: String): Long =
    compactExpiredChunks(spark, path, failAfterPhase = Int.MaxValue)

  /** Test seam: `failAfterPhase` injects a crash (exception) after phase
    * 1 (tmp dirs written, manifest not yet committed) or phase 2 (the
    * manifest is committed, no swap has run) — the two states a real
    * crash leaves behind. Production callers use the public overload.
    */
  private[graft] def compactExpiredChunks(
      spark: SparkSession, path: String, failAfterPhase: Int): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(spark, path)
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
    // phase 1: all replacement directories written BEFORE anything is
    // deleted — originals stay live for readers throughout
    affectedBatches.foreach { b =>
      val dst = new org.apache.hadoop.fs.Path(path, s"batch=$b")
      val tmp = new org.apache.hadoop.fs.Path(path, s".compact-batch=$b")
      // intervals covering THIS directory's batch, keyed on (uuid, gen)
      // alone — the batch condition is resolved driver-side
      val forB = intervals.filter(iv => iv._3 < b && b <= iv._4).map(iv => (iv._1, iv._2))
      val forBDf = spark.createDataFrame(forB.distinct.toSeq).toDF("uuid", "gen")
      normalized(spark.read.option("mergeSchema", "true").parquet(dst.toString))
        .join(broadcast(forBDf), Seq("uuid", "gen"), "left_anti")
        .select("uuid", "seq", "chunk", "done", "written", "gen", "expired")
        .write.mode("overwrite").parquet(tmp.toString)
    }
    if (failAfterPhase <= 1) sys.error("injected crash after phase 1 (pre-commit)")
    // commit point: publish the swap list atomically
    writeManifest(fs, path, affectedBatches)
    if (failAfterPhase <= 2) sys.error("injected crash after phase 2 (committed, unswapped)")
    // phase 2 under the SAME claim discipline as reader recovery: the
    // instant the manifest is published, a concurrent assembled() may
    // claim and start swapping — swapping from this compactor's
    // in-memory list as well would race those very swaps. The atomic
    // claim picks exactly one swapper; if a reader won, it finishes the
    // identical list and retires the claim.
    claimAndRollForward(fs, path)
    dropped
  }

  /** Right-to-be-forgotten over the CONTENT store — the place a deletion
    * request matters most: the chunk directories hold the actual payload
    * bytes, and [[graft.operators.IndexPurge]] only clears the DERIVED
    * artifacts. Drops every row of the given uuids (all generations, all
    * batches) under the exact swap protocol compaction uses — phase-1
    * replacement directories written before anything is touched, one
    * manifest commit, claim-guarded swaps — so every crash point is
    * recovered by the same [[recoverCompaction]]/[[recoverForRead]]
    * machinery (the protocol does not care WHY directories are being
    * rewritten), and concurrent swappers stay structurally impossible.
    * Same single-maintainer contract as compaction: one purger/compactor
    * at a time per sink dir.
    *
    * Zero-match purges return 0 without writing anything — deletion
    * queues redeliver, and a replayed purge of already-removed uuids
    * must be free. Returns the number of chunk rows dropped.
    */
  def purgeUuids(spark: SparkSession, path: String, uuids: Seq[String]): Long = {
    require(uuids.nonEmpty, "purge requires at least one uuid")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(spark, path)
    val all = normalized(spark.read
      .option("basePath", path).option("mergeSchema", "true").parquet(path))
    val uDf = spark.createDataFrame(uuids.distinct.map(Tuple1(_))).toDF("uuid")
    val doomed = all.join(broadcast(uDf), Seq("uuid"), "left_semi")
    val affectedBatches = doomed.select("batch").distinct().collect()
      .map(_.getAs[Number](0).longValue()).sorted
    if (affectedBatches.isEmpty) return 0L
    val dropped = doomed.count()
    // phase 1: replacements on disk before any original is touched
    affectedBatches.foreach { b =>
      val dst = new org.apache.hadoop.fs.Path(path, s"batch=$b")
      val tmp = new org.apache.hadoop.fs.Path(path, s".compact-batch=$b")
      normalized(spark.read.option("mergeSchema", "true").parquet(dst.toString))
        .join(broadcast(uDf), Seq("uuid"), "left_anti")
        .select("uuid", "seq", "chunk", "done", "written", "gen", "expired")
        .write.mode("overwrite").parquet(tmp.toString)
    }
    // commit + claim-guarded swap — compaction's phase 2 verbatim
    writeManifest(fs, path, affectedBatches)
    claimAndRollForward(fs, path)
    dropped
  }

  /** Full recovery at a COMPACTION entry — the single-compactor path
    * (concurrent compactions on one sink dir are outside the contract):
    * adopt any crashed recoverer's claimed manifest, then roll a
    * committed manifest forward or an uncommitted crash back (deleting
    * orphaned phase-1 tmp dirs — originals were never touched).
    *
    * READERS must not call this: the rollback branch cannot distinguish
    * a crashed compaction's orphans from a LIVE compaction's in-flight
    * phase-1 directories — deleting those would make the subsequent
    * commit silently skip the affected batches. Readers get the
    * mutual-exclusion-safe [[recoverForRead]] instead.
    */
  def recoverCompaction(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a recoverer that crashed between claiming the manifest and
    // finishing the swaps left a .claimed-* file: adopt (by RE-claim —
    // atomic, so concurrent adopters cannot double-run the swaps) and
    // finish it. A YOUNG claim means a recoverer is presumed live and
    // mid-swap right now; compaction must not proceed to re-plan
    // against directories that are being swapped under it — fail fast.
    if (adoptAgedClaims(fs, path, claimGraceMs(spark)) > 0)
      throw new IllegalStateException(
        s"a manifest recovery claim on $path is in flight; retry compaction shortly")
    val manifest = manifestPath(path)
    if (fs.exists(manifest)) {
      // committed: roll forward (claim first so a concurrent READER's
      // recovery can never interleave with this one)
      claimAndRollForward(fs, path)
    } else {
      // uncommitted: roll back. Originals were never touched; orphaned
      // tmp dirs (and a torn hidden manifest tmp) are garbage.
      val orphans = fs.globStatus(new org.apache.hadoop.fs.Path(path, ".compact-batch=*"))
      if (orphans != null) orphans.foreach(s => fs.delete(s.getPath, true))
      fs.delete(new org.apache.hadoop.fs.Path(path, s".$ManifestName.tmp"), false)
    }
  }

  /** Reader-side recovery: ROLL FORWARD ONLY, serialized by an atomic
    * manifest claim. A reader never deletes phase-1 tmp dirs (it cannot
    * know whether they belong to a crash or to a LIVE compaction's
    * uncommitted phase 1 — the pre-claim design raced exactly that way),
    * and two concurrent readers cannot double-run the swaps: the rename
    * of the manifest to a caller-unique claimed name is atomic, so
    * exactly one claimant performs them. A claimant that crashes
    * mid-swap leaves its claimed file for the next compaction entry (or
    * the next reader recovery) to adopt.
    */
  private[graft] def recoverForRead(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // aged claims (a recoverer crashed mid-swap) ARE adopted here too —
    // adoption goes through an atomic RE-claim, so concurrent adopters
    // cannot double-run the swaps, and reads self-heal once the grace
    // age passes. YOUNG claims are left alone (presumed-live claimant is
    // finishing the identical list); until then a crashed claimant's
    // half-swapped state is visible — each directory individually
    // consistent, the doomed-row scope preserved in the claim file, the
    // healing delay bounded by ClaimGraceMs.
    adoptAgedClaims(fs, path, claimGraceMs(spark)): Unit
    if (fs.exists(manifestPath(path))) claimAndRollForward(fs, path)
  }

  /** Atomically claims the committed manifest (rename to a unique
    * hidden name — exactly one concurrent claimant wins; losers no-op)
    * and replays its swap list. The claim's mtime is EXPLICITLY set to
    * now — rename preserves the source's mtime, so without this a claim
    * on a long-crashed manifest would look instantly aged and invite a
    * concurrent adoption racing the live claimant. The claim file is
    * removed only after every swap completed, so a mid-swap crash is
    * adoptable.
    */
  private def claimAndRollForward(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val claim = new org.apache.hadoop.fs.Path(path,
      s".$ManifestName.claimed-${java.util.UUID.randomUUID().toString.take(8)}")
    if (!fs.rename(manifestPath(path), claim)) return // lost the race: done or in other hands
    fs.setTimes(claim, System.currentTimeMillis(), -1)
    readBatchList(fs, claim).foreach(b => swapIn(fs, path, b))
    fs.delete(claim, false)
  }

  /** Adopts every claim older than the configured grace ([[claimGraceMs]],
    * default [[ClaimGraceMs]]) — atomically, by
    * RE-claiming it under this caller's own name (rename picks a single
    * adopter; a losing adopter no-ops) — and replays its swaps. Returns
    * the number of YOUNG claims left in place (presumed-live
    * claimants).
    */
  private def adoptAgedClaims(
      fs: org.apache.hadoop.fs.FileSystem, path: String, graceMs: Long): Int = {
    val claimed = fs.globStatus(new org.apache.hadoop.fs.Path(path, s".$ManifestName.claimed-*"))
    var young = 0
    if (claimed != null) claimed.foreach { st =>
      if (System.currentTimeMillis() - st.getModificationTime < graceMs) young += 1
      else {
        val mine = new org.apache.hadoop.fs.Path(path,
          s".$ManifestName.claimed-${java.util.UUID.randomUUID().toString.take(8)}")
        if (fs.rename(st.getPath, mine)) {
          fs.setTimes(mine, System.currentTimeMillis(), -1)
          readBatchList(fs, mine).foreach(b => swapIn(fs, path, b))
          fs.delete(mine, false)
        }
      }
    }
    young
  }

  private def readBatchList(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Seq[Long] = {
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).map(_.toLong).toSeq
  }

  /** Default minimum age before a compaction entry may ADOPT another
    * process's crashed manifest claim (younger = presumed live, fail
    * fast). Swap replay takes sub-seconds; ten minutes is decisively past
    * any live claimant on any storage this sink supports.
    */
  private[graft] val ClaimGraceMs: Long = 10 * 60 * 1000L

  /** Deployment knob for the claim grace: `spark.graft.filesink.claimGraceMs`
    * read from the session the caller passed to the entry point (NOT
    * thread-local active-session state, which is None on scheduler /
    * background threads and would silently revert to the default). A
    * crashed mid-swap claimant leaves readers a half-compacted
    * (per-directory consistent) view until the grace elapses —
    * deployments with tighter read-consistency needs shorten the healing
    * window; the trade (shorter grace = higher risk of adopting a
    * merely-slow LIVE claimant and racing its swaps) is the caller's to
    * price. A malformed value fails loudly — this is a reliability knob,
    * not one to fall back silently on. Default: [[ClaimGraceMs]].
    */
  private def claimGraceMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.filesink.claimGraceMs") match {
      case None => ClaimGraceMs
      case Some(v) =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.filesink.claimGraceMs must be a long millisecond count, got '$v'")
        }
    }

  private val ManifestName = "_compaction_manifest"
  private def manifestPath(path: String) =
    new org.apache.hadoop.fs.Path(path, ManifestName)

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, path: String,
      batches: Array[Long]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(path, s".$ManifestName.tmp")
    val out = fs.create(tmp, true)
    try out.write(batches.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, manifestPath(path)))
      throw new java.io.IOException(s"compaction manifest commit failed for $path")
  }

  /** One directory swap: delete the original, move the compacted
    * replacement into place. No-op if the replacement is already gone
    * (the swap completed before a crash).
    */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem, path: String, b: Long): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path, s"batch=$b")
    val tmp = new org.apache.hadoop.fs.Path(path, s".compact-batch=$b")
    if (!fs.exists(tmp)) return
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"compaction rename failed for $dst")
  }
}

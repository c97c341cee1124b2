package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, VectorOps}

/** Wall-clock seconds per gate stage for ONE micro-batch — the gate's
  * observability record ([[DedupGate.gateBatchWithinAwareTimed]] /
  * `GateBench`). Stages map 1:1 onto [[DedupGate]]'s `gateCore` body,
  * each ended by an eager action:
  *   - `sigSec`: shingle + minhash + banding of the batch text
  *     (the tracked checkpoint of `DedupOps.bandedSigs`);
  *   - `probeSec`: the file-pruned index probe + within-batch check +
  *     slot verification (the flags checkpoint) — the number that must
  *     stay FLAT as the index grows, or the bucketed-probe claim is
  *     wrong;
  *   - `sinkSec`: the caller's `onBatch` body (includes re-evaluating
  *     the raw batch plan for the flag join — the gate holds no
  *     checkpoint of the full-width batch by design);
  *   - `appendSec`: the idempotent signature append of unflagged docs.
  * `appended` is the number of docs actually indexed this batch.
  */
final case class GateStageTimings(
    batchId: Long, sigSec: Double, probeSec: Double,
    sinkSec: Double, appendSec: Double, appended: Long)

/** Streaming near-duplicate INGEST GATE: checks each arriving micro-batch
  * of documents against a persisted MinHash signature index and flags
  * near-dups BEFORE they enter the corpus — the online form of
  * [[DedupOps]]' batch near-dup pipeline, and the text counterpart of the
  * persisted ANN index maintenance in [[VectorOps]] (same bucketed-table +
  * validated-meta + idempotent-append pattern; reference session dedup
  * semantics: `transf_server.cpp:49-131` dedups arriving chunks against
  * per-session state — this is that idea at corpus scope).
  *
  * Index layout: the banded signature rows of [[DedupOps.bandedSigs]]
  * (`doc_id, band_id, bh, sig` — 4 rows per doc), written as a parquet
  * table BUCKETED BY `bh`, so a batch probe prunes index FILES via a
  * literal bucket filter and the probe join is exchange-free on the index
  * side (the session must set
  * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`, same as
  * the ANN probes — asserted in BucketingSpec).
  *
  * Scale shape (100 TB): the index is corpus-sized but each batch touches
  * only the buckets its own band hashes land in — probe cost is
  * O(batch × bucket population), never an index scan. The batch side is
  * BROADCAST (a micro-batch is small by contract). Flagging is verified,
  * not trusted: a band collision is only a candidate; the per-pair
  * signature slot check (≥ [[DedupOps.MinhashVerifySlots]]/16) gates the
  * flag exactly as in the batch clustering path.
  *
  * Dedup policy: NOVEL docs pass the gate and their signatures append to
  * the index (idempotently — replay-safe under foreachBatch's
  * at-least-once contract); flagged docs are annotated, not dropped — the
  * removal decision is the caller's, and their signatures are NOT indexed,
  * keeping one representative per near-dup class at rest.
  *
  * Contract boundaries: [[gateBatch]] checks batch-vs-INDEX only — two
  * near-dup docs arriving in ONE batch both pass (and both index);
  * compose a within-batch dedup upstream ([[FrameDedup]] /
  * `dropDuplicatesWithinWatermark`) for EXACT arrival duplicates, or use
  * [[gateBatchWithinAware]] (the [[StreamMerge.gatedIngestPipeline]]
  * body), which also checks each doc against its own batch's smaller-id
  * siblings so one near-dup class indexes exactly one member. The
  * INDEX is replay-stable, the ANNOTATIONS are not fully: a re-delivered
  * doc_id is never flagged against itself (self-matches are excluded)
  * and never re-indexed (doc_id anti-join), but near-dup siblings that
  * first arrived together — both novel, both indexed — WILL flag against
  * each other when their batch replays (each now sees the other at
  * rest). A sink that drops flagged rows keyed on doc_id must therefore
  * either dedup within the batch upstream (making the case impossible)
  * or treat `is_dup` on replayed rows as advisory. `onBatch` also sees
  * replayed rows again — exactly-once OUTPUT is the downstream sink's
  * job, as everywhere in this streaming surface (the FileSink pattern).
  */
object DedupGate {

  /** Signature geometry — the SAME constants [[DedupOps.bandedSigs]]
    * builds from ([[DedupOps.MinhashSigWidth]] minhash slots in
    * [[DedupOps.MinhashBands]] bands), persisted in the meta table so an
    * index written under an older geometry fails validation instead of
    * silently mixing signature widths. Aliased (not duplicated) so a
    * geometry change in DedupOps cannot leave the gate validating against
    * a stale copy.
    */
  val SigWidth: Int = DedupOps.MinhashSigWidth
  val NBands: Int = DedupOps.MinhashBands

  private[graft] def metaTableFor(table: String): String = table + "_meta"

  /** Builds (overwrites) the signature index from a seed corpus of
    * `(doc_id, text)` rows, plus its validation meta table.
    */
  def writeSigIndex(spark: SparkSession, docs: DataFrame, table: String,
      nBuckets: Int = 16): Unit = {
    VectorOps.clearStaleLocation(spark, table)
    DedupOps.bandedSigs(docs)
      .write.mode("overwrite").bucketBy(nBuckets, "bh").sortBy("bh")
      .format("parquet").saveAsTable(table)
    // base_n from the just-written table, not a second pass over the seed
    // corpus (at index-build scale the corpus scan is the whole cost)
    val baseN = spark.table(table).select("doc_id").distinct().count()
    VectorOps.clearStaleLocation(spark, metaTableFor(table))
    spark.createDataFrame(Seq((SigWidth, NBands, baseN)))
      .toDF("sig_width", "n_bands", "base_n")
      .write.mode("overwrite").format("parquet").saveAsTable(metaTableFor(table))
    // rebuild owns the index: in-flight appenders fail their commit
    graft.operators.IndexEpoch.bumpUnconditional(spark, table)
  }

  /** In-place rebuild of a signature index FROM ITS OWN ROWS — the
    * rebuild a long-running gate actually performs when
    * [[sigIndexStaleness]] crosses its threshold: a production gate
    * holds signatures, not the original text ([[writeSigIndex]] needs
    * `(doc_id, text)`), so the rebuild must be signature-only. Effects:
    *   - every append's file sliver re-buckets into `nBuckets` tidy
    *     sorted files (each idempotent append lands up to `nBuckets` new
    *     small files; hundreds of batches = thousands of files the
    *     probe must open — this is the compaction);
    *   - `nBuckets` can GROW with the corpus, restoring the
    *     O(batch × bucket-population) probe bound the original build
    *     sized for;
    *   - meta `base_n` resets to the current corpus, so staleness reads
    *     0 again;
    *   - the epoch bumps unconditionally — the rebuild owns the index,
    *     in-flight appenders fail their commit ([[graft.operators
    *     .IndexEpoch]]), same as [[writeSigIndex]].
    *
    * Mechanics: Spark cannot overwrite a table from a plan that reads it,
    * so the rows stage through `<table>_rebuild` (bucketed), then write
    * back, then the staging drops. Two sequential writes of the index —
    * the deliberate, restart-safe cost of a rebuild; concurrent
    * maintainers are excluded by the same single-sequential-maintainer
    * contract as the append paths (the epoch guard turns a violation
    * into a loud failure, not corruption).
    */
  def rebuildSigIndex(spark: SparkSession, table: String, nBuckets: Int = 16): Unit = {
    validateMeta(spark, table)
    spark.catalog.refreshTable(table)
    val staging = table + "_rebuild"
    VectorOps.clearStaleLocation(spark, staging)
    spark.table(table).write.mode("overwrite")
      .bucketBy(nBuckets, "bh").sortBy("bh").format("parquet").saveAsTable(staging)
    val baseN = spark.table(staging).select("doc_id").distinct().count()
    spark.table(staging).write.mode("overwrite")
      .bucketBy(nBuckets, "bh").sortBy("bh").format("parquet").saveAsTable(table)
    spark.createDataFrame(Seq((SigWidth, NBands, baseN)))
      .toDF("sig_width", "n_bands", "base_n")
      .write.mode("overwrite").format("parquet").saveAsTable(metaTableFor(table))
    graft.operators.IndexEpoch.bumpUnconditional(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.catalog.refreshTable(table)
  }

  /** The persisted (sig_width, n_bands, build-time corpus size) of a
    * signature index; None if the meta table does not exist.
    */
  def loadSigMeta(spark: SparkSession, table: String): Option[(Int, Int, Long)] =
    if (!spark.catalog.tableExists(metaTableFor(table))) None
    else {
      // gate appends run through the micro-batch clone session — refresh so a
      // monitoring caller on the ORIGINAL session never reads a stale cached
      // file list (the same relation-cache hazard gateCore guards against)
      spark.catalog.refreshTable(metaTableFor(table))
      spark.table(metaTableFor(table)).collect().headOption
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    }

  /** Fraction of the index's documents appended since it was built — the
    * signature-index counterpart of [[VectorOps.lshIndexStaleness]], and
    * the REBUILD TRIGGER a long-running gate needs: appends keep probes
    * correct (geometry is validated per batch), but every appended doc
    * grows the per-band bucket populations the probe scans, degrading the
    * O(batch × bucket) cost bound the bucketed build sized for. Rebuild
    * ([[writeSigIndex]]) re-buckets the grown corpus and resets the base.
    * Returns 1.0 for an index without meta (unconditionally stale).
    */
  def sigIndexStaleness(spark: SparkSession, table: String): Double =
    loadSigMeta(spark, table) match {
      case None | Some((_, _, 0L)) => 1.0
      case Some((_, _, baseN)) =>
        spark.catalog.refreshTable(table) // see loadSigMeta — appends land via the clone session
        val now = spark.table(table).select("doc_id").distinct().count()
        math.max(0.0, (now - baseN).toDouble / baseN)
    }

  private[streaming] def validateMeta(spark: SparkSession, table: String): Unit = {
    // a rebuild may have overwritten the meta through ANOTHER session
    // (driver-side maintenance beside a streaming gate) — refresh, or this
    // session's relation cache serves the replaced file list and the next
    // batch dies on FILE_NOT_EXIST (the loadSigMeta hazard, at the
    // validation site)
    if (spark.catalog.tableExists(metaTableFor(table)))
      spark.catalog.refreshTable(metaTableFor(table))
    spark.table(metaTableFor(table)).collect().headOption match {
      case Some(r) =>
        require(r.getInt(0) == SigWidth && r.getInt(1) == NBands,
          s"index $table was built with geometry (${r.getInt(0)}, ${r.getInt(1)}), " +
            s"this build expects ($SigWidth, $NBands) — mixed signature geometries corrupt " +
            "the probe; rebuild with writeSigIndex")
      case None =>
        throw new IllegalStateException(
          s"index $table has an empty meta table; rebuild with writeSigIndex")
    }
  }

  /** Core verified check of a banded batch against a banded "at rest"
    * side — pure frame logic, unit-testable with synthetic signatures.
    * Both sides are renamed before the join (`rest_doc` / `in_doc`) so
    * every column reference resolves unambiguously (no reliance on
    * groupBy-alias-vs-child resolution order). Returns one row per
    * flagged batch doc: `(doc_id, dup_of, sig_match)` with the strongest
    * match kept (highest slot agreement, ties to the lowest rest-side
    * doc id).
    *
    * `pairKeep` restricts which (rest, in) pairs count: the index probe
    * excludes self-matches (`rest_doc =!= in_doc` — a re-delivered doc
    * must not flag against itself); the within-batch check keeps only
    * `rest_doc < in_doc` (each doc can flag only against a SMALLER-id
    * sibling, so the min-id member of a near-dup group always survives
    * to be indexed).
    */
  private[graft] def checkAgainst(
      index: DataFrame, batchBanded: DataFrame,
      pairKeep: Column => Column = rest => rest =!= col("in_doc")): DataFrame = {
    val rest = index.select(col("doc_id").as("rest_doc"),
      col("band_id"), col("bh"), col("sig").as("rest_sig"))
    val in = batchBanded
      .select(col("doc_id").as("in_doc"), col("band_id"), col("bh"), col("sig").as("in_sig"))
    rest.join(broadcast(in), Seq("band_id", "bh"))
      .filter(pairKeep(col("rest_doc")))
      .withColumn("sig_match",
        graft.functions.SlotMatch.slot_match(col("rest_sig"), col("in_sig")))
      .filter(col("sig_match") >= DedupOps.MinhashVerifySlots)
      .groupBy(col("in_doc").as("doc_id"))
      .agg(min(struct((lit(SigWidth) - col("sig_match")).as("miss"),
        col("rest_doc").as("dup_of"))).as("best"))
      .select(col("doc_id"), col("best.dup_of"),
        (lit(SigWidth) - col("best.miss")).as("sig_match"))
  }

  /** Within-batch near-dup flags over one banded batch: the batch checked
    * against ITSELF, directional on doc id (only smaller-id siblings can
    * flag a doc), so near-dup siblings arriving TOGETHER resolve to one
    * surviving representative — the min-id member — instead of both
    * passing, closing the gate's documented batch-vs-index-only blind
    * spot when composed ([[gateDecisions]]). In a chain (C≈B≈A, C≉A)
    * this frame's raw `dup_of` points at the strongest verified
    * smaller-id sibling, which may itself be flagged; the composed
    * within-aware paths chase such chains to the surviving
    * representative via [[Survivors.resolve]] (r20 — `sig_match` stays
    * the strongest-match agreement), and only unflagged docs index.
    */
  private[graft] def withinBatchFlags(banded: DataFrame): DataFrame =
    checkAgainst(banded, banded, rest => rest < col("in_doc"))

  /** Index flags and within-batch flags combined: the strongest match per
    * doc across both sources (highest slot agreement, ties to the lowest
    * matched doc id — the [[checkAgainst]] rule re-applied over the
    * union).
    */
  private[graft] def combinedFlags(index: DataFrame, banded: DataFrame): DataFrame =
    checkAgainst(index, banded).unionByName(withinBatchFlags(banded))
      .groupBy("doc_id")
      .agg(min(struct((lit(SigWidth) - col("sig_match")).as("miss"),
        col("dup_of"))).as("best"))
      .select(col("doc_id"), col("best.dup_of"),
        (lit(SigWidth) - col("best.miss")).as("sig_match"))

  /** Flags the batch's near-dups against the persisted index. The batch's
    * distinct band hashes are collected (metadata scale: ≤ 4 × batch
    * rows) into a literal filter so the bucketed scan prunes index files
    * before the verify join.
    */
  def flagDuplicates(spark: SparkSession, batchDocs: DataFrame, table: String): DataFrame = {
    require(spark eq batchDocs.sparkSession,
      "flagDuplicates must run on the batch frame's own session (foreachBatch hands a clone)")
    validateMeta(spark, table)
    // convenience form: fully LAZY (plan inspection / one-shot use) — the
    // batch signatures evaluate twice (bh collect + verify join), bounded
    // by batch size. gateBatch computes them once under a tracked
    // checkpoint and frees the blocks deterministically.
    val banded = DedupOps.bandedSigs(batchDocs)
    checkAgainst(prunedIndexSlice(spark, table, banded), banded)
  }

  /** Ceiling on the number of distinct band-hash literals a batch probe
    * may build (overridable via `graft.dedupGate.maxProbeLiterals`). The
    * probe contract assumes micro-batches are SMALL (band hashes ≤
    * [[NBands]] × batch rows — metadata scale); a mis-deployed gate fed a
    * corpus-sized "batch" would otherwise silently build a multi-million
    * element `isin` filter. Failing loudly here is the guard: the fix is
    * smaller triggers (or the batch clustering path), not a bigger bound.
    */
  val DefaultMaxProbeLiterals = 65536

  /** The index slice the batch can possibly collide with: the batch's
    * distinct band hashes as a literal bucket filter (file pruning) —
    * [[IndexProbe.prunedSlice]] with this gate's policy: band hashes
    * are an OPEN domain, so a dense batch fails loudly instead of
    * falling back to a wider scan.
    */
  private[streaming] def prunedIndexSlice(
      spark: SparkSession, table: String, banded: DataFrame): DataFrame = {
    val bound = IndexProbe.confBound(
      spark, "graft.dedupGate.maxProbeLiterals", DefaultMaxProbeLiterals)
    IndexProbe.prunedSlice(spark, table, banded, "bh", bound, IndexProbe.FailFast(
      s"batch produced more than $bound distinct band hashes — the micro-batch-is-small " +
        "probe contract is broken (a literal filter this size would dominate the plan); " +
        "use smaller triggers or the batch dedup path, or raise graft.dedupGate.maxProbeLiterals"))
  }

  /** Appends the signatures of docs not already at rest — idempotent by
    * doc_id anti-join, the replay-safe form foreachBatch needs (same
    * contract and single-sequential-maintainer assumption as
    * [[VectorOps.appendToLshIndexIdempotent]]). Writes through
    * `insertInto`, so appended files keep the table's bucket spec and
    * probes stay file-pruned after arrival. Returns the number of docs
    * actually appended.
    */
  def appendNewSigsIdempotent(spark: SparkSession, docs: DataFrame, table: String): Long = {
    validateMeta(spark, table)
    appendBandedIdempotent(spark, DedupOps.bandedSigs(docs), table)
  }

  /** [[appendNewSigsIdempotent]] over ALREADY-BANDED rows — the gate's
    * hot path reuses the batch's checkpointed signatures instead of
    * re-shingling and re-hashing the text (meta validation is the
    * caller's, done once per batch).
    */
  private[streaming] def appendBandedIdempotent(
      spark: SparkSession, banded: DataFrame, table: String): Long = {
    import org.apache.spark.sql.GraftShim
    // epoch span start (see [[graft.operators.IndexEpoch]]): before the
    // anti-join reads the at-rest identity set
    val epoch = graft.operators.IndexEpoch.current(spark, table)
    val existing = spark.table(table).select("doc_id").distinct()
    // one tracked evaluation serves both the count and the append, and
    // its blocks free deterministically (not at driver-GC pace)
    val (fresh, freshRdd) = GraftShim.localCheckpointTracked(
      banded.join(existing, Seq("doc_id"), "left_anti"))
    try {
      val n = fresh.select("doc_id").distinct().count()
      if (n > 0) {
        graft.operators.IndexEpoch.bump(spark, table, epoch)
        fresh.write.mode("append").insertInto(table)
        // foreachBatch writes through the micro-batch CLONE session; the
        // caller session's relation cache must not serve the pre-append
        // file list (counts/anti-joins would silently miss the new rows)
        spark.catalog.refreshTable(table)
      }
      n
    } finally GraftShim.releaseCheckpoint(freshRdd)
  }

  /** The full gate as a foreachBatch body: flag the batch against the
    * index, hand the annotated batch to `onBatch` (original columns plus
    * `is_dup`/`dup_of`/`sig_match`), then index the novel docs so LATER
    * batches dedup against them. Call from
    * `stream.writeStream.foreachBatch(DedupGate.gateBatch(table, onBatch) _)`.
    *
    * Session discipline: foreachBatch hands frames owned by the
    * micro-batch CLONE session — all table reads here go through
    * `batch.sparkSession` (mixing frames across sessions breaks the
    * analyzer), and the relation cache is refreshed at entry so every
    * batch sees the appends of the previous one.
    *
    * Cost shape per batch: the text is shingled and minhashed ONCE (the
    * tracked checkpoint serves the bh collect, the verify join, and the
    * novel-doc append), and every checkpoint block frees deterministically
    * before the batch returns — an indefinite stream must not lean on
    * driver-GC-paced block reclamation.
    */
  def gateBatch(table: String,
      onBatch: (DataFrame, Long) => Unit)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = false, onBatch)(batch, batchId)

  /** [[gateBatch]] with the within-batch blind spot CLOSED: in addition
    * to the index probe, each doc is checked against its own batch's
    * smaller-id siblings ([[withinBatchFlags]]), so a batch carrying two
    * near-dup siblings indexes exactly ONE (the min-id member) and flags
    * the other — no upstream composition required. This is the batch body
    * [[StreamMerge.gatedIngestPipeline]] composes; `gateBatch` keeps the
    * original batch-vs-index-only contract for callers that dedup
    * upstream.
    */
  def gateBatchWithinAware(table: String,
      onBatch: (DataFrame, Long) => Unit)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = true, onBatch)(batch, batchId)

  /** [[gateBatchWithinAware]] with per-stage wall timings reported to
    * `onTimings` after each batch — the gate's throughput observability
    * hook (see [[GateStageTimings]] for the stage map). Timing is
    * driver-side `System.nanoTime` around each stage's eager action;
    * overhead is a few clock reads per BATCH, so the instrumented gate is
    * the production gate.
    */
  def gateBatchWithinAwareTimed(table: String,
      onBatch: (DataFrame, Long) => Unit,
      onTimings: GateStageTimings => Unit)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = true, onBatch, onTimings)(batch, batchId)

  private def gateCore(table: String, withinBatch: Boolean,
      onBatch: (DataFrame, Long) => Unit,
      onTimings: GateStageTimings => Unit = _ => ())(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    s.catalog.refreshTable(table)
    validateMeta(s, table)
    import org.apache.spark.sql.GraftShim
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ((banded, bandedRdd), tSig) =
      timed(GraftShim.localCheckpointTracked(DedupOps.bandedSigs(batch)))
    try {
      val rawFlags =
        if (withinBatch) combinedFlags(prunedIndexSlice(s, table, banded), banded)
        else checkAgainst(prunedIndexSlice(s, table, banded), banded)
      val ((flags0, flagsRdd), tProbe) = timed(GraftShim.localCheckpointTracked(rawFlags))
      try {
        // chains only form when the batch checks against ITSELF
        val flags = if (withinBatch) Survivors.resolve(s, flags0, "doc_id") else flags0
        val annotated = batch.join(flags, Seq("doc_id"), "left")
          .withColumn("is_dup", col("dup_of").isNotNull)
        val (_, tSink) = timed(onBatch(annotated, batchId))
        val (appended, tAppend) = timed(appendBandedIdempotent(
          s, banded.join(flags.select("doc_id"), Seq("doc_id"), "left_anti"), table))
        onTimings(GateStageTimings(batchId, tSig, tProbe, tSink, tAppend, appended))
      } finally GraftShim.releaseCheckpoint(flagsRdd)
    } finally GraftShim.releaseCheckpoint(bandedRdd)
  }

  /** foreachBatch body for a stream of INGEST DECISION rows (the
    * [[StreamMerge]] pipeline's `(doc_id, …, decision, …, text)` shape):
    * only rows the upstream gates decided to `insert` are near-dup
    * checked — dropped/duplicate rows are already out and must not pay
    * the signature cost or enter the index. Flagged inserts have their
    * decision REWRITTEN to `near_dup` (with `dup_of`/`sig_match`);
    * surviving inserts index. `onBatch` receives every decision row of
    * the batch, annotated, `text` retained — the [[StreamMerge]]
    * compositions decide its fate (the plain pipeline drops it for the
    * audit log; the scrubbed one redacts the final inserts' text first).
    */
  private[graft] def gateDecisions(table: String,
      onBatch: (DataFrame, Long) => Unit,
      onTimings: GateStageTimings => Unit = _ => ())(batch: DataFrame, batchId: Long): Unit = {
    val inserts = batch.filter(col("decision") === "insert").select("doc_id", "text")
    gateBatchWithinAwareTimed(table, (annotated: DataFrame, id: Long) => {
      val flags = annotated.filter(col("is_dup"))
        .select(col("doc_id"), col("dup_of"), col("sig_match"))
      val out = batch.join(flags, Seq("doc_id"), "left")
        .withColumn("decision",
          when(col("dup_of").isNotNull, "near_dup").otherwise(col("decision")))
      onBatch(out, id)
    }, onTimings)(inserts, batchId)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, VectorOps}

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
  * Contract boundaries: the gate checks batch-vs-INDEX only — two
  * near-dup docs arriving in ONE batch both pass (and both index);
  * compose a within-batch dedup upstream ([[FrameDedup]] /
  * `dropDuplicatesWithinWatermark`) when arrival duplicates matter. The
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

  /** Signature geometry — pinned by [[DedupOps.bandedSigs]] (16 minhash
    * slots in 4 bands of 4) and persisted in the meta table so a future
    * geometry change cannot silently mix widths in one index.
    */
  val SigWidth = 16
  val NBands = 4

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
  }

  private def validateMeta(spark: SparkSession, table: String): Unit =
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

  /** Core verified check of a banded batch against a banded index slice —
    * pure frame logic, unit-testable with synthetic signatures. Returns
    * one row per flagged batch doc: `(doc_id, dup_of, sig_match)` with
    * the strongest match kept (highest slot agreement, ties to the lowest
    * at-rest doc id).
    */
  private[graft] def checkAgainst(index: DataFrame, batchBanded: DataFrame): DataFrame = {
    val in = batchBanded
      .select(col("doc_id").as("in_doc"), col("band_id"), col("bh"), col("sig").as("in_sig"))
    index.join(broadcast(in), Seq("band_id", "bh"))
      .filter(col("doc_id") =!= col("in_doc"))
      .withColumn("sig_match",
        graft.functions.SlotMatch.slot_match(col("sig"), col("in_sig")))
      .filter(col("sig_match") >= DedupOps.MinhashVerifySlots)
      .groupBy(col("in_doc").as("doc_id"))
      .agg(min(struct((lit(SigWidth) - col("sig_match")).as("miss"),
        col("doc_id").as("dup_of"))).as("best"))
      .select(col("doc_id"), col("best.dup_of"),
        (lit(SigWidth) - col("best.miss")).as("sig_match"))
  }

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

  /** The index slice the batch can possibly collide with: the batch's
    * distinct band hashes as a literal bucket filter (file pruning). An
    * empty batch probes a `limit(0)` slice instead of hardcoding a
    * schema — the flags frame keeps the real doc_id type whatever the
    * corpus keys on, so a downstream sink never sees the column type
    * flip on an intermittently empty micro-batch.
    */
  private def prunedIndexSlice(
      spark: SparkSession, table: String, banded: DataFrame): DataFrame = {
    val bhs = banded.select("bh").distinct().collect().map(_.getLong(0))
    if (bhs.isEmpty) spark.table(table).limit(0)
    else spark.table(table).filter(col("bh").isin(bhs.toIndexedSeq: _*))
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
  private def appendBandedIdempotent(
      spark: SparkSession, banded: DataFrame, table: String): Long = {
    import org.apache.spark.sql.GraftShim
    val existing = spark.table(table).select("doc_id").distinct()
    // one tracked evaluation serves both the count and the append, and
    // its blocks free deterministically (not at driver-GC pace)
    val (fresh, freshRdd) = GraftShim.localCheckpointTracked(
      banded.join(existing, Seq("doc_id"), "left_anti"))
    try {
      val n = fresh.select("doc_id").distinct().count()
      if (n > 0) {
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
      onBatch: (DataFrame, Long) => Unit)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    s.catalog.refreshTable(table)
    validateMeta(s, table)
    import org.apache.spark.sql.GraftShim
    val (banded, bandedRdd) = GraftShim.localCheckpointTracked(DedupOps.bandedSigs(batch))
    try {
      val (flags, flagsRdd) = GraftShim.localCheckpointTracked(
        checkAgainst(prunedIndexSlice(s, table, banded), banded))
      try {
        val annotated = batch.join(flags, Seq("doc_id"), "left")
          .withColumn("is_dup", col("dup_of").isNotNull)
        onBatch(annotated, batchId)
        appendBandedIdempotent(
          s, banded.join(flags.select("doc_id"), Seq("doc_id"), "left_anti"), table): Unit
      } finally GraftShim.releaseCheckpoint(flagsRdd)
    } finally GraftShim.releaseCheckpoint(bandedRdd)
  }
}

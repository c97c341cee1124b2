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
  * Contract boundaries: the gate checks batch-vs-INDEX only — two copies
  * of the same novel text arriving in ONE batch both pass (and both
  * index); compose a within-batch dedup upstream ([[FrameDedup]] /
  * `dropDuplicatesWithinWatermark`) when arrival duplicates matter. A
  * REPLAYED batch is flag-stable but re-announced: a re-delivered doc_id
  * is never flagged against itself (self-matches are excluded) and never
  * re-indexed (doc_id anti-join), but `onBatch` does see the rows again —
  * exactly-once OUTPUT is the downstream sink's job, as everywhere in
  * this streaming surface (the FileSink pattern).
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
    VectorOps.clearStaleLocation(spark, metaTableFor(table))
    spark.createDataFrame(Seq((SigWidth, NBands, docs.count())))
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
        expr("size(filter(zip_with(sig, in_sig, (p, q) -> p = q), m -> m))"))
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
    // by batch size. gateBatch uses the tracked form, which computes them
    // once and frees the blocks deterministically.
    val banded = DedupOps.bandedSigs(batchDocs)
    val bhs = banded.select("bh").distinct().collect().map(_.getLong(0))
    if (bhs.isEmpty) spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0L).as("dup_of"), lit(0).as("sig_match")).limit(0)
    else
      checkAgainst(spark.table(table).filter(col("bh").isin(bhs.toIndexedSeq: _*)), banded)
  }

  /** [[flagDuplicates]] with DETERMINISTIC storage release: returns the
    * UNMATERIALIZED flags frame plus a release thunk freeing the banded
    * batch signatures' checkpoint blocks. The caller must materialize
    * (collect / checkpoint / write) BEFORE calling release — the flags
    * lineage reads those blocks. An indefinite stream needs this form:
    * relying on driver-GC-paced ContextCleaner reclamation accumulates
    * one batch of signature blocks per micro-batch in the interim (the
    * same storage-leak class the CC loop's tracked checkpoints exist
    * for).
    */
  private[graft] def flagDuplicatesTracked(
      spark: SparkSession, batchDocs: DataFrame, table: String): (DataFrame, () => Unit) = {
    require(spark eq batchDocs.sparkSession,
      "flagDuplicates must run on the batch frame's own session (foreachBatch hands a clone)")
    validateMeta(spark, table)
    import org.apache.spark.sql.GraftShim
    val (banded, bandedRdd) = GraftShim.localCheckpointTracked(DedupOps.bandedSigs(batchDocs))
    val release = () => GraftShim.releaseCheckpoint(bandedRdd)
    val bhs = banded.select("bh").distinct().collect().map(_.getLong(0))
    if (bhs.isEmpty) {
      val empty = spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("dup_of"), lit(0).as("sig_match")).limit(0)
      (empty, release)
    } else
      (checkAgainst(spark.table(table).filter(col("bh").isin(bhs.toIndexedSeq: _*)), banded),
        release)
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
    import org.apache.spark.sql.GraftShim
    val existing = spark.table(table).select("doc_id").distinct()
    // one tracked evaluation serves both the count and the append, and
    // its blocks free deterministically (not at driver-GC pace)
    val (fresh, freshRdd) = GraftShim.localCheckpointTracked(
      DedupOps.bandedSigs(docs).join(existing, Seq("doc_id"), "left_anti"))
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
    */
  def gateBatch(table: String,
      onBatch: (DataFrame, Long) => Unit)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    s.catalog.refreshTable(table)
    import org.apache.spark.sql.GraftShim
    // tracked checkpoints with explicit release: an indefinite stream
    // must not lean on driver-GC-paced block reclamation (one batch of
    // signature blocks would linger per micro-batch in the interim)
    val (flagsRaw, releaseBanded) = flagDuplicatesTracked(s, batch, table)
    val (flags, flagsRdd) = GraftShim.localCheckpointTracked(flagsRaw)
    releaseBanded() // flags is materialized; the banded blocks are done
    try {
      val annotated = batch.join(flags, Seq("doc_id"), "left")
        .withColumn("is_dup", col("dup_of").isNotNull)
      onBatch(annotated, batchId)
      appendNewSigsIdempotent(
        s, batch.join(flags.select("doc_id"), Seq("doc_id"), "left_anti"), table): Unit
    } finally GraftShim.releaseCheckpoint(flagsRdd)
  }
}

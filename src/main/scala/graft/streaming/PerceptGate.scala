package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{FrameDecoder, AutoFrameDecoder, MultimodalOps, VectorOps}

/** Wall-clock seconds per stage for ONE micro-batch of the perceptual
  * gate — the [[GateStageTimings]] analog at the raster grain:
  *   - `codeSec`: decode + dHash + banding of the batch's image payloads
  *     (the tracked checkpoint of the banded codes);
  *   - `probeSec`: the bucket-pruned index probe + within-batch check
  *     (the flags checkpoint) — must stay FLAT as the index grows;
  *   - `appendSec`: the idempotent code append of unflagged docs.
  * `appended` is the number of docs actually indexed this batch. No
  * sink stage: in the production composition the sink is shared with
  * the text gates and timed there.
  */
final case class PerceptGateTimings(
    batchId: Long, codeSec: Double, probeSec: Double,
    appendSec: Double, appended: Long)

/** Streaming PERCEPTUAL near-duplicate ingest gate: checks each arriving
  * micro-batch of image-kind payloads against a persisted dHash code
  * index and flags perceptual dups BEFORE they enter the corpus — the
  * online form of [[graft.operators.MultimodalOps]]' batch
  * `multimodal_neardup`, and the missing family-matrix cell (r18
  * verdict task 1): text had online gates for exact (watermarked
  * dedup), near-dup ([[DedupGate]]), contamination ([[SpanGate]]) and
  * quality ([[CharLmGate]]); images had only the batch clustering run,
  * so duplicate images ingested freely between runs. Reference anchor:
  * the nearest-match archetype of `src/ansi.tpp:351-363` (A28) at the
  * raster grain, online.
  *
  * Signatures come from the SAME lean decode pass as the batch keys
  * ([[MultimodalOps.perceptualCodes]]: decode → 65-bin pooled profile →
  * 64-bit dHash, degenerate profiles emit nothing), so online and batch
  * verdicts can never drift. Banding is the SAME 4×16-bit pigeonhole as
  * [[graft.operators.DedupOps.hammingPairsScored]]: a pair within
  * hamming ≤ [[MaxHamming]] (3) disturbs at most 3 bands, so one band
  * always collides exact — candidates come from a (band_id, bk)
  * equi-join against only the index buckets the batch's own band keys
  * touch, then the true `bit_count(xor)` verifies before any flag.
  *
  * Index layout: `(doc_id, band_id, bk, code)` — 4 rows per doc —
  * written as a parquet table BUCKETED BY `bk` (the session must set
  * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`, same
  * as every other persisted probe; asserted in BucketingSpec). Meta
  * `(n_bands, band_bits, max_hamming, base_n)` validates geometry per
  * batch; the epoch table fences concurrent maintainers exactly like
  * [[DedupGate]]'s index ([[graft.operators.IndexEpoch]]).
  *
  * Scale shape (100 TB): per batch the index contributes only the
  * buckets the batch's band keys land in; the batch side is BROADCAST
  * (micro-batches are small by contract); the probe ships 16 bytes of
  * code per doc — never pixels, never frame arrays (the decode emits
  * `(doc_id, code)` and the payload bytes stay in their arrival
  * partition). One difference from [[DedupGate]]'s probe: band keys
  * live in a CLOSED 16-bit domain, so a dense batch legitimately
  * touches most of it — above [[DefaultMaxProbeLiterals]] distinct
  * keys the probe switches from an `isin` literal bucket filter to a
  * broadcast semi-join (the SpanGate lesson: a many-thousand-literal
  * filter costs seconds of per-batch driver analysis while pruning
  * nothing once every bucket is hit).
  *
  * Dedup policy, contract boundaries, replay semantics: identical to
  * [[DedupGate]] — novel docs index (idempotently, at-least-once-safe),
  * flagged docs are annotated not dropped, [[gateBatch]] is
  * batch-vs-index only, [[gateBatchWithinAware]] also resolves
  * within-batch sibling pairs to the min-id representative, and
  * near-dup siblings that first arrived together will flag against each
  * other on replay (annotations advisory under replay; the INDEX is
  * replay-stable). Degenerate payloads (flat rasters — see
  * [[MultimodalOps.dHashCodeOpt]]) carry no code: never flagged, never
  * indexed, so a flood of icons cannot chain the index into one vacuous
  * near-dup class.
  */
object PerceptGate {

  /** Banding geometry — fixed by the pigeonhole argument (4 × 16-bit
    * bands guarantee recall for hamming ≤ 3) and persisted in the meta
    * table so an index from a different geometry fails validation
    * instead of silently mixing code layouts.
    */
  val NBands = 4
  val BandBits = 16
  val MaxHamming = 3

  private[graft] def metaTableFor(table: String): String = table + "_meta"

  /** The 4×16-bit banded rows `(doc_id, band_id, bk, code)` of a
    * `(doc_id, simhash)` code frame ([[MultimodalOps.perceptualCodes]]'
    * output shape) — the same split [[graft.operators.DedupOps
    * .hammingPairsScored]] banding uses, at rest.
    */
  private[graft] def bandedCodes(codes: DataFrame): DataFrame =
    codes.select(col("doc_id"), col("simhash").as("code"),
      explode(expr(
        s"""transform(sequence(0, ${NBands - 1}), j -> struct(j AS band_id,
           |  shiftright(simhash, j * $BandBits) & 65535 AS bk))""".stripMargin)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.bk"), col("code"))

  /** Builds (overwrites) the code index from a seed corpus of
    * `(doc_id, payload: BINARY)` rows, plus its validation meta table.
    * Docs whose payload yields no code (empty/degenerate profile) are
    * simply absent — they can never flag and never collide.
    */
  def writeCodeIndex(spark: SparkSession, payloads: DataFrame, table: String,
      nBuckets: Int = 16, decoder: FrameDecoder = AutoFrameDecoder): Unit = {
    VectorOps.clearStaleLocation(spark, table)
    bandedCodes(MultimodalOps.perceptualCodes(spark, payloads, decoder))
      .write.mode("overwrite").bucketBy(nBuckets, "bk").sortBy("bk")
      .format("parquet").saveAsTable(table)
    val baseN = spark.table(table).select("doc_id").distinct().count()
    VectorOps.clearStaleLocation(spark, metaTableFor(table))
    spark.createDataFrame(Seq((NBands, BandBits, MaxHamming, baseN)))
      .toDF("n_bands", "band_bits", "max_hamming", "base_n")
      .write.mode("overwrite").format("parquet").saveAsTable(metaTableFor(table))
    graft.operators.IndexEpoch.bumpUnconditional(spark, table)
  }

  /** In-place rebuild FROM THE INDEX'S OWN ROWS — the compaction a
    * long-running gate performs when [[codeIndexStaleness]] crosses its
    * threshold (each append lands small file slivers; the rebuild
    * re-buckets into `nBuckets` tidy sorted files and resets `base_n`).
    * Codes are all the index holds, so the rebuild needs no payloads.
    * Mechanics and fencing are [[DedupGate.rebuildSigIndex]]'s: stage
    * through `<table>_rebuild`, write back, unconditional epoch bump
    * (in-flight appenders fail their commit), drop staging.
    */
  def rebuildCodeIndex(spark: SparkSession, table: String, nBuckets: Int = 16): Unit = {
    validateMeta(spark, table)
    spark.catalog.refreshTable(table)
    val staging = table + "_rebuild"
    VectorOps.clearStaleLocation(spark, staging)
    spark.table(table).write.mode("overwrite")
      .bucketBy(nBuckets, "bk").sortBy("bk").format("parquet").saveAsTable(staging)
    val baseN = spark.table(staging).select("doc_id").distinct().count()
    spark.table(staging).write.mode("overwrite")
      .bucketBy(nBuckets, "bk").sortBy("bk").format("parquet").saveAsTable(table)
    spark.createDataFrame(Seq((NBands, BandBits, MaxHamming, baseN)))
      .toDF("n_bands", "band_bits", "max_hamming", "base_n")
      .write.mode("overwrite").format("parquet").saveAsTable(metaTableFor(table))
    graft.operators.IndexEpoch.bumpUnconditional(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.catalog.refreshTable(table)
  }

  /** The persisted geometry + build-time corpus size; None without meta. */
  def loadCodeMeta(spark: SparkSession, table: String): Option[(Int, Int, Int, Long)] =
    if (!spark.catalog.tableExists(metaTableFor(table))) None
    else {
      spark.catalog.refreshTable(metaTableFor(table))
      spark.table(metaTableFor(table)).collect().headOption
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    }

  /** Fraction of the index's docs appended since it was built — the
    * rebuild trigger, exactly [[DedupGate.sigIndexStaleness]]'s formula
    * (appends keep probes correct; they just grow the per-bucket
    * populations the probe scans). 1.0 without meta.
    */
  def codeIndexStaleness(spark: SparkSession, table: String): Double =
    loadCodeMeta(spark, table) match {
      case None | Some((_, _, _, 0L)) => 1.0
      case Some((_, _, _, baseN)) =>
        spark.catalog.refreshTable(table)
        val now = spark.table(table).select("doc_id").distinct().count()
        math.max(0.0, (now - baseN).toDouble / baseN)
    }

  private[graft] def validateMeta(spark: SparkSession, table: String): Unit = {
    if (spark.catalog.tableExists(metaTableFor(table)))
      spark.catalog.refreshTable(metaTableFor(table))
    spark.table(metaTableFor(table)).collect().headOption match {
      case Some(r) =>
        require(r.getInt(0) == NBands && r.getInt(1) == BandBits && r.getInt(2) == MaxHamming,
          s"index $table was built with geometry (${r.getInt(0)}, ${r.getInt(1)}, " +
            s"${r.getInt(2)}), this build expects ($NBands, $BandBits, $MaxHamming) — " +
            "mixed banding corrupts the probe; rebuild with writeCodeIndex")
      case None =>
        throw new IllegalStateException(
          s"index $table has an empty meta table; rebuild with writeCodeIndex")
    }
  }

  /** Verified hamming check of a banded batch against a banded at-rest
    * side — [[DedupGate.checkAgainst]] with `bit_count(xor)` in place of
    * slot agreement. One row per flagged batch doc: `(doc_id, dup_of,
    * hamming)`, strongest match kept (lowest true hamming, ties to the
    * lowest rest-side id). `pairKeep` carries the same two policies:
    * self-match exclusion for the index probe, `rest < in` direction
    * for the within-batch check.
    */
  private[graft] def checkAgainst(
      index: DataFrame, batchBanded: DataFrame,
      pairKeep: Column => Column = rest => rest =!= col("in_doc")): DataFrame = {
    val rest = index.select(col("doc_id").as("rest_doc"),
      col("band_id"), col("bk"), col("code").as("rest_code"))
    val in = batchBanded
      .select(col("doc_id").as("in_doc"), col("band_id"), col("bk"), col("code").as("in_code"))
    rest.join(broadcast(in), Seq("band_id", "bk"))
      .filter(pairKeep(col("rest_doc")))
      .withColumn("hamming", expr("bit_count(rest_code ^ in_code)"))
      .filter(col("hamming") <= MaxHamming)
      .groupBy(col("in_doc").as("doc_id"))
      .agg(min(struct(col("hamming"), col("rest_doc").as("dup_of"))).as("best"))
      .select(col("doc_id"), col("best.dup_of"), col("best.hamming"))
  }

  /** Within-batch perceptual flags, directional on doc id — siblings
    * arriving together resolve to one surviving (min-id) representative
    * when composed ([[gateBatchWithinAware]] / the production chain);
    * the composed paths also chase `dup_of` CHAINS (C near B near A
    * with C far from A) to that representative via
    * [[Survivors.resolve]] (r20 — `hamming` stays the strongest-match
    * distance).
    */
  private[graft] def withinBatchFlags(banded: DataFrame): DataFrame =
    checkAgainst(banded, banded, rest => rest < col("in_doc"))

  /** Index flags ∪ within-batch flags, strongest match per doc. */
  private[graft] def combinedFlags(index: DataFrame, banded: DataFrame): DataFrame =
    checkAgainst(index, banded).unionByName(withinBatchFlags(banded))
      .groupBy("doc_id")
      .agg(min(struct(col("hamming"), col("dup_of"))).as("best"))
      .select(col("doc_id"), col("best.dup_of"), col("best.hamming"))

  /** Above this many distinct batch band keys the probe abandons the
    * `isin` literal bucket filter for a broadcast semi-join: `bk` lives
    * in a CLOSED 65536-value domain, so unlike [[DedupGate]]'s
    * open-domain hashes a dense batch is legal — and a ~10k-literal
    * filter costs seconds of driver analysis per batch while pruning
    * nothing once most buckets are hit (the r15 span-probe lesson).
    */
  val DefaultMaxProbeLiterals = 2048

  /** The index slice the batch can collide with. Sparse batches prune
    * index FILES via a literal bucket filter; dense batches (> the
    * literal cap) filter via a broadcast semi-join on the same keys;
    * empty batches probe a `limit(0)` slice (keeps column types stable
    * for downstream sinks on intermittently empty micro-batches).
    */
  private[streaming] def prunedIndexSlice(
      spark: SparkSession, table: String, banded: DataFrame): DataFrame =
    IndexProbe.prunedSlice(spark, table, banded, "bk",
      DefaultMaxProbeLiterals, IndexProbe.BroadcastSemiJoin)

  /** Flags the batch's perceptual dups against the persisted index —
    * the lazy convenience form ([[DedupGate.flagDuplicates]]'s stance):
    * plan inspection / one-shot use; the gate bodies checkpoint.
    */
  def flagDuplicates(spark: SparkSession, payloads: DataFrame, table: String,
      decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    require(spark eq payloads.sparkSession,
      "flagDuplicates must run on the batch frame's own session (foreachBatch hands a clone)")
    validateMeta(spark, table)
    val banded = bandedCodes(MultimodalOps.perceptualCodes(spark, payloads, decoder))
    checkAgainst(prunedIndexSlice(spark, table, banded), banded)
  }

  /** Appends the codes of docs not already at rest — idempotent by
    * doc_id anti-join under the epoch guard, the replay-safe
    * foreachBatch form ([[DedupGate.appendNewSigsIdempotent]]'s
    * contract). `insertInto` keeps the bucket spec, so probes stay
    * file-pruned after arrival. Returns docs actually appended.
    */
  def appendNewCodesIdempotent(spark: SparkSession, payloads: DataFrame, table: String,
      decoder: FrameDecoder = AutoFrameDecoder): Long = {
    validateMeta(spark, table)
    appendBandedIdempotent(spark,
      bandedCodes(MultimodalOps.perceptualCodes(spark, payloads, decoder)), table)
  }

  /** [[appendNewCodesIdempotent]] over ALREADY-BANDED rows — the gate's
    * hot path reuses the batch's checkpointed codes (meta validation is
    * the caller's, once per batch).
    */
  private[graft] def appendBandedIdempotent(
      spark: SparkSession, banded: DataFrame, table: String): Long = {
    import org.apache.spark.sql.GraftShim
    val epoch = graft.operators.IndexEpoch.current(spark, table)
    val existing = spark.table(table).select("doc_id").distinct()
    val (fresh, freshRdd) = GraftShim.localCheckpointTracked(
      banded.join(existing, Seq("doc_id"), "left_anti"))
    try {
      val n = fresh.select("doc_id").distinct().count()
      if (n > 0) {
        graft.operators.IndexEpoch.bump(spark, table, epoch)
        fresh.select("doc_id", "band_id", "bk", "code") // insertInto is POSITIONAL
          .write.mode("append").insertInto(table)
        spark.catalog.refreshTable(table)
      }
      n
    } finally GraftShim.releaseCheckpoint(freshRdd)
  }

  /** The full gate as a foreachBatch body over `(doc_id, payload, …)`
    * micro-batches: flag against the index, hand the annotated batch
    * (original columns + `is_dup`/`dup_of`/`hamming`) to `onBatch`,
    * index the novel codes. Batch-vs-index only — compose a
    * within-batch dedup upstream or use [[gateBatchWithinAware]].
    */
  def gateBatch(table: String,
      onBatch: (DataFrame, Long) => Unit,
      decoder: FrameDecoder = AutoFrameDecoder)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = false, onBatch, decoder = decoder)(batch, batchId)

  /** [[gateBatch]] with the within-batch blind spot closed: sibling
    * dups arriving together index exactly ONE (min-id) member.
    */
  def gateBatchWithinAware(table: String,
      onBatch: (DataFrame, Long) => Unit,
      decoder: FrameDecoder = AutoFrameDecoder)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = true, onBatch, decoder = decoder)(batch, batchId)

  /** [[gateBatchWithinAware]] with per-stage wall timings. */
  def gateBatchWithinAwareTimed(table: String,
      onBatch: (DataFrame, Long) => Unit,
      onTimings: PerceptGateTimings => Unit,
      decoder: FrameDecoder = AutoFrameDecoder)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = true, onBatch, onTimings, decoder)(batch, batchId)

  private def gateCore(table: String, withinBatch: Boolean,
      onBatch: (DataFrame, Long) => Unit,
      onTimings: PerceptGateTimings => Unit = _ => (),
      decoder: FrameDecoder = AutoFrameDecoder)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    s.catalog.refreshTable(table)
    validateMeta(s, table)
    import org.apache.spark.sql.GraftShim
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ((banded, bandedRdd), tCode) = timed(GraftShim.localCheckpointTracked(
      bandedCodes(MultimodalOps.perceptualCodes(s,
        batch.select("doc_id", "payload"), decoder))))
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
        onBatch(annotated, batchId)
        val (appended, tAppend) = timed(appendBandedIdempotent(
          s, banded.join(flags.select("doc_id"), Seq("doc_id"), "left_anti"), table))
        onTimings(PerceptGateTimings(batchId, tCode, tProbe, tAppend, appended))
      } finally GraftShim.releaseCheckpoint(flagsRdd)
    } finally GraftShim.releaseCheckpoint(bandedRdd)
  }
}

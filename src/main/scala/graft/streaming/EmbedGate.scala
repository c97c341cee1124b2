package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.operators.VectorOps
import graft.functions.FloatDot.float_dot
import graft.functions.LshBucket.lsh_bucket

/** Wall-clock seconds per stage for ONE micro-batch of the embedding
  * gate — the [[PerceptGateTimings]] analog at the vector grain:
  * `sigSec` is the signature pass (norm + LSH bucket of the batch),
  * `probeSec` the bucket-pruned index probe + within-batch check,
  * `appendSec` the idempotent index append of unflagged novel vectors.
  * `appended` is the number of vectors actually indexed this batch.
  */
final case class EmbedGateTimings(
    batchId: Long, sigSec: Double, probeSec: Double,
    appendSec: Double, appended: Long)

/** Streaming EMBEDDING near-duplicate ingest gate: checks each arriving
  * micro-batch of `(vec_id, embedding)` rows against the PERSISTED LSH
  * signature index ([[VectorOps.writeLshIndex]] /
  * [[VectorOps.writeLshIndexFrom]]) and flags cosine near-dups BEFORE
  * they enter the vector corpus — the online form of the batch
  * `embed_neardup_lsh` key, and the embedding member of the online gate
  * family (exact → watermarked dedup, token near-dup → [[DedupGate]],
  * substring → [[SpanGate]], quality → [[CharLmGate]], perceptual →
  * [[PerceptGate]]; until now an embedding flood reached the ANN index
  * unflagged between batch clustering runs).
  *
  * ONE ARTIFACT, TWO CONSUMERS: the gate probes the SAME bucketed
  * `(vec_id, embedding, nrm, bucket)` table the ANN-search family
  * probes (`ann_lsh_indexed`) and the same table
  * [[VectorOps.lshIndexMaintenance]] appends to — no second index to
  * build, no drift between "what search sees" and "what the gate knows".
  * [[gatedIndexMaintenance]] is therefore `lshIndexMaintenance` upgraded
  * in place: novel vectors append exactly as before (the same
  * [[VectorOps.appendToLshIndexIdempotent]] call — gated and ungated
  * maintenance write byte-identical rows, except zero-norm arrivals,
  * which the gate declines to index at all — see the degenerate policy
  * below), near-dup arrivals are flagged to the caller and kept OUT, so
  * the index stops accumulating duplicate vectors (which would
  * otherwise waste probe candidates and skew every downstream top-k
  * toward the duplicated direction).
  *
  * Candidate rule: EXACT bucket agreement — the same rule as the batch
  * `embed_neardup_lsh` frame (`VectorOps.embedNeardupLshFrame`), so an
  * online verdict is a batch verdict restricted to (arrival, at-rest)
  * pairs; flags are then gated by TRUE cosine ≥ `threshold`, never by
  * the signature alone. Recall is the family's documented probabilistic
  * contract — a pair at cosine s shares all nBits hyperplane signs with
  * probability (1 − θ/π)^nBits ≈ 1 as s → 1 (measured against brute
  * force in DedupSpec) — unlike the minhash/simhash/dHash gates there
  * is no pigeonhole floor, which is the standard LSH trade for
  * gating a continuous similarity. Threshold is a GATE parameter, not
  * an index property: the index stores raw signatures + embeddings, so
  * one index serves ANN search and any number of gate thresholds
  * (default 0.9 — the near-dup regime for real embedding corpora; the
  * declared batch key's 0.3 is that near-random test corpus's far-tail
  * setting).
  *
  * Scale shape (100 TB): the batch side is BROADCAST (micro-batches are
  * small by contract); the index contributes only the buckets the
  * batch's own signatures land in (literal bucket filter → FILE pruning
  * under the bucketed layout, or a broadcast semi-join above
  * [[DefaultMaxProbeLiterals]] distinct keys — [[PerceptGate]]'s dense
  * fallback); per-bucket populations are held at ~32 by
  * `VectorOps.bitsFor`, so each probe scans O(|batch| · 32) vectors.
  * A near-dup FLOOD is self-limiting: the first member indexes, every
  * later member flags against it and is kept out, so the hot bucket
  * never grows past the flood's representative — the online analog of
  * the batch frame's hot-bucket star guard.
  *
  * Degenerate policy (the [[graft.operators.MultimodalOps.dHashCodeOpt]]
  * analog, completed r20): a ZERO-NORM embedding carries no direction,
  * so its cosine is 0/0 — and Spark orders NaN ABOVE every number, so
  * an unguarded `sim >= threshold` would flag a zero vector against
  * everything in its bucket. Zero-norm rows are excluded from BOTH
  * probe sides (never flagged, never flagged-against) and are NOT
  * indexed either: all zero vectors hash to the same bucket, so a
  * zero-vector flood — the one duplicate class cosine cannot
  * self-limit — would otherwise grow a dead hot bucket that every
  * probe of that bucket scans. They are instead flagged to the caller
  * via `is_degenerate` (route them to an audit sink like flagged
  * dups); this is the one arrival class where gated and ungated
  * maintenance diverge — the ungated maintainer indexes whatever it is
  * fed.
  *
  * Dedup policy, contract boundaries, replay semantics: identical to
  * [[DedupGate]]/[[PerceptGate]] — novel vectors index (idempotently,
  * at-least-once-safe via the epoch-guarded anti-join append), flagged
  * vectors are annotated not dropped, [[gateBatch]] is batch-vs-index
  * only, [[gateBatchWithinAware]] also resolves within-batch siblings
  * to the surviving representative — `dup_of` chains are chased
  * (A<B<C with C's strongest match B gives BOTH B and C `dup_of` = A,
  * the vector actually at rest; `sim` stays the measured strongest-
  * match similarity), exact in batch-only arrivals because
  * within-batch edges strictly decrease vec_id; under REPLAY (rows
  * already at rest flagging each other) chains can cycle and the chase
  * stops at the cycle edge — annotations are advisory under replay
  * anyway, while the INDEX is replay-stable.
  */
object EmbedGate {

  /** Default cosine flag threshold — the near-dup regime. */
  val DefaultThreshold = 0.9

  /** Above this many distinct batch bucket keys the probe abandons the
    * literal `isin` bucket filter for a broadcast semi-join — the
    * [[PerceptGate.DefaultMaxProbeLiterals]] rationale (a many-thousand
    * literal filter costs seconds of driver analysis while pruning
    * little once most buckets are touched).
    */
  val DefaultMaxProbeLiterals = 2048

  /** The index's signature width, from its meta table — REQUIRED: the
    * gate computes batch signatures itself, and a width mismatch against
    * the at-rest buckets would silently miss every near-dup. Refreshes
    * the meta relation first (a cross-process rebuild may have changed
    * it — the [[CharLmGate]] lesson).
    */
  private[graft] def requireNBits(spark: SparkSession, table: String): Int = {
    val meta = VectorOps.metaTableFor(table)
    if (spark.catalog.tableExists(meta)) spark.catalog.refreshTable(meta)
    VectorOps.loadLshMeta(spark, table).map(_._1).getOrElse(throw new IllegalStateException(
      s"index $table has no meta table, so its signature width cannot be read — " +
        "the gate would probe with a mismatched width; rebuild with writeLshIndex"))
  }

  /** Batch-side signatures `(vec_id, embedding, nrm, bucket)` — the same
    * projection the index holds at rest (`VectorOps.withLshBucket`'s
    * shape), computed with the index's OWN nBits.
    */
  private[graft] def withSigs(batch: DataFrame, nBits: Int): DataFrame =
    batch.select(col("vec_id"), col("embedding"),
      sqrt(float_dot(col("embedding"), col("embedding"))).as("nrm"),
      lsh_bucket(col("embedding"), nBits).as("bucket"))

  /** Verified cosine check of batch signatures against an at-rest side:
    * exact-bucket candidates, true-cosine ≥ `threshold` verify, one row
    * per flagged batch vector `(vec_id, dup_of, sim)` — strongest match
    * kept (highest sim, ties to the lowest at-rest id). `pairKeep`
    * carries the two policies: self-exclusion for the index probe (a
    * REPLAYED batch's rows are already at rest and must not flag
    * against themselves), `rest < in` direction for the within-batch
    * check. Zero-norm rows are excluded on both sides (see the
    * degenerate policy above — NaN would otherwise flag).
    */
  private[graft] def checkAgainst(
      index: DataFrame, batchSigs: DataFrame, threshold: Double,
      pairKeep: Column => Column = rest => rest =!= col("in_id")): DataFrame = {
    val rest = index.filter(col("nrm") > 0).select(col("vec_id").as("rest_id"),
      col("embedding").as("rest_emb"), col("nrm").as("rest_nrm"), col("bucket"))
    val in = batchSigs.filter(col("nrm") > 0)
      .select(col("vec_id").as("in_id"), col("embedding").as("in_emb"),
        col("nrm").as("in_nrm"), col("bucket"))
    rest.join(broadcast(in), Seq("bucket"))
      .filter(pairKeep(col("rest_id")))
      .withColumn("sim",
        float_dot(col("rest_emb"), col("in_emb")) / (col("rest_nrm") * col("in_nrm")))
      .filter(col("sim") >= threshold)
      .groupBy(col("in_id").as("vec_id"))
      .agg(min(struct(negate(col("sim")).as("nsim"), col("rest_id").as("dup_of"))).as("best"))
      .select(col("vec_id"), col("best.dup_of"), negate(col("best.nsim")).as("sim"))
  }

  /** Within-batch flags, directional on vec_id — siblings arriving
    * together resolve to one surviving (min-id) representative.
    */
  private[graft] def withinBatchFlags(sigs: DataFrame, threshold: Double): DataFrame =
    checkAgainst(sigs, sigs, threshold, rest => rest < col("in_id"))

  /** Index flags ∪ within-batch flags, strongest match per vector. */
  private[graft] def combinedFlags(
      index: DataFrame, sigs: DataFrame, threshold: Double): DataFrame =
    checkAgainst(index, sigs, threshold).unionByName(withinBatchFlags(sigs, threshold))
      .groupBy("vec_id")
      .agg(min(struct(negate(col("sim")).as("nsim"), col("dup_of"))).as("best"))
      .select(col("vec_id"), col("best.dup_of"), negate(col("best.nsim")).as("sim"))

  /** `dup_of` chains chased to the SURVIVING representative — the
    * shared [[Survivors.resolve]] walk (see its doc for the
    * termination and replay-cycle contract); `sim` is left as measured
    * against the strongest match.
    */
  private[graft] def resolveToSurvivors(
      spark: SparkSession, flags: DataFrame): DataFrame =
    Survivors.resolve(spark, flags, "vec_id")

  /** The index slice the batch can collide with — [[PerceptGate]]'s
    * probe shape over the `bucket` key: sparse batches prune index
    * FILES via a literal bucket filter, dense batches filter via a
    * broadcast semi-join, empty batches probe a `limit(0)` slice.
    */
  private[streaming] def prunedIndexSlice(
      spark: SparkSession, table: String, sigs: DataFrame): DataFrame =
    IndexProbe.prunedSlice(spark, table, sigs, "bucket",
      DefaultMaxProbeLiterals, IndexProbe.BroadcastSemiJoin)

  /** Flags the batch's cosine near-dups against the persisted index —
    * the lazy convenience form for plan inspection / one-shot use; the
    * gate bodies checkpoint. Probe sessions need the documented
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` for
    * the bucket filter to prune files.
    */
  def flagDuplicates(spark: SparkSession, vectors: DataFrame, table: String,
      threshold: Double = DefaultThreshold): DataFrame = {
    require(spark eq vectors.sparkSession,
      "flagDuplicates must run on the batch frame's own session (foreachBatch hands a clone)")
    val sigs = withSigs(vectors, requireNBits(spark, table))
    checkAgainst(prunedIndexSlice(spark, table, sigs), sigs, threshold)
  }

  /** The full gate as a foreachBatch body over `(vec_id, embedding, …)`
    * micro-batches: flag against the index, hand the annotated batch
    * (original columns + `is_dup`/`dup_of`/`sim`) to `onBatch`, index
    * the novel unflagged vectors through the SAME
    * [[VectorOps.appendToLshIndexIdempotent]] the ungated maintenance
    * path uses. Batch-vs-index only — use [[gateBatchWithinAware]] to
    * also resolve siblings arriving together.
    */
  def gateBatch(table: String,
      onBatch: (DataFrame, Long) => Unit,
      threshold: Double = DefaultThreshold)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = false, onBatch, threshold)(batch, batchId)

  /** [[gateBatch]] with the within-batch blind spot closed: sibling
    * near-dups arriving together index exactly ONE (min-id) member.
    */
  def gateBatchWithinAware(table: String,
      onBatch: (DataFrame, Long) => Unit,
      threshold: Double = DefaultThreshold)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = true, onBatch, threshold)(batch, batchId)

  /** [[gateBatchWithinAware]] with per-stage wall timings. */
  def gateBatchWithinAwareTimed(table: String,
      onBatch: (DataFrame, Long) => Unit,
      onTimings: EmbedGateTimings => Unit,
      threshold: Double = DefaultThreshold)(batch: DataFrame, batchId: Long): Unit =
    gateCore(table, withinBatch = true, onBatch, threshold, onTimings)(batch, batchId)

  private def gateCore(table: String, withinBatch: Boolean,
      onBatch: (DataFrame, Long) => Unit, threshold: Double,
      onTimings: EmbedGateTimings => Unit = _ => ())(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    s.catalog.refreshTable(table)
    val nBits = requireNBits(s, table)
    import org.apache.spark.sql.GraftShim
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ((sigs, sigsRdd), tSig) = timed(GraftShim.localCheckpointTracked(
      withSigs(batch.select("vec_id", "embedding"), nBits)))
    try {
      val rawFlags =
        if (withinBatch) combinedFlags(prunedIndexSlice(s, table, sigs), sigs, threshold)
        else checkAgainst(prunedIndexSlice(s, table, sigs), sigs, threshold)
      val ((flags0, flagsRdd), tProbe) = timed(GraftShim.localCheckpointTracked(rawFlags))
      try {
        // chains only form when the batch checks against ITSELF; the
        // resolved frame is a local relation read off the checkpoint
        val flags = if (withinBatch) resolveToSurvivors(s, flags0) else flags0
        val annotated = batch.join(flags, Seq("vec_id"), "left")
          .join(sigs.select(col("vec_id"), (col("nrm") === 0).as("is_degenerate")),
            Seq("vec_id"), "left")
          .withColumn("is_dup", col("dup_of").isNotNull)
        onBatch(annotated, batchId)
        // degenerate (zero-norm) arrivals never index — see the policy
        // in the object doc: they all share one bucket and cosine
        // cannot self-limit a flood of them
        val (appended, tAppend) = timed(VectorOps.appendToLshIndexIdempotent(s,
          sigs.filter(col("nrm") > 0)
            .join(flags.select("vec_id"), Seq("vec_id"), "left_anti")
            .select("vec_id", "embedding"),
          table, nBits))
        onTimings(EmbedGateTimings(batchId, tSig, tProbe, tAppend, appended))
      } finally GraftShim.releaseCheckpoint(flagsRdd)
    } finally GraftShim.releaseCheckpoint(sigsRdd)
  }

  /** [[VectorOps.lshIndexMaintenance]] upgraded to dedup-aware
    * maintenance — the production composition: wires a `(vec_id,
    * embedding)` stream into per-batch gating, with novel vectors
    * appended through the same idempotent epoch-guarded path (so the
    * artifact stays byte-compatible with the ungated maintainer and
    * with `ann_lsh_indexed`'s probes) and every batch's annotated rows
    * handed to `onBatch` (flagged arrivals carry `dup_of`/`sim` — route
    * them to an audit sink, don't lose them).
    */
  def gatedIndexMaintenance(vectors: DataFrame, table: String,
      onBatch: (DataFrame, Long) => Unit,
      threshold: Double = DefaultThreshold): DataStreamWriter[Row] =
    vectors.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch(gateBatchWithinAware(table, onBatch, threshold) _)
}

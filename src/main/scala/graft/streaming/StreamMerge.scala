package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming corpus merge — the stream-static join form of the batch
  * `corpus_merge` key: a live document feed is classified against a
  * STATIC corpus hash index (`h`, `existing_id`) as it arrives —
  * `insert` for unseen content, `skip_dup` with the existing canonical
  * id for content the corpus already holds.
  *
  * Stream-static joins are stateless on the stream side (each micro-batch
  * joins against the static relation; nothing accumulates in the state
  * store), so this scales with the batch size, not the stream history —
  * the right shape for continuous ingestion against a large frozen
  * corpus snapshot. Within-batch self-duplicates are NOT collapsed here
  * (that needs stream state — compose [[FrameDedup]]-style
  * `dropDuplicatesWithinWatermark` on `h` upstream if required);
  * the batch `corpus_merge` remains the full-semantics consolidation.
  */
object StreamMerge {

  /** `docs` is a streaming frame with (doc_id, text); `baseIndex` is the
    * static (h, existing_id) corpus index, e.g.
    * `base.groupBy(md5(text) as h).agg(min(doc_id) as existing_id)`.
    */
  def stream(docs: DataFrame, baseIndex: DataFrame): DataFrame =
    docs
      .withColumn("h", md5(col("text")))
      .join(baseIndex, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        when(col("existing_id").isNull, "insert").otherwise("skip_dup").as("action"),
        col("existing_id"))

  /** The full streaming ingestion pipeline: within-stream content dedup
    * (first arrival per hash wins, state bounded by the watermark — the
    * streaming reading of batch `corpus_merge`'s batch-canonical rule)
    * THEN stream-static classification against the frozen corpus.
    * `docs` must carry an event-time column `ts` for the watermark.
    */
  def dedupedStream(
      docs: DataFrame, baseIndex: DataFrame,
      delayThreshold: String = Reassembly.DefaultTtl): DataFrame =
    docs
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("h")
      .join(baseIndex, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        when(col("existing_id").isNull, "insert").otherwise("skip_dup").as("action"),
        col("existing_id"))

  /** The COMPLETE streaming ingestion pipeline in ONE query — the
    * streaming composition of the batch `corpus_filter` → `corpus_merge`
    * pair: within-stream content dedup (watermark-bounded state, first
    * arrival per hash wins — the streaming reading of the batch
    * min-id-canonical rule) → the SAME quality gate as `corpus_filter`
    * ([[graft.operators.TextOps.withQualityScore]], so the stream cannot
    * drift from the batch formula; same `short` < `quality` precedence
    * and thresholds) → stream-static classification against the frozen
    * corpus index. Every surviving document emits exactly one decision
    * row: `short` / `quality` (gated out), `skip_dup` + canonical id
    * (corpus already holds the content), or `insert`.
    *
    * Scale shape: quality scoring is stateless Column algebra on the
    * stream side; the only stream state is the watermark-bounded dedup
    * hash set; the static index joins per micro-batch (broadcast when it
    * fits, else a co-partitioned hash join) — nothing here accumulates
    * with stream HISTORY, so the pipeline runs indefinitely.
    */
  /** Idempotent parquet audit log for [[ingestPipeline]] decision rows —
    * the same exactly-once layout as [[FileSink.chunksToParquet]]: each
    * micro-batch overwrites its own `batch=<id>` directory, so a replayed
    * batch after failure lands byte-identically instead of duplicating
    * audit rows. What a data auditor asks of a 100 TB ingest ("why was
    * this document dropped, and when?") is answered by one
    * partition-pruned read of the log.
    */
  def decisionsToParquet(decisions: DataFrame, path: String): DataStreamWriter[Row] =
    decisions.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }

  /** Read-back of the audit log: every decision row ever emitted, with
    * its micro-batch id (`basePath` keeps the batch=N partition column,
    * and predicates on it prune to whole batch directories). Append-only
    * history by design — a doc re-observed outside its dedup window
    * appears once per observation.
    */
  def auditLog(spark: SparkSession, path: String): DataFrame =
    // mergeSchema: decision rows gained a ts column (round 7) — a log
    // directory mixing pre-ts and post-ts batch dirs must not let an old
    // footer win schema inference and silently drop the real timestamps
    // (the same mixed-schema failure FileSink.assembled guards against)
    spark.read.option("basePath", path).option("mergeSchema", "true").parquet(path)

  /** Incremental DATA CARD — the streaming face of the batch
    * `corpus_stats` key: instead of re-scanning the corpus to refresh
    * the per-(decision[, lang]) mixture report, each micro-batch folds
    * its decisions down to CELL counts (≤ |decisions|·|langs| rows —
    * metadata scale) and overwrites its own `batch=<id>` dir, the
    * [[decisionsToParquet]] idempotence: a replayed batch lands
    * byte-identically, so cells can never double-count. The cumulative
    * card ([[dataCard]]) is then algebra over the persisted cell
    * history alone — at 100 TB the card stays fresh for the cost of
    * reading |batches|·|cells| tiny rows, never a corpus re-scan.
    */
  def statsToParquet(decisions: DataFrame, path: String): DataStreamWriter[Row] =
    decisions.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        statsCell(df).write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }

  /** One micro-batch's card cells: docs and token mass per decision
    * (and per language when the frame carries one). Dropped rows whose
    * token count is null contribute 0 token mass, not null poisoning;
    * a null language buckets as "und" (the `lang_id` convention) — a
    * null group key would silently vanish from [[dataCard]]'s inner
    * per-language denominator join.
    */
  private[graft] def statsCell(df: DataFrame): DataFrame = {
    val hasLang = df.columns.contains("lang")
    val keyed = if (hasLang) df.withColumn("lang", coalesce(col("lang"), lit("und"))) else df
    val keys = ("decision" +: (if (hasLang) Seq("lang") else Nil)).map(col)
    keyed.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_tokens"), lit(0L))).as("n_tokens"))
  }

  /** The cumulative card over everything ingested so far — the
    * `corpus_stats` shape (docs, tokens, shares) computed from the
    * persisted cells alone. Shares are per language when the cells
    * carry one, global otherwise; cells from batch dirs written before
    * the pipeline carried a lang column (read back as null under
    * mergeSchema — the [[auditLog]] hazard) bucket as "und" rather
    * than silently dropping out of the per-language join.
    */
  def dataCard(spark: SparkSession, path: String): DataFrame = {
    val raw = auditLog(spark, path)
    val hasLang = raw.columns.contains("lang")
    val cells =
      if (hasLang) raw.withColumn("lang", coalesce(col("lang"), lit("und"))) else raw
    val keys = ("decision" +: (if (hasLang) Seq("lang") else Nil)).map(col)
    val agg = cells.groupBy(keys: _*)
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
    val tot =
      if (hasLang) agg.groupBy("lang")
        .agg(sum("n_docs").as("d_docs"), sum("n_tokens").as("d_tokens"))
      else agg.agg(sum("n_docs").as("d_docs"), sum("n_tokens").as("d_tokens"))
    val joined =
      if (hasLang) agg.join(broadcast(tot), "lang") else agg.crossJoin(broadcast(tot))
    joined.select(keys ++ Seq(col("n_docs"), col("n_tokens"),
      (col("n_docs") / col("d_docs")).as("doc_share"),
      (col("n_tokens") / col("d_tokens")).as("token_share")): _*)
  }

  def ingestPipeline(
      docs: DataFrame, baseIndex: DataFrame,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4): DataFrame =
    pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .drop("text")

  /** [[ingestPipeline]] plus the COMPLIANCE SCRUB on the rows that will
    * actually be persisted: `insert` decisions carry the redacted text
    * and per-category PII counts ([[graft.operators.HygieneOps
    * .withPiiScrub]] — the same stateless pass the batch `pii_redact`
    * key uses, batch/stream parity pinned in StreamingSpec); dropped and
    * duplicate rows carry nulls — nothing of theirs is stored, so
    * nothing is scrubbed (the `when` gate also keeps the regex cost off
    * the drop path). Stateless addition: the pipeline's watermark/state
    * story is byte-identical to the unscrubbed form.
    */
  def ingestPipelineScrubbed(
      docs: DataFrame, baseIndex: DataFrame,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4): DataFrame = {
    val core = pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .withColumn("txt", when(col("decision") === "insert", col("text")).otherwise(lit("")))
    graft.operators.HygieneOps.withPiiScrub(core)
      .select(col("doc_id"), col("h"), col("n_tokens"), col("quality"),
        col("decision"), col("existing_id"), col("ts"),
        when(col("decision") === "insert", col("redacted")).as("redacted"),
        when(col("decision") === "insert", col("n_email")).as("n_email"),
        when(col("decision") === "insert", col("n_phone")).as("n_phone"),
        when(col("decision") === "insert", col("n_ip")).as("n_ip"))
  }

  private def pipelineCore(
      docs: DataFrame, baseIndex: DataFrame,
      delayThreshold: String, minTokens: Int, minQuality: Double): DataFrame =
    graft.operators.TextOps.withQualityScore(docs)
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("h")
      .join(baseIndex, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        col("n_tok").cast("long").as("n_tokens"), col("quality"),
        when(col("n_tok") < minTokens, "short")
          .when(col("quality") < minQuality, "quality")
          .when(col("existing_id").isNotNull, "skip_dup")
          .otherwise("insert").as("decision"),
        col("existing_id"),
        // the surviving arrival's event time: lets the audit log answer
        // WHEN, and carries the upstream watermark to windowed stages
        col("ts"), col("text"))

  /** The GATED ingestion pipeline — the full chain as ONE streaming
    * query: within-stream EXACT dedup (`dropDuplicatesWithinWatermark` on
    * the content hash) → quality gate → stream-static exact-dup
    * classification, then per micro-batch the NEAR-dup gate
    * ([[DedupGate.gateDecisions]]): surviving `insert` rows are checked
    * against the persisted signature index AND against their own batch's
    * smaller-id siblings, flagged rows become `near_dup` (with
    * `dup_of`/`sig_match`), and only unflagged inserts append signatures.
    * This closes the gate's documented within-batch blind spot by
    * construction: exact within-batch duplicates die in the watermarked
    * dedup, near-dup siblings resolve to one indexed representative in
    * the within-batch check.
    *
    * Scale shape: everything upstream of foreachBatch is the stateless /
    * watermark-bounded [[ingestPipeline]] plan; the gate adds one
    * signature pass over the batch's INSERTS only (shingle+minhash cost
    * skips rows already dropped as short/quality/exact-dup), a file-pruned
    * probe of the bucketed index, and a broadcast within-batch self-check
    * — per-batch cost O(inserts × bucket), never an index scan.
    * `onBatch` receives every decision row (text dropped), so the same
    * audit-log sink layout as [[decisionsToParquet]] applies.
    */
  def gatedIngestPipeline(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String,
      onBatch: (DataFrame, Long) => Unit,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4,
      onGateTimings: GateStageTimings => Unit = _ => ()): DataStreamWriter[Row] =
    pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .writeStream
      .outputMode("append")
      .foreachBatch(DedupGate.gateDecisions(sigTable,
        (out, id) => onBatch(out.drop("text"), id), onGateTimings) _)

  /** [[gatedIngestPipeline]] with the round-13 hygiene gates composed
    * in — the full production ingest chain: within-stream exact dedup →
    * length gate → heuristic quality gate → URL-BLOCKLIST gate
    * (`blocked_domain`) → MODEL-quality gate (`lm_tail`: bits above
    * `maxBits`, CCNet's tail cut, scored against a PRE-TRAINED model —
    * [[graft.operators.HygieneOps.collectCharLmModel]] of a persisted
    * [[graft.operators.HygieneOps.writeCharLmTable]] artifact) →
    * stream-static exact-dup classification → per-batch near-dup gate.
    *
    * Both new gates are NARROW Column algebra
    * ([[graft.operators.WebOps.withDomainGate]] /
    * [[graft.operators.HygieneOps.withCharLmScore]] with literal-map
    * lookups): the streaming plan gains no state, no shuffle, and no new
    * watermark — per-batch cost is per-row expression work, and the
    * near-dup gate's signature pass still runs only on surviving
    * `insert` rows. Decision precedence mirrors `corpus_filter_rep`'s
    * documented chain: cheap structural gates before model gates before
    * dup classification, so each batch row is attributed to the FIRST
    * reason it would be excluded.
    */
  def gatedIngestPipelineHygiene(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String,
      onBatch: (DataFrame, Long) => Unit,
      mBg: Map[String, Long], mA: Map[String, Long], v: Long,
      maxBits: Double,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4): DataStreamWriter[Row] = {
    val scored = graft.operators.HygieneOps.withCharLmScore(
      graft.operators.WebOps.withDomainGate(
        graft.operators.TextOps.withQualityScore(docs)), mBg, mA, v)
    scored
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("h")
      .join(baseIndex, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        col("n_tok").cast("long").as("n_tokens"), col("quality"),
        col("n_urls"), col("n_blocked"), col("bits"),
        when(col("n_tok") < minTokens, "short")
          .when(col("quality") < minQuality, "quality")
          .when(col("n_blocked") > 0, "blocked_domain")
          .when(col("bits") > maxBits, "lm_tail")
          .when(col("existing_id").isNotNull, "skip_dup")
          .otherwise("insert").as("decision"),
        col("existing_id"), col("ts"), col("text"))
      .writeStream
      .outputMode("append")
      .foreachBatch(DedupGate.gateDecisions(sigTable,
        (out, id) => onBatch(out.drop("text"), id)) _)
  }

  /** [[gatedIngestPipeline]] plus the COMPLIANCE SCRUB — the complete
    * ingest chain a 100 TB pipeline actually runs, in one query: exact
    * dedup → quality → merge → near-dup gate → PII redaction on the rows
    * that will actually be persisted. Only FINAL `insert` decisions
    * (i.e. rows the gate did not rewrite to `near_dup`) carry the
    * redacted text and per-category PII counts
    * ([[graft.operators.HygieneOps.withPiiScrub]] — the same stateless
    * pass `pii_redact` and [[ingestPipelineScrubbed]] use); dropped,
    * duplicate, and near-dup rows carry nulls — nothing of theirs is
    * stored, so nothing is scrubbed, and the `when` gate keeps the regex
    * cost off the drop path. Scrubbing runs AFTER the gate so the
    * signature index sees the ORIGINAL text (a redaction placeholder
    * must not perturb the near-dup signatures the flag decisions rest
    * on).
    */
  def gatedIngestPipelineScrubbed(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String,
      onBatch: (DataFrame, Long) => Unit,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4): DataStreamWriter[Row] =
    pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .writeStream
      .outputMode("append")
      .foreachBatch(DedupGate.gateDecisions(sigTable, (out, id) => {
        val core = out.withColumn("txt",
          when(col("decision") === "insert", col("text")).otherwise(lit("")))
        val scrubbed = graft.operators.HygieneOps.withPiiScrub(core)
          .select(col("doc_id"), col("h"), col("n_tokens"), col("quality"),
            col("decision"), col("existing_id"), col("dup_of"), col("sig_match"), col("ts"),
            when(col("decision") === "insert", col("redacted")).as("redacted"),
            when(col("decision") === "insert", col("n_email")).as("n_email"),
            when(col("decision") === "insert", col("n_phone")).as("n_phone"),
            when(col("decision") === "insert", col("n_ip")).as("n_ip"))
        onBatch(scrubbed, id)
      }) _)

  /** [[gatedIngestPipeline]] plus the SPAN-DECONTAMINATION gate — the
    * online ExactSubstr check: after the near-dup gate, rows still
    * decided `insert` are winnow-probed against the persisted EVAL-gram
    * fingerprint index ([[SpanGate]]); any doc sharing a verbatim run of
    * ≥ K+w−1 chars with an eval doc is rewritten to `contaminated`,
    * carrying the leak mass and the earliest implicated eval
    * (doc, position). Gate order is deliberate: near-dup first (cheap
    * signatures over all inserts, and a near-dup of an indexed doc needs
    * no span check — it is already out), spans second (only on rows that
    * would actually be persisted). Contaminated docs do NOT append to
    * the near-dup signature index — [[DedupGate.gateDecisions]] has
    * already appended by the time the span verdict exists, which is
    * ACCEPTED and documented: a contaminated doc at rest in the SIG
    * index only makes future near-dups of it flag (conservative,
    * correct); the EVAL index is never touched by the batch path.
    * `onBatch` receives every decision row, text dropped, with the leak
    * columns appended.
    */
  /** Runs `body` with `df` pinned under a tracked localCheckpoint — for
    * multi-pass sink cascades: the span gates make 3+ passes over the
    * handed-off decision frame (site selection, verdict join, sink), and
    * unpinned each pass re-evaluates the whole micro-batch join plan
    * from the source (the r16 production-body lesson, applied to the
    * component chains). Blocks free deterministically before the batch
    * returns.
    */
  private def pinned(df: DataFrame)(body: DataFrame => Unit): Unit = {
    import org.apache.spark.sql.GraftShim
    val (p, rdd) = GraftShim.localCheckpointTracked(df)
    try body(p) finally GraftShim.releaseCheckpoint(rdd)
  }

  def gatedIngestPipelineDecontam(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String, evalGramTable: String,
      onBatch: (DataFrame, Long) => Unit,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4,
      onGateTimings: GateStageTimings => Unit = _ => (),
      onSpanTimings: SpanGateTimings => Unit = _ => ()): DataStreamWriter[Row] =
    pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .writeStream
      .outputMode("append")
      .foreachBatch(DedupGate.gateDecisions(sigTable, (out, id) =>
        pinned(out)(p => SpanGate.spanGateDecisions(evalGramTable,
          (flagged, fid) => onBatch(flagged.drop("text"), fid),
          onSpanTimings)(p, id)), onGateTimings) _)

  /** [[gatedIngestPipelineDecontam]]'s REMEDIATION sibling — same chain,
    * same probe, different policy on contaminated inserts: leak spans
    * are CUT from the text and the doc is kept ([[SpanGate
    * .spanScrubDecisions]]; decision `scrubbed`, or `scrub_gutted` when
    * the surgery leaves a sub-`minTokens` stub — the keep/drop split a
    * curation pipeline actually wants online, completing the family
    * matrix in the streaming dimension: detect / gate / CUT). Because
    * the scrubbed text IS the payload, `onBatch` receives rows WITH the
    * `text` column (post-surgery) — unlike every flag-only pipeline,
    * whose sinks audit decisions, this one's sink persists documents.
    * The signature-index caveat from the flag sibling carries over
    * verbatim (pre-scrub signatures at rest, conservative); the eval
    * index is never touched by the batch path.
    */
  def gatedIngestPipelineDecontamScrub(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String, evalGramTable: String,
      onBatch: (DataFrame, Long) => Unit,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4,
      onGateTimings: GateStageTimings => Unit = _ => (),
      onSpanTimings: SpanGateTimings => Unit = _ => ()): DataStreamWriter[Row] =
    pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .writeStream
      .outputMode("append")
      .foreachBatch(DedupGate.gateDecisions(sigTable, (out, id) =>
        pinned(out)(p => SpanGate.spanScrubDecisions(evalGramTable, minTokens,
          onBatch, onSpanTimings)(p, id)), onGateTimings) _)

  /** [[gatedIngestPipeline]] plus the PERSISTED-model quality gate — the
    * train-once model artifact ([[graft.operators.HygieneOps
    * .writeCharLmTable]]) scoring every micro-batch through the
    * broadcast-join form inside foreachBatch ([[CharLmGate]]), where the
    * literal-map form of [[gatedIngestPipelineHygiene]] cannot follow
    * (its model must fit `CharLmLiteralMax`; a KenLM-scale artifact can
    * only go through here). Rows above `maxBits` become `lm_tail` BEFORE
    * the near-dup gate — the documented precedence (structural gates,
    * then model gates, then dup classification), and `lm_tail` rows
    * never pay signature cost or touch the signature index. Stream
    * scores are bit-identical to the batch `charlm_quality` key on the
    * same docs (StreamingSpec); no new stream state — the stateful plan
    * is byte-identical to [[gatedIngestPipeline]]'s.
    */
  def gatedIngestPipelineLm(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String, lmTable: String,
      maxBits: Double,
      onBatch: (DataFrame, Long) => Unit,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4,
      onGateTimings: GateStageTimings => Unit = _ => ()): DataStreamWriter[Row] =
    pipelineCore(docs, baseIndex, delayThreshold, minTokens, minQuality)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // pin the LM-decided frame: the gate's signature/probe/out passes
        // would otherwise re-run the model join per pass (the production
        // body's discipline, applied to the component chain)
        pinned(CharLmGate.withLmDecisions(batch, lmTable, maxBits)) { decorated =>
          DedupGate.gateDecisions(sigTable,
            (out, bid) => onBatch(out.drop("text"), bid), onGateTimings)(decorated, id)
        }
      }

  /** The COMPLETE production ingest chain — every gate this surface
    * ships, composed in the documented precedence, as ONE streaming
    * query: within-stream exact dedup → length gate → heuristic quality
    * gate → URL-blocklist gate (narrow in-plan passes) → stream-static
    * exact-dup classification, then per micro-batch: PERSISTED-model LM
    * tail cut ([[CharLmGate]], any artifact size) → near-dup gate
    * ([[DedupGate]]) → span-decontamination SCRUB ([[SpanGate
    * .spanScrubDecisions]], surgery not drop) → PII redaction on the
    * rows that will actually be persisted.
    *
    * The ordering is load-bearing, cheapest-and-rawest first:
    *   - structural gates are narrow Column algebra in the streaming
    *     plan itself (no state beyond the watermarked dedup);
    *   - the LM cut precedes signature work so `lm_tail` rows never pay
    *     shingle/minhash cost or enter the signature index;
    *   - near-dup precedes the span probe (cheap signatures; a flagged
    *     near-dup of an indexed doc needs no span check);
    *   - span detection runs on ORIGINAL text — eval-gram indexes are
    *     built from raw text, so the probe must see raw text;
    *   - PII redaction runs LAST, on the POST-surgery text of keep rows
    *     (`insert` | `scrubbed`) only: a redaction placeholder must
    *     perturb neither the near-dup signatures nor the span grams,
    *     and drop-path rows store nothing so nothing is scrubbed.
    * Signature policy — DUAL-SIGN (r15 verdict task 2): novel `insert`
    * rows index their original-text signatures as everywhere else;
    * `scrubbed` rows index BOTH the original signature AND the
    * signature of the POST-surgery text that actually persists. Either
    * alone has a blind spot: original-only misses future near-dups of
    * the persisted (cut) text when the cut was large; post-scrub-only
    * would miss future near-dups of the original (they arrive with
    * original-text signatures, get scrubbed the same way, and would
    * persist as at-rest duplicates). Both variants append under the
    * doc's id in ONE idempotent call, so replay appends neither twice
    * and the self-match exclusion covers both rows.
    *
    * Batch-body shape (r15 verdict task 4): the stage cascade is FLAT,
    * not nested callbacks, and the LM-decided batch is pinned with one
    * tracked localCheckpoint at entry — every later stage filters or
    * joins back into those rows several times, and without the pin each
    * pass re-evaluated the whole upstream chain (stream source → gates →
    * LM join) from scratch; the scrubbed frame is pinned again before
    * the PII/sink/re-sign passes for the same reason. Blocks free
    * deterministically before the batch returns.
    *
    * `onBatch` receives every decision row with the raw `text` dropped;
    * keep rows carry the `redacted` post-surgery payload plus the full
    * per-gate attribution trail (`n_urls`/`n_blocked`, `bits`/
    * `n_bigrams`, `dup_of`/`sig_match`, leak coordinates, PII counts).
    *
    * PERCEPTUAL gate (r19, opt-in via `perceptTable`): with a persisted
    * dHash code index ([[PerceptGate.writeCodeIndex]]), image-kind rows
    * still `insert` after the text near-dup gate are decoded, dHashed
    * and checked against the index AND their own batch's smaller-id
    * siblings — flagged rows become `percept_dup` (with `percept_of`/
    * `percept_hamming` riding to the sink), unflagged image inserts
    * index their codes. This closes the family matrix's last streaming
    * cell: every dedup family (exact, minhash, substring, quality,
    * perceptual) now has an online gate member. Caveats mirror the
    * text gates: a percept_dup row's TEXT signature has already
    * appended to the sig index (conservative — it only makes future
    * text near-dups flag), and percept codes append before the span
    * verdicts exist (same conservatism, raster grain). Without
    * `perceptTable` the chain and output schema are byte-identical to
    * r18's.
    *
    * WHICH rows are image-kind and WHERE their bytes live is CALLER
    * layout, not engine knowledge (r19 verdict task 1): `perceptKind`
    * is the image-row predicate and `perceptPayload` the binary payload
    * expression, both evaluated against the decided batch frame —
    * which carries every EXTRA input column through unchanged (a
    * `kind`/`blob`-shaped corpus just points the two expressions at its
    * own columns; extras also ride to the sink as attribution). The
    * defaults keep the historical test-layout convention (`doc_id % 3
    * === 0`, payload = the text bytes), so existing records and specs
    * stand. Both are only consulted when `perceptTable` is set.
    *
    * EMBEDDING gate (r20, opt-in via `embedTable` — r19 verdict task
    * 4's composition): documents arriving WITH an embedding column
    * (`embedPayload`, default `col("embedding")`, nullable — rows
    * without one pass untouched) still `insert` after the perceptual
    * stage are cosine-checked by [[EmbedGate]]'s primitives against a
    * persisted DOC-KEYED LSH index ([[graft.operators.VectorOps
    * .writeLshIndexFrom]] over `(doc_id, embedding)` rows) and their
    * own batch's siblings; flagged rows become `embed_dup` (with
    * `embed_of`/`embed_sim` riding to the sink, `dup_of` chains
    * resolved to the surviving representative), unflagged novel
    * embeddings index under their doc id. Placement and conservatism
    * mirror the percept stage: an embed_dup's TEXT signature has
    * already appended (it only makes future text near-dups flag), and
    * embeddings append before the span verdicts exist; zero-norm
    * embeddings are degenerate — never flagged, never indexed
    * ([[EmbedGate]]'s documented policy). The standalone
    * vector-stream deployment ([[EmbedGate.gatedIndexMaintenance]]
    * over the shared ANN index) remains the right shape when
    * embeddings arrive as their own stream rather than on documents.
    */
  def gatedIngestPipelineProduction(
      docs: DataFrame, baseIndex: DataFrame, sigTable: String,
      evalGramTable: String, lmTable: String, maxBits: Double,
      onBatch: (DataFrame, Long) => Unit,
      delayThreshold: String = Reassembly.DefaultTtl,
      minTokens: Int = 20, minQuality: Double = 0.4,
      onGateTimings: GateStageTimings => Unit = _ => (),
      onSpanTimings: SpanGateTimings => Unit = _ => (),
      onLmSec: (Long, Double) => Unit = (_, _) => (),
      perceptTable: Option[String] = None,
      onPerceptTimings: PerceptGateTimings => Unit = _ => (),
      perceptKind: Column = col("doc_id") % 3 === 0,
      perceptPayload: Column = col("text").cast("binary"),
      embedTable: Option[String] = None,
      onEmbedTimings: EmbedGateTimings => Unit = _ => (),
      embedPayload: Column = col("embedding"),
      embedThreshold: Double = EmbedGate.DefaultThreshold): DataStreamWriter[Row] = {
    val scored = graft.operators.WebOps.withDomainGate(
      graft.operators.TextOps.withQualityScore(docs))
    // extra INPUT columns (a corpus's kind/blob/meta layout) ride through
    // the classification select untouched: the percept hook's expressions
    // and the sink's attribution trail may reference them
    val consumed = Set("doc_id", "text", "ts", "h", "n_tok", "n_tokens",
      "quality", "n_urls", "n_blocked", "decision", "existing_id")
    val extras = docs.columns.toIndexedSeq.filterNot(consumed)
    scored
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("h")
      .join(baseIndex, Seq("h"), "left")
      .select(Seq(col("doc_id"), col("h"),
        col("n_tok").cast("long").as("n_tokens"), col("quality"),
        col("n_urls"), col("n_blocked"),
        when(col("n_tok") < minTokens, "short")
          .when(col("quality") < minQuality, "quality")
          .when(col("n_blocked") > 0, "blocked_domain")
          .when(col("existing_id").isNotNull, "skip_dup")
          .otherwise("insert").as("decision"),
        col("existing_id"), col("ts"), col("text")) ++ extras.map(col): _*)
      .writeStream
      .outputMode("append")
      .foreachBatch(productionBatch(sigTable, evalGramTable, lmTable, maxBits,
        minTokens, onBatch, onGateTimings, onSpanTimings, onLmSec,
        perceptTable, onPerceptTimings, perceptKind, perceptPayload,
        embedTable, onEmbedTimings, embedPayload, embedThreshold) _)
  }

  /** The production chain's foreachBatch body — the gate cascade of
    * [[DedupGate.gateDecisions]] ∘ [[SpanGate.spanScrubDecisions]] ∘ PII
    * written FLAT so (a) intermediate frames are pinned exactly once
    * each and (b) the signature append can see the span verdicts and
    * dual-sign scrubbed rows (see [[gatedIngestPipelineProduction]]'s
    * scaladoc for both contracts). Stage semantics are the shared
    * primitives themselves — [[CharLmGate.withLmDecisions]],
    * [[graft.operators.DedupOps.bandedSigs]] +
    * [[DedupGate.combinedFlags]], [[SpanGate.scrubPerDoc]] +
    * [[SpanGate.applyScrub]] — so decisions stay bit-identical to the
    * component pipelines (StreamingSpec).
    */
  private def productionBatch(sigTable: String, evalGramTable: String,
      lmTable: String, maxBits: Double, minTokens: Int,
      onBatch: (DataFrame, Long) => Unit,
      onGateTimings: GateStageTimings => Unit,
      onSpanTimings: SpanGateTimings => Unit,
      onLmSec: (Long, Double) => Unit = (_, _) => (),
      perceptTable: Option[String] = None,
      onPerceptTimings: PerceptGateTimings => Unit = _ => (),
      perceptKind: Column = col("doc_id") % 3 === 0,
      perceptPayload: Column = col("text").cast("binary"),
      embedTable: Option[String] = None,
      onEmbedTimings: EmbedGateTimings => Unit = _ => (),
      embedPayload: Column = col("embedding"),
      embedThreshold: Double = EmbedGate.DefaultThreshold)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.GraftShim
    import graft.operators.{DedupOps, SpanOps}
    val s = batch.sparkSession
    s.catalog.refreshTable(sigTable)
    DedupGate.validateMeta(s, sigTable)
    s.catalog.refreshTable(evalGramTable)
    SpanGate.validateMeta(s, evalGramTable)
    perceptTable.foreach { pt =>
      s.catalog.refreshTable(pt)
      PerceptGate.validateMeta(s, pt)
    }
    embedTable.foreach(s.catalog.refreshTable) // nBits meta refreshes in requireNBits
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // pin the LM-decided batch ONCE: every stage below filters or joins
    // back into these rows. The pin's wall (the LM scoring join's
    // materialization — the chain's only added MODEL cost vs the scrub
    // sibling) is reported via onLmSec so the bench can decompose the
    // production premium per added gate (r16 verdict task 2).
    val ((decided, decidedRdd), tLm) = timed(GraftShim.localCheckpointTracked(
      CharLmGate.withLmDecisions(batch, lmTable, maxBits)))
    onLmSec(batchId, tLm)
    try {
      val inserts = decided.filter(col("decision") === "insert").select("doc_id", "text")
      val ((banded, bandedRdd), tSig) =
        timed(GraftShim.localCheckpointTracked(DedupOps.bandedSigs(inserts)))
      try {
        val ((flags0, flagsRdd), tProbe) = timed(GraftShim.localCheckpointTracked(
          DedupGate.combinedFlags(
            DedupGate.prunedIndexSlice(s, sigTable, banded), banded)))
        try {
          // within-batch dup_of chains resolve to the surviving
          // representative (the audit trail must not point at docs
          // that will never be at rest — Survivors.resolve's contract)
          val flags = Survivors.resolve(s, flags0, "doc_id")
          val deduped = decided.join(flags, Seq("doc_id"), "left")
            .withColumn("decision",
              when(col("dup_of").isNotNull, "near_dup").otherwise(col("decision")))
          // PERCEPTUAL near-dup gate (r19 — the raster-grain member of
          // the dedup cascade): image-kind rows still decided `insert`
          // are dHash-checked against the persisted code index AND
          // their own batch's smaller-id siblings; flagged rows become
          // `percept_dup` (with `percept_of`/`percept_hamming`).
          // Placed with its text sibling — cheap 16-byte codes before
          // the span probe, and a percept_dup needs no span check.
          // Codes of unflagged image inserts index HERE, before the
          // span verdicts exist — the same documented conservatism as
          // the signature index: a later-gutted doc's code at rest only
          // makes future dups of it flag. With no perceptTable the
          // body runs on the text-gated frame unchanged (and without
          // the two percept columns).
          def withPercept[A](body: DataFrame => A): A = perceptTable match {
            case None => body(deduped)
            case Some(pt) =>
              // image-kind rows and their bytes are the CALLER's layout
              // (perceptKind/perceptPayload); the defaults keep the
              // multimodalMeta test convention (doc_id % 3 = 0, payload
              // = the text bytes)
              val img = deduped
                .filter(col("decision") === "insert" && perceptKind)
                .select(col("doc_id"), perceptPayload.as("payload"))
              val ((pBanded, pBandedRdd), tPCode) = timed(GraftShim.localCheckpointTracked(
                PerceptGate.bandedCodes(
                  graft.operators.MultimodalOps.perceptualCodes(s, img))))
              try {
                val ((pFlags0, pFlagsRdd), tPProbe) = timed(GraftShim.localCheckpointTracked(
                  PerceptGate.combinedFlags(
                    PerceptGate.prunedIndexSlice(s, pt, pBanded), pBanded)))
                try {
                  val pFlags = Survivors.resolve(s, pFlags0, "doc_id")
                  val (pAppended, tPAppend) = timed(PerceptGate.appendBandedIdempotent(
                    s, pBanded.join(pFlags.select("doc_id"), Seq("doc_id"), "left_anti"), pt))
                  onPerceptTimings(PerceptGateTimings(
                    batchId, tPCode, tPProbe, tPAppend, pAppended))
                  body(deduped.join(
                    pFlags.select(col("doc_id"), col("dup_of").as("percept_of"),
                      col("hamming").as("percept_hamming")), Seq("doc_id"), "left")
                    .withColumn("decision",
                      when(col("percept_of").isNotNull, "percept_dup")
                        .otherwise(col("decision"))))
                } finally GraftShim.releaseCheckpoint(pFlagsRdd)
              } finally GraftShim.releaseCheckpoint(pBandedRdd)
          }
          // EMBEDDING near-dup gate (r20 — the vector-grain member of
          // the cascade): rows still `insert` that CARRY an embedding
          // are cosine-checked against the persisted doc-keyed LSH
          // index and their own batch's siblings; flagged rows become
          // `embed_dup` (chains resolved to the surviving
          // representative) and need no span check. Unflagged novel
          // embeddings index HERE, before the span verdicts exist —
          // the same documented conservatism as the signature and
          // percept appends; zero-norm embeddings neither flag nor
          // index (EmbedGate's degenerate policy).
          def withEmbed[A](frame: DataFrame)(body: DataFrame => A): A = embedTable match {
            case None => body(frame)
            case Some(et) =>
              val nBits = EmbedGate.requireNBits(s, et)
              val vecs = frame
                .filter(col("decision") === "insert" && embedPayload.isNotNull)
                .select(col("doc_id").as("vec_id"), embedPayload.as("embedding"))
              val ((eSigs, eSigsRdd), tESig) = timed(GraftShim.localCheckpointTracked(
                EmbedGate.withSigs(vecs, nBits)))
              try {
                val ((eFlags0, eFlagsRdd), tEProbe) = timed(GraftShim.localCheckpointTracked(
                  EmbedGate.combinedFlags(
                    EmbedGate.prunedIndexSlice(s, et, eSigs), eSigs, embedThreshold)))
                try {
                  val eFlags = EmbedGate.resolveToSurvivors(s, eFlags0)
                  val (eAppended, tEAppend) = timed(
                    graft.operators.VectorOps.appendToLshIndexIdempotent(s,
                      eSigs.filter(col("nrm") > 0)
                        .join(eFlags.select("vec_id"), Seq("vec_id"), "left_anti")
                        .select("vec_id", "embedding"), et, nBits))
                  onEmbedTimings(EmbedGateTimings(batchId, tESig, tEProbe, tEAppend, eAppended))
                  body(frame.join(
                    eFlags.select(col("vec_id").as("doc_id"), col("dup_of").as("embed_of"),
                      col("sim").as("embed_sim")), Seq("doc_id"), "left")
                    .withColumn("decision",
                      when(col("embed_of").isNotNull, "embed_dup")
                        .otherwise(col("decision"))))
                } finally GraftShim.releaseCheckpoint(eFlagsRdd)
              } finally GraftShim.releaseCheckpoint(eSigsRdd)
          }
          withPercept { dedupedPOnly =>
          withEmbed(dedupedPOnly) { dedupedP =>
          val still = dedupedP.filter(col("decision") === "insert").select("doc_id", "text")
          val ((sites, sitesRdd), tSelect) =
            timed(GraftShim.localCheckpointTracked(SpanOps.winnowSites(still)))
          try {
            val ((perDoc, perDocRdd), tSpanProbe) = timed(
              GraftShim.localCheckpointTracked(
                SpanGate.scrubPerDoc(s, sites, evalGramTable)))
            try {
              // pin the post-surgery decision frame: the PII/sink pass
              // AND the dual-sign append both read it
              val (scrubbed, scrubbedRdd) = GraftShim.localCheckpointTracked(
                SpanGate.applyScrub(dedupedP, perDoc, minTokens))
              try {
                val keep = col("decision").isin("insert", "scrubbed")
                val core = scrubbed.withColumn("txt",
                  when(keep, col("text")).otherwise(lit("")))
                val out = graft.operators.HygieneOps.withPiiScrub(core)
                  .withColumn("redacted", when(keep, col("redacted")))
                  .withColumn("n_email", when(keep, col("n_email")))
                  .withColumn("n_phone", when(keep, col("n_phone")))
                  .withColumn("n_ip", when(keep, col("n_ip")))
                  .drop("text", "txt")
                val (_, tSink) = timed(onBatch(out, batchId))
                // novel unflagged rows keep their original-text
                // signatures; scrubbed rows ALSO sign the post-surgery
                // text (dual-sign — one idempotent append covers both).
                // Bands a small cut leaves untouched re-sign to the SAME
                // (doc_id, band_id, bh, sig) row — the common case —
                // so dedupe before appending or the index (and its
                // staleness accounting) permanently carries byte-equal
                // twins (r16 ADVICE; flagging itself was immune via the
                // min-struct agg)
                val novel = banded.join(flags.select("doc_id"), Seq("doc_id"), "left_anti")
                val resigned = DedupOps.bandedSigs(
                  scrubbed.filter(col("decision") === "scrubbed").select("doc_id", "text"))
                val (appended, tAppend) = timed(DedupGate.appendBandedIdempotent(
                  s, novel.unionByName(resigned)
                    .dropDuplicates("doc_id", "band_id", "bh", "sig"), sigTable))
                onGateTimings(GateStageTimings(
                  batchId, tSig, tProbe, tSink, tAppend, appended))
                onSpanTimings(SpanGateTimings(batchId, tSelect, tSpanProbe, tSink))
              } finally GraftShim.releaseCheckpoint(scrubbedRdd)
            } finally GraftShim.releaseCheckpoint(perDocRdd)
          } finally GraftShim.releaseCheckpoint(sitesRdd)
          }
          }
        } finally GraftShim.releaseCheckpoint(flagsRdd)
      } finally GraftShim.releaseCheckpoint(bandedRdd)
    } finally GraftShim.releaseCheckpoint(decidedRdd)
  }

  /** Idempotent per-batch audit sink for the GATED pipelines' `onBatch`
    * hook — the [[decisionsToParquet]] layout (each micro-batch
    * overwrites its own `batch=<id>` dir, replay lands byte-identically)
    * for pipelines whose decisions are finalized INSIDE foreachBatch and
    * so cannot use a DataStreamWriter sink. Read back with [[auditLog]].
    */
  def auditBatchSink(path: String): (DataFrame, Long) => Unit =
    (df, batchId) => df.write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** Event-time windowed roll-up of [[ingestPipeline]] decisions — the
    * pipeline's observability surface with an explicit LATENESS POLICY:
    * decisions are bucketed by the document's event time into tumbling
    * windows, and each (window, decision) count is emitted exactly once,
    * when the watermark (inherited from the pipeline's `delayThreshold`)
    * closes the window. A document arriving later than that is dropped
    * by the watermark rather than reopening a closed window — counts are
    * immutable once emitted (what an audit roll-up needs), trading late
    * completeness for finality, the same policy [[WindowedCounts]]
    * applies to raw frames.
    *
    * Chains two stateful operators in one query (the pipeline's
    * watermark-bounded dedup, then this windowed aggregation) — the
    * composition Spark supports for append-mode event-time windows; the
    * stream-static join between them is stateless. State here is one
    * count per open (window, decision), independent of stream history.
    */
  def ingestStatsWindowed(decisions: DataFrame,
      windowDuration: String = "1 minute"): DataFrame =
    decisions
      .groupBy(window(col("ts"), windowDuration), col("decision"))
      .count()
      .select(col("window.start").as("win_start"), col("decision"), col("count").as("n"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.HygieneOps

/** Streaming MODEL-QUALITY gate against the PERSISTED character-LM
  * artifact (r14 verdict task 6): each micro-batch's surviving `insert`
  * rows are scored against the `writeCharLmTable` tables — the CCNet
  * deployment shape: the model is trained once on a reference corpus,
  * the stream is scored against the artifact — and rows whose mean
  * surprisal exceeds `maxBits` are rewritten to `lm_tail` (CCNet's
  * tail cut).
  *
  * The gate picks its scoring PLAN by artifact size, resolved once per
  * artifact generation per (warehouse, table) and re-validated against
  * the persisted [[graft.operators.IndexEpoch]] stamp each batch (r17
  * introduced the memoization; r18 scoped it to the generation so a
  * rebuild by ANOTHER process is picked up within one batch): an
  * artifact within `CharLmLiteralMax` is collected
  * driver-side at first use and every batch scores through the NARROW
  * native form ([[HygieneOps.withCharLmScore]] — one codegen-friendly
  * projection, no explode, no join, no per-doc aggregation; the r17
  * GateBench decomposition measured the join plan's per-batch
  * materialization at ~0.9 s, the entire production-vs-scrub premium);
  * a larger artifact (word-level, KenLM-scale) scores through the
  * broadcast-join form per batch ([[HygieneOps.charlmScoreAgainst]] —
  * foreachBatch is the only place a join+groupBy plan can run without
  * adding stream state), so ANY model size is served. Both forms are
  * bit-identical by CharLmSpec's decimal-sum pin — the cap picks a
  * PLAN, never a decision — and the stream score is bit-identical to
  * the batch `charlm_quality` key on the same docs (StreamingSpec).
  *
  * Scale shape: the model side is a once-per-JVM metadata-scale collect
  * (literal regime) or two broadcast table reads per batch (join
  * regime); the batch side is O(batch chars) either way, no shuffle of
  * anything index-sized, no new watermark, NO new stream state (a pure
  * function of (batch, artifact), replay-idempotent like [[SpanGate]]).
  *
  * Gate order: decorate BEFORE the near-dup gate (the
  * [[StreamMerge.gatedIngestPipelineLm]] composition) so precedence
  * matches the in-plan hygiene chain — cheap structural gates, then
  * model gates, then dup classification — and `lm_tail` rows never cost
  * signature work or enter the signature index.
  */
object CharLmGate {

  /** Rewrites rows still decided `insert` whose persisted-model score
    * exceeds `maxBits` to `lm_tail`; every row gains `n_bigrams` (0 when
    * unscored — sub-2-char docs have no bigrams, matching the batch
    * key's domain) and `bits` (null when unscored). Pure per-batch frame
    * logic; the model tables must exist (`writeCharLmTable`) or this
    * fails loudly.
    */
  /** Per-(warehouse, table) gate-side model state, resolved once per
    * artifact GENERATION (r17 resolved once per JVM; r18 verdict task 1
    * scoped the memoization to the [[graft.operators.IndexEpoch]] stamp
    * [[HygieneOps.writeCharLmTableFrom]] writes): `Literal` carries the
    * collected maps for the narrow native scoring form, `JoinForm` marks
    * a model over [[HygieneOps.CharLmLiteralMax]] that must keep scoring
    * through the per-batch broadcast-join plan. Keyed by (warehouse,
    * table), not table name alone: two sessions with different
    * warehouses (sequential suites, maintenance beside a gate) can each
    * hold a same-named model table — a name-only key would serve the
    * first session's model for the second's different artifact.
    *
    * Why the epoch re-validation (every [[withLmDecisions]] call — one
    * 1-row parquet read, ~ms against a multi-second batch): a model
    * REBUILT BY ANOTHER PROCESS while this gate JVM is alive never
    * calls this JVM's [[invalidate]], and both plans are decision-valid,
    * so a JVM-lifetime cache would silently score every subsequent
    * batch with the dead counts. Comparing the persisted generation per
    * batch turns that into at most ONE stale batch (the writer stamps
    * AFTER the data lands). Legacy artifacts with no epoch table read
    * as generation 0 and gain the stamp on their next rebuild.
    */
  private sealed trait GateModel
  private final case class Literal(bg: Map[String, Long], a: Map[String, Long],
      v: Long) extends GateModel
  private case object JoinForm extends GateModel
  private final case class Resolved(epoch: Long, model: GateModel)

  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, Resolved]()

  private def cacheKeyOf(s: SparkSession, lmTable: String): String =
    s.sessionState.conf.warehousePath + "#" + lmTable

  /** Drop a table's cached gate-side model so the next
    * [[withLmDecisions]] re-validates and re-collects. The JVM-lifetime
    * cache is sound only while the model artifact is train-once; a
    * REBUILD at the same (warehouse, name) — legal via
    * [[HygieneOps.writeCharLmTable]] — must re-arm both the emptiness
    * check (r16 ADVICE: a rebuilt-empty table would otherwise skip the
    * guard forever) and the collected maps (a rebuilt model would
    * otherwise keep scoring with the previous counts). The writers call
    * this on every (re)write.
    */
  def invalidate(s: SparkSession, lmTable: String): Unit = {
    models.remove(cacheKeyOf(s, lmTable)): Unit
  }

  private def modelFor(s: SparkSession, lmTable: String): GateModel = {
    val key = cacheKeyOf(s, lmTable)
    val cached = models.get(key)
    try {
      // one 1-row read per batch: the generation stamp writeCharLmTableFrom
      // bumps after every (re)write — the cache is valid exactly while the
      // persisted generation matches the one it was collected under
      val epoch = graft.operators.IndexEpoch.current(s, lmTable)
      if (cached != null && cached.epoch == epoch) cached.model
      else {
        // the artifact moved (or first use): drop relation caches first —
        // a cross-process overwrite leaves this session's file listing
        // pointing at the replaced parquet
        if (s.catalog.tableExists(lmTable)) s.catalog.refreshTable(lmTable)
        if (s.catalog.tableExists(lmTable + "_ctx")) s.catalog.refreshTable(lmTable + "_ctx")
        // emptiness probe folded into the vocab read (r17 verdict task 6):
        // one collect proves the artifact is trained AND delivers v
        val model = HygieneOps.collectCharLmModelFromTables(s, lmTable) match {
          case Some((bg, a, v)) => Literal(bg, a, v)
          case None => JoinForm
        }
        models.put(key, Resolved(epoch, model))
        model
      }
    } catch {
      // a CROSS-PROCESS rebuild uses non-atomic drop+recreate writes
      // (writeCharLmTableFrom, IndexEpoch.bump), so the per-batch
      // validation can catch the artifact mid-overwrite: the epoch read,
      // the refresh, or the re-collect transiently fails
      // (table-not-found / empty _ctx) in exactly the scenario the
      // generation check exists to serve. With a resolved model in hand,
      // score THIS batch with it and retry validation next batch — at
      // most one extra stale batch, strictly better than failing the
      // streaming query (r18 ADVICE). First use has nothing to fall back
      // to and still fails loudly; the failure is never cached. (A
      // JoinForm model's per-batch table reads happen at the scoring
      // site and keep their own failure semantics — this guard covers
      // the validation/collect path only.)
      case scala.util.control.NonFatal(_) if cached != null => cached.model
    }
  }

  def withLmDecisions(batch: DataFrame, lmTable: String, maxBits: Double): DataFrame = {
    val s = batch.sparkSession
    val inserts = batch.filter(col("decision") === "insert").select("doc_id", "text")
    // a charset-bounded artifact scores through the NARROW native form —
    // per batch that replaces the explode + broadcast-join + per-doc
    // aggregation plan with one codegen-friendly projection (the r17
    // GateBench decomposition measured the join form's materialization
    // at ~0.9 s/batch, the whole production-vs-scrub premium); a model
    // over the literal cap keeps the join form, correct at any size.
    // Both forms are bit-identical (CharLmSpec), so the DECISIONS cannot
    // depend on which one the cap picks.
    val scores = modelFor(s, lmTable) match {
      case Literal(bg, a, v) =>
        // n_bigrams > 0: the join regime emits NO row for 0-bigram docs
        // (they never explode), so the literal regime must not either —
        // otherwise the joined n_bigrams/bits a downstream consumer sees
        // for short docs depends on which plan the artifact size picked
        // (r17 ADVICE; same filter as charlmScoreOf)
        HygieneOps.withCharLmScore(inserts, bg, a, v)
          .filter(col("n_bigrams") > 0)
          .select("doc_id", "n_bigrams", "bits")
      case JoinForm =>
        val ctxV = s.table(lmTable + "_ctx")
        HygieneOps.charlmScoreAgainst(inserts,
          s.table(lmTable), ctxV.select("ch", "c_a"), ctxV.select("v").limit(1))
    }
    batch.join(scores, Seq("doc_id"), "left")
      .withColumn("decision",
        when(col("decision") === "insert" && col("bits") > maxBits, "lm_tail")
          .otherwise(col("decision")))
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }
}

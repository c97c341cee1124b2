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
  * The gate picks its scoring PLAN by artifact size, once per JVM per
  * (warehouse, table) (r17 — the charlmScoreOf policy applied to the
  * stream): an artifact within `CharLmLiteralMax` is collected
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
  /** Per-(warehouse, table) gate-side model state, resolved ONCE per JVM
    * (the model is a train-once artifact — [[HygieneOps.writeCharLmTable]]
    * always writes a non-empty `_ctx` — so it cannot change mid-query;
    * r15 ADVICE removed the per-batch emptiness probe, and r17 extends
    * the same memoization to the model itself): `Literal` carries the
    * collected maps for the narrow native scoring form, `JoinForm` marks
    * a model over [[HygieneOps.CharLmLiteralMax]] that must keep scoring
    * through the per-batch broadcast-join plan. Keyed by (warehouse,
    * table), not table name alone: two sessions with different
    * warehouses (sequential suites, maintenance beside a gate) can each
    * hold a same-named model table — a name-only key would serve the
    * first session's model for the second's different artifact.
    */
  private sealed trait GateModel
  private final case class Literal(bg: Map[String, Long], a: Map[String, Long],
      v: Long) extends GateModel
  private case object JoinForm extends GateModel

  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, GateModel]()

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

  private def modelFor(s: SparkSession, lmTable: String): GateModel =
    models.computeIfAbsent(cacheKeyOf(s, lmTable), _ => {
      val ctxV = s.table(lmTable + "_ctx")
      require(ctxV.limit(1).count() == 1,
        s"charlm model table ${lmTable}_ctx is empty — train first (writeCharLmTable)")
      HygieneOps.collectCharLmModelOpt(s.table(lmTable),
        ctxV.select("ch", "c_a"), ctxV.select("v").limit(1)) match {
        case Some((bg, a, v)) => Literal(bg, a, v)
        case None => JoinForm
      }
    })

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
        HygieneOps.withCharLmScore(inserts, bg, a, v)
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

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.HygieneOps

/** Streaming MODEL-QUALITY gate against the PERSISTED character-LM
  * artifact (r14 verdict task 6): each micro-batch's surviving `insert`
  * rows are scored with the broadcast-join form of the bigram LM
  * ([[graft.operators.HygieneOps.charlmScoreAgainst]] over the
  * `writeCharLmTable` tables — the CCNet deployment shape: the model is
  * trained once on a reference corpus, the stream is scored against the
  * artifact), and rows whose mean surprisal exceeds `maxBits` are
  * rewritten to `lm_tail` (CCNet's tail cut).
  *
  * Two existing charlm forms, two streaming compositions: the
  * LITERAL-MAP form ([[StreamMerge.gatedIngestPipelineHygiene]]) is
  * narrow Column algebra folded into the streaming plan itself — right
  * when the model is charset-bounded and already collected driver-side;
  * THIS gate is the other half: it reads the persisted TABLES per batch
  * inside foreachBatch (the only place a join+groupBy plan can run
  * without adding stream state), so it serves model artifacts of ANY
  * size — word-level or KenLM-scale tables can only go through here
  * (the literal form is capped at `CharLmLiteralMax`). Both forms are
  * bit-identical by CharLmSpec's decimal-sum pin, and the stream score
  * is bit-identical to the batch `charlm_quality` key on the same docs
  * (StreamingSpec).
  *
  * Scale shape: the model side is two broadcast table reads per batch
  * (KBs-to-MBs); the batch side explodes its own bigrams and partial-aggs
  * per doc — per-batch cost O(batch chars), no shuffle of anything
  * index-sized, no new watermark, NO new stream state (a pure function
  * of (batch, artifact), replay-idempotent like [[SpanGate]]).
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
  /** Table names whose non-emptiness has been validated once — the model
    * is a train-once artifact ([[HygieneOps.writeCharLmTable]] always
    * writes a non-empty `_ctx`), so it cannot become empty mid-query;
    * re-running the `limit(1).count()` probe per micro-batch would add a
    * driver-side Spark job to every batch of the production chain for a
    * condition only the FIRST batch can catch (r15 ADVICE). Keyed by
    * (warehouse, table), not table name alone: the cache lives for the
    * JVM, and two sessions with different warehouses (sequential suites,
    * maintenance beside a gate) can each hold a same-named model table —
    * a name-only key would let the first session's validation silently
    * waive the check for the second's possibly-empty table.
    */
  private val validated = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def cacheKeyOf(s: SparkSession, lmTable: String): String =
    s.sessionState.conf.warehousePath + "#" + lmTable

  /** Drop a table's validation-cache entry so the next [[withLmDecisions]]
    * re-runs the emptiness probe. The JVM-lifetime cache is sound only
    * while the model artifact is train-once; a REBUILD at the same
    * (warehouse, name) — legal via [[HygieneOps.writeCharLmTable]] — must
    * re-arm the check or a rebuilt-empty table would skip the guard
    * forever and surface as an opaque downstream join result (r16
    * ADVICE). The writers call this on every (re)write.
    */
  def invalidate(s: SparkSession, lmTable: String): Unit = {
    validated.remove(cacheKeyOf(s, lmTable)): Unit
  }

  def withLmDecisions(batch: DataFrame, lmTable: String, maxBits: Double): DataFrame = {
    val s = batch.sparkSession
    val ctxV = s.table(lmTable + "_ctx")
    val cacheKey = cacheKeyOf(s, lmTable)
    if (!validated.contains(cacheKey)) {
      require(ctxV.limit(1).count() == 1,
        s"charlm model table ${lmTable}_ctx is empty — train first (writeCharLmTable)")
      validated.add(cacheKey): Unit
    }
    val scores = HygieneOps.charlmScoreAgainst(
      batch.filter(col("decision") === "insert").select("doc_id", "text"),
      s.table(lmTable), ctxV.select("ch", "c_a"), ctxV.select("v").limit(1))
    batch.join(scores, Seq("doc_id"), "left")
      .withColumn("decision",
        when(col("decision") === "insert" && col("bits") > maxBits, "lm_tail")
          .otherwise(col("decision")))
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }
}

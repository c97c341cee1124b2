package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE probe-slice shape shared by every online gate: given a batch's
  * distinct (Long-typed) index keys, slice the persisted index table
  * down to the rows the batch can possibly collide with.
  *
  *   - EMPTY batch → a `limit(0)` slice of the table (never a
  *     hand-built empty schema: downstream flag frames keep the real
  *     column types whatever the corpus keys on, so a sink never sees a
  *     type flip on an intermittently empty micro-batch);
  *   - SPARSE batch (≤ `literalCap` distinct keys) → a literal `isin`
  *     bucket filter, which prunes index FILES under the bucketed
  *     layout (`SelectedBucketsCount` in the plan — BucketingSpec pins
  *     this before and after appends);
  *   - DENSE batch (> `literalCap`) → the gate's declared
  *     [[DenseProbePolicy]], because a many-thousand-literal filter
  *     costs seconds of DRIVER-side analysis/optimizer time per
  *     micro-batch while pruning little once most buckets are touched
  *     (the r15 span-probe lesson, measured at 3.9 s/batch).
  *
  * One implementation instead of four hand-maintained copies
  * ([[DedupGate]]/[[SpanGate]]/[[PerceptGate]]/[[EmbedGate]]) so the
  * next probe lesson lands everywhere at once (r19 verdict task 2);
  * what differs per gate is POLICY, passed in: the literal cap, and
  * what a dense batch means for that key domain.
  */
private[graft] object IndexProbe {

  /** What a probe does when the batch's distinct keys exceed the
    * literal cap — the one place the four gates genuinely differ.
    */
  sealed trait DenseProbePolicy

  /** Fail loudly: the key domain is OPEN (e.g. [[DedupGate]]'s band
    * hashes), so a dense batch means the micro-batch-is-small probe
    * contract is broken and no fallback slice would be cheap — the fix
    * is smaller triggers or the offline path, not a bigger filter.
    */
  final case class FailFast(message: String) extends DenseProbePolicy

  /** Broadcast-semi-join the batch's distinct keys into the scan: legal
    * when the key domain is CLOSED (e.g. [[PerceptGate]]'s 65536-value
    * band keys, [[EmbedGate]]'s 2^nBits buckets), where a dense batch is
    * an expected steady state, not a contract violation.
    */
  case object BroadcastSemiJoin extends DenseProbePolicy

  /** Scan the index plainly up to `hardCap` distinct keys (the caller's
    * downstream broadcast mark join already restricts matched rows —
    * [[SpanGate]]'s shape), failing with `message` above it.
    */
  final case class PlainScanUpTo(hardCap: Int, message: String) extends DenseProbePolicy

  /** A gate's probe-literal bound from session conf (`confKey`), falling
    * back to `default` — parse and positivity failures name the key.
    */
  def confBound(spark: SparkSession, confKey: String, default: Int): Int =
    spark.conf.getOption(confKey).map { raw =>
      val parsed = try raw.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$confKey must be a positive integer, got '$raw'")
      }
      require(parsed > 0,
        s"$confKey must be positive, got $parsed — " +
          "a non-positive bound would reject every non-empty batch")
      parsed
    }.getOrElse(default)

  /** The slice of `table` the batch frame `keyed` can collide with on
    * its Long-typed `keyCol` (see the object doc for the
    * sparse/dense/empty shape). The distinct-key collect is bounded:
    * at most `literalCap + 1` keys (enough to detect density) — or
    * `hardCap + 1` under [[PlainScanUpTo]], whose bound must be
    * enforced by counting.
    */
  def prunedSlice(spark: SparkSession, table: String, keyed: DataFrame,
      keyCol: String, literalCap: Int, dense: DenseProbePolicy): DataFrame = {
    require(literalCap > 0, s"literalCap must be positive, got $literalCap")
    val collectCap = dense match {
      case PlainScanUpTo(hardCap, _) => math.max(literalCap, hardCap)
      case _ => literalCap
    }
    val keys = keyed.select(keyCol).distinct()
      .limit(collectCap + 1).collect().map(_.getLong(0))
    dense match {
      case FailFast(msg) if keys.length > literalCap =>
        throw new IllegalArgumentException(msg)
      case PlainScanUpTo(hardCap, msg) if keys.length > hardCap =>
        throw new IllegalArgumentException(msg)
      case _ => ()
    }
    if (keys.isEmpty) spark.table(table).limit(0)
    else if (keys.length <= literalCap)
      spark.table(table).filter(col(keyCol).isin(keys.toIndexedSeq: _*))
    else dense match {
      case BroadcastSemiJoin =>
        spark.table(table)
          .join(broadcast(keyed.select(keyCol).distinct()), Seq(keyCol), "left_semi")
      case PlainScanUpTo(_, _) => spark.table(table)
      case FailFast(_) =>
        throw new IllegalStateException("unreachable: FailFast handled above")
    }
  }
}

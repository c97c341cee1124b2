package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003 §4) as a native
  * expression: for a text column, return the 1-based CHARACTER positions
  * of the selected K-gram sites — from every window of `winW` consecutive
  * gram positions, the leftmost minimum-hash gram (a doc with fewer than
  * `winW` grams gets one whole-doc window, so short docs still
  * participate).
  *
  * Why native: the same selection as SQL array algebra re-folds every
  * window (O(n·w) boxed lambda steps — measured 4× slower than the whole
  * exact-gram pipeline at sf0.1); this runs the textbook O(n) algorithm —
  * one rolling polynomial hash pass over the code points (finalized with
  * murmur fmix64 so raw text structure cannot bias the minimum), one
  * monotonic-deque sliding-window-min pass — per document, on primitive
  * arrays. The [[FloatDot]]/[[SlotMatch]] precedent, applied to the span
  * family's hot path.
  *
  * Selection contract (what [[graft.operators.SpanOps]]' guarantees rest
  * on): the selected set is a pure function of gram-hash CONTENT within
  * each window — two copies of a duplicated run make the same relative
  * choice in every window that lies fully inside the run (the deque's
  * leftmost-tie rule compares positions only within one window, where
  * global and relative order coincide), so every run of length ≥ K+w−1
  * is selected at BOTH copies. Hash ties between distinct grams are
  * harmless: either instance of the minimal content is selected at each
  * copy, and the mark join counts by gram content, not position.
  *
  * Positions are CODE-POINT indices (Spark's `substring`/`length` unit),
  * so `substring(text, pos, K)` decodes the selected gram exactly even
  * for non-BMP text.
  *
  * Cost note: evaluation is CodegenFallback — the O(n) per-row work
  * dominates the one virtual call, unlike the per-pair [[SlotMatch]]
  * where the call would; the surrounding projection feeds a Generate
  * (explode) anyway, so no meaningful whole-stage span is broken.
  */
case class WinnowSelect(child: Expression, gramK: Int, winW: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramK >= 1 && winW >= 1, s"gramK=$gramK winW=$winW must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_select requires a STRING argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      WinnowSelect.selectPositions(input.asInstanceOf[UTF8String].toString, gramK, winW))

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {

  def winnow_select(text: Column, gramK: Int, winW: Int): Column =
    GraftShim.column(WinnowSelect(GraftShim.expression(text), gramK, winW))

  /** Rolling polynomial hash base. Part of the selection geometry: a
    * different base selects different sites, so the value participates in
    * [[schemeTag]] and changing it invalidates persisted gram indexes.
    */
  private[graft] val PolyBase = 1000003L

  /** MurmurHash3 fmix64 multipliers (public constants, Appleby 2011). */
  private[graft] val FmixC1 = 0xff51afd7ed558ccdL
  private[graft] val FmixC2 = 0xc4ceb9fe1a85ec53L

  /** Tag of the selection algorithm's full constant set — built FROM the
    * live constants (not a hand-maintained literal), so changing the
    * polynomial base, the fmix multipliers, or the tie-break rule changes
    * the tag automatically. [[graft.streaming.SpanGate]] stamps it into
    * every eval-gram index's meta table and refuses probes under a
    * different tag: selected SITES (not just hash values) depend on all
    * of these, and a silent change would desynchronize detection against
    * persisted indexes.
    */
  private[graft] def schemeTag: String =
    f"poly$PolyBase%d-fmix64($FmixC1%016x,$FmixC2%016x)-tie-leftmost"

  /** MurmurHash3 fmix64: decorrelates the rolling polynomial hash so the
    * window minimum is uniform over gram content, not over text structure.
    */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= FmixC1
    x ^= x >>> 33; x *= FmixC2
    x ^= x >>> 33; x
  }

  /** 1-based code-point positions of the winnow-selected gram sites,
    * ascending, distinct. Exposed for the spec's independent replay.
    */
  private[graft] def selectPositions(s: String, k: Int, w: Int): Array[Int] = {
    val cps = s.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return Array.emptyIntArray
    // rolling polynomial gram hashes, 1-based, fmix64-finalized
    val B = PolyBase
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk *= B; j += 1 }
    val hs = new Array[Long](n + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    hs(1) = fmix64(h)
    var p = 1
    while (p < n) {
      h = (h - cps(p - 1) * bk) * B + cps(p + k - 1)
      p += 1
      hs(p) = fmix64(h)
    }
    if (n < w) {
      // single whole-doc window: leftmost minimum
      var best = 1
      var q = 2
      while (q <= n) { if (hs(q) < hs(best)) best = q; q += 1 }
      return Array(best)
    }
    // monotonic deque sliding-window min; strict pop keeps the leftmost
    // of equal hashes at the front
    val dq = new Array[Int](n + 1)
    var head = 0
    var tail = 0
    val out = new Array[Int](n)
    var m = 0
    var e = 1
    while (e <= n) {
      while (tail > head && hs(dq(tail - 1)) > hs(e)) tail -= 1
      dq(tail) = e
      tail += 1
      val s0 = e - w + 1
      if (s0 >= 1) {
        while (dq(head) < s0) head += 1
        val sel = dq(head)
        if (m == 0 || out(m - 1) != sel) { out(m) = sel; m += 1 }
      }
      e += 1
    }
    java.util.Arrays.copyOf(out, m)
  }
}

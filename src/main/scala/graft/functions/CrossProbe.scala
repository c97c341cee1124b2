package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-probe kernels for the cross-set contamination family
  * (r21 optimization round, guide §2.3/§2.4 "shuffle keys and metadata
  * instead of payloads" + §8's attach-without-a-join lesson): the eval
  * side of `decontaminate` / `decontaminate_spans` is BENCHMARK-SIZED by
  * documented contract and was already broadcast — a BroadcastHashJoin
  * collects it to the driver and ships it to every executor. These
  * kernels keep that exact data movement (one driver-side collect of the
  * same aggregated eval relation, one `sparkContext.broadcast`) but
  * replace the train side's generate-explode-probe-reaggregate pipeline
  * with ONE narrow per-row pass:
  *
  *  - [[CrossSpanProbe]]: instead of materializing every K-gram of every
  *    train doc as a 30-char string row (CharGrams array + posexplode —
  *    K× the corpus bytes, one join-probe row per gram), walk the doc's
  *    code points once, probe each K-gram window against the broadcast
  *    map as a ZERO-COPY byte slice, and merge marked sites into maximal
  *    spans inline (the [[graft.operators.SpanOps.mergeSpans]] rule,
  *    K-touching islands) — so the per-doc window shuffle disappears
  *    too: marked sites of one doc never leave the row that owns them.
  *  - [[ShingleProbe]]: instead of materializing every 8-token shingle
  *    string (array_join(slice(...)) per position — ~8× corpus bytes)
  *    and re-aggregating matched occurrences by doc, walk the doc's
  *    space-separated token boundaries once and probe each shingle as a
  *    zero-copy byte slice (split-by-single-space means every shingle IS
  *    a contiguous substring of the text between token boundaries —
  *    rejoining with ' ' reproduces the original bytes, empty tokens
  *    included), counting distinct matched shingles and the min eval id
  *    in-row.
  *
  * Both kernels are EXACT (the declared keys stay oracle-checked): the
  * probe key is the gram/shingle BYTES, not a hash, and the merge /
  * distinct-count / min rules replicate the Column-algebra forms
  * operation for operation (pinned value-identical in SpanSpec /
  * DedupSpec over randomized inputs). The broadcast handle rides the
  * expression as a constructor field — metadata on the plan, the payload
  * moves through the torrent broadcast exactly as the join's
  * BroadcastExchange did.
  */
object CrossProbe {

  /** Eval-gram table in broadcast form: parallel arrays of (gram,
    * first_eval, first_eval_pos), map built lazily per executor.
    */
  final case class GramTable(grams: Array[String], feDoc: Array[Long],
      fePos: Array[Long]) {
    @transient lazy val index: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer](grams.length * 2)
      var i = 0
      while (i < grams.length) {
        m.put(UTF8String.fromString(grams(i)), Integer.valueOf(i))
        i += 1
      }
      m
    }
  }

  /** Eval-shingle table in broadcast form: shingle → min eval doc id. */
  final case class ShingleTable(shingles: Array[String], evalId: Array[Long]) {
    @transient lazy val index: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](shingles.length * 2)
      var i = 0
      while (i < shingles.length) {
        m.put(UTF8String.fromString(shingles(i)), java.lang.Long.valueOf(evalId(i)))
        i += 1
      }
      m
    }
  }

  def cross_span_probe(text: Column, table: Broadcast[GramTable], k: Int): Column =
    GraftShim.column(CrossSpanProbe(GraftShim.expression(text), table, k))

  def shingle_probe(text: Column, table: Broadcast[ShingleTable], w: Int): Column =
    GraftShim.column(ShingleProbe(GraftShim.expression(text), table, w))
}

/** Per-doc cross-span detection against a broadcast eval-gram table:
  * emits the maximal spans of K-gram sites whose gram occurs in the
  * table — `(span_start, span_end, span_len, n_grams, first_eval,
  * first_eval_pos)` per span, positions 1-based code-point indices, span
  * merge and lexicographic-min attribution exactly as
  * `SpanOps.mergeSpans(marked, min(struct(first_eval, first_eval_pos)))`
  * computes them (a new span starts when the gap between marked starts
  * exceeds K; span_end = last start + K). Docs with no marked site
  * return an EMPTY array — `explode` then emits no row, matching the
  * inner join's row domain.
  */
case class CrossSpanProbe(child: Expression,
    table: Broadcast[CrossProbe.GramTable], gramK: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramK >= 1, s"gramK=$gramK must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("span_start", LongType, nullable = false),
    StructField("span_end", LongType, nullable = false),
    StructField("span_len", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("first_eval", LongType, nullable = false),
    StructField("first_eval_pos", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cross_span_probe"
  // the broadcast handle prints compactly, but keep plan strings stable
  override def toString: String = s"cross_span_probe($child, k=$gramK)"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cross_span_probe requires a STRING argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    // code-point start offsets (the CharGrams indexing pass)
    val starts = new Array[Int](bytes.length + 1)
    var m = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(m) = i; m += 1 }
      i += 1
    }
    starts(m) = bytes.length
    val k = gramK
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val idx = table.value.index
    val feD = table.value.feDoc
    val feP = table.value.fePos
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    // island state (positions are 1-based gram starts, ascending)
    var spanStart = -1L
    var lastPos = -1L
    var nGrams = 0L
    var feDoc = Long.MaxValue
    var fePos = Long.MaxValue
    def flush(): Unit = if (spanStart >= 0) {
      val row = new GenericInternalRow(6)
      row.setLong(0, spanStart)
      row.setLong(1, lastPos + k)
      row.setLong(2, lastPos + k - spanStart)
      row.setLong(3, nGrams)
      row.setLong(4, feDoc)
      row.setLong(5, fePos)
      out += row
    }
    var g = 0
    while (g <= m - k) {
      val hit = idx.get(UTF8String.fromBytes(bytes, starts(g), starts(g + k) - starts(g)))
      if (hit != null) {
        val pos = (g + 1).toLong
        if (spanStart < 0 || pos > lastPos + k) {
          flush()
          spanStart = pos
          nGrams = 0L
          feDoc = Long.MaxValue
          fePos = Long.MaxValue
        }
        lastPos = pos
        nGrams += 1L
        val e = hit.intValue()
        // lexicographic min of (first_eval, first_eval_pos) — the
        // min(struct(...)) aggregation rule
        if (feD(e) < feDoc || (feD(e) == feDoc && feP(e) < fePos)) {
          feDoc = feD(e)
          fePos = feP(e)
        }
      }
      g += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CrossSpanProbe =
    copy(child = newChild)
}

/** Per-doc shingle contamination against a broadcast eval-shingle table:
  * `(n_shared, first_eval)` where n_shared counts DISTINCT matched
  * 8-token shingles and first_eval is the minimum eval doc id over all
  * matched shingles — exactly `groupBy(doc_id).agg(countDistinct(shingle),
  * min(eval_id))` over the broadcast join's output (the map value is
  * already the per-shingle min eval id; min of mins = min over the join
  * rows). NULL when no shingle matches — the inner join emits no row for
  * such docs, and the caller filters nulls to keep the row domain.
  *
  * Tokenization replicates `split(text, ' ')` (Java split, limit −1:
  * consecutive separators yield empty tokens, trailing empties kept) and
  * `array_join(slice(t, i, 8), ' ')`: with a single-space separator the
  * rejoined shingle is byte-identical to the contiguous text slice
  * between token boundaries, so every probe is a zero-copy view.
  */
case class ShingleProbe(child: Expression,
    table: Broadcast[CrossProbe.ShingleTable], shingleW: Int)
    extends UnaryExpression with CodegenFallback {
  require(shingleW >= 1, s"shingleW=$shingleW must be positive")

  // 0/1-element ARRAY rather than a nullable struct: the caller explodes
  // it, and a Generate is never duplicated by filter pushdown — a
  // nullable struct + isNotNull filter got the probe evaluated TWICE per
  // row (the guide §4.4 duplication, seen in the first r21 plan capture)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_shared", LongType, nullable = false),
    StructField("first_eval", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_probe"
  override def toString: String = s"shingle_probe($child, w=$shingleW)"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_probe requires a STRING argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    // token start offsets under split-by-single-space semantics: token i
    // spans [tok(i), tok(i+1) - 1) except the last, which ends at EOS.
    // 0x20 never occurs inside a UTF-8 multi-byte sequence.
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    val w = shingleW
    if (nTok < w) return new GenericArrayData(Array.empty[Any])
    val tok = new Array[Int](nTok + 1)
    tok(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { tok(t) = i + 1; t += 1 }
      i += 1
    }
    tok(nTok) = bytes.length + 1
    val idx = table.value.index
    var matched: java.util.HashSet[UTF8String] = null
    var minEval = Long.MaxValue
    var s = 0
    while (s <= nTok - w) {
      val off = tok(s)
      val end = tok(s + w) - 1 // strip the trailing separator
      val key = UTF8String.fromBytes(bytes, off, end - off)
      val hit = idx.get(key)
      if (hit != null) {
        if (matched == null) matched = new java.util.HashSet[UTF8String]()
        matched.add(key)
        if (hit.longValue() < minEval) minEval = hit.longValue()
      }
      s += 1
    }
    if (matched == null) new GenericArrayData(Array.empty[Any])
    else {
      val row = new GenericInternalRow(2)
      row.setLong(0, matched.size().toLong)
      row.setLong(1, minEval)
      new GenericArrayData(Array[Any](row))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleProbe =
    copy(child = newChild)
}

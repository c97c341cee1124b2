package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary-scale BPE ENCODE as a native expression: tokenize a whole
  * document against a trained merge table in ONE JVM pass per row —
  * the application half of the tokenizer at the scale the training half
  * ([[graft.operators.TextOps.bpeMergesTrained]]) already reaches. The
  * replace-chain form ([[graft.operators.TextOps.bpeEncodeFrom]])
  * materializes one chained string `replace` per merge, so its plan
  * grows LINEARLY with the vocabulary — fine at 10 merges, dead long
  * before a production tokenizer's ~32k. Here the merge table rides the
  * expression as one constant (shipped once per task in the plan, the
  * [[WinnowSelect]] broadcast-table precedent), and per-document cost is
  * O(chars · log chars) hash-map lookups + heap ops, INDEPENDENT of
  * vocabulary size — encode wall stays flat as the merge count grows
  * (recorded in BPE_BENCH.json's encode curve).
  *
  * Semantics: the textbook priority-queue BPE encode (Sennrich et al.
  * 2016; the GPT-2/HF application order). Per whitespace word, symbols
  * start as single CODE POINTS (Spark's `split`/`length` unit); while
  * any adjacent symbol pair is in the merge table, merge the pair with
  * the LOWEST rank, leftmost occurrence first. Mechanics per word: a
  * doubly-linked symbol list plus a min-heap of `(rank, position)` keys
  * packed into one long — popped entries are validated against the
  * pair's CURRENT rank (content changes re-push fresh keys, so every
  * live pair always has an entry at its true rank; stale entries are
  * skipped), which keeps the heap correct without deletions.
  *
  * Equivalence contract with the replace-chain form: in-rank-order full
  * passes equal priority-queue encoding exactly when no merge's OUTPUT
  * string equals an EARLIER merge's part (the condition
  * `bpeEncodeFrom` requires and every [[graft.operators.TextOps
  * .bpeMerges]]-trained table satisfies by construction — a merged pair
  * can never become adjacent again, so its concatenation cannot be
  * re-learned). QueriesSpec pins the two forms row-identical on the
  * trained table, and this form against an independent driver-side
  * priority encoder at 1k+ merges. Unlike the chain, this form needs no
  * such validity condition (it IS the standard algorithm) and no
  * symbol-boundary sentinel, so bar-bearing corpora encode fine.
  *
  * Returns per row: `(n_words, n_chars, toks)` — nonempty whitespace
  * word count, total code points across words, and the full token
  * sequence in document order (clean strings, no sentinel wrapping).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a STRING argument, got ${t.simpleString}")
  }

  /** `left → right → rank`, built once per deserialized instance (per
    * executor), not per row; duplicate pairs keep the LOWEST rank (a
    * trained table has none — this makes foreign tables safe too).
    */
  @transient private lazy val ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var i = 0
    merges.foreach { case (l, r) =>
      val inner = m.computeIfAbsent(l, _ => new java.util.HashMap[String, Integer]())
      // boxed Integer values so an ABSENT pair is null, not an unboxed 0
      // masquerading as rank 0
      if (!inner.containsKey(r)) inner.put(r, Integer.valueOf(i))
      i += 1
    }
    m
  }

  private def rankOf(l: String, r: String): Int = {
    val inner = ranks.get(l)
    if (inner eq null) -1
    else {
      val v = inner.get(r)
      if (v eq null) -1 else v.intValue()
    }
  }

  protected override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = new ArrayBuffer[UTF8String]()
    var nWords = 0L
    var nChars = 0L
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) {
          nWords += 1
          nChars += encodeWordInto(text, start, i, toks)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, nChars,
      ArrayData.toArrayData(toks.toArray[AnyRef])))
  }

  /** Encodes `text[from, until)` (one word), appends its tokens, returns
    * its base symbol (code point) count.
    */
  private def encodeWordInto(text: String, from: Int, until: Int,
      out: ArrayBuffer[UTF8String]): Long = {
    // split into code-point symbols
    var n = 0
    var i = from
    while (i < until) { i += Character.charCount(text.codePointAt(i)); n += 1 }
    val syms = new Array[String](n)
    i = from
    var k = 0
    while (i < until) {
      val c = Character.charCount(text.codePointAt(i))
      syms(k) = text.substring(i, i + c)
      i += c
      k += 1
    }
    if (n == 1) { out += UTF8String.fromString(syms(0)); return 1L }
    // doubly-linked list over original indices; heap keys (rank << 32 | pos)
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var j = 0
    while (j < n) { next(j) = j + 1; prev(j) = j - 1; alive(j) = true; j += 1 }
    next(n - 1) = -1
    var heap = new Array[Long](2 * n)
    var hn = 0
    def push(key: Long): Unit = {
      if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
      heap(hn) = key
      var c = hn
      hn += 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hn -= 1
      heap(0) = heap(hn)
      var c = 0
      var go = true
      while (go) {
        val l = 2 * c + 1
        val r = l + 1
        var m = c
        if (l < hn && heap(l) < heap(m)) m = l
        if (r < hn && heap(r) < heap(m)) m = r
        if (m == c) go = false
        else { val t = heap(m); heap(m) = heap(c); heap(c) = t; c = m }
      }
      top
    }
    j = 0
    while (j < n - 1) {
      val r = rankOf(syms(j), syms(j + 1))
      if (r >= 0) push((r.toLong << 32) | j.toLong)
      j += 1
    }
    while (hn > 0) {
      val key = pop()
      val rank = (key >>> 32).toInt
      val pos = (key & 0xffffffffL).toInt
      if (alive(pos)) {
        val nx = next(pos)
        // stale unless the pair's CURRENT content still has this rank
        if (nx >= 0 && rankOf(syms(pos), syms(nx)) == rank) {
          syms(pos) = syms(pos) + syms(nx)
          alive(nx) = false
          next(pos) = next(nx)
          if (next(pos) >= 0) prev(next(pos)) = pos
          val p = prev(pos)
          if (p >= 0) {
            val r2 = rankOf(syms(p), syms(pos))
            if (r2 >= 0) push((r2.toLong << 32) | p.toLong)
          }
          val q = next(pos)
          if (q >= 0) {
            val r2 = rankOf(syms(pos), syms(q))
            if (r2 >= 0) push((r2.toLong << 32) | pos.toLong)
          }
        }
      }
    }
    j = 0
    while (j >= 0) { out += UTF8String.fromString(syms(j)); j = next(j) }
    n.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    GraftShim.column(BpeEncode(GraftShim.expression(text), merges))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The char-bigram LM surprisal sum as ONE native per-row pass — the
  * decimal(18,6)-rounded term sum the charlm family divides by
  * `n_bigrams`:
  *
  *   Σᵢ log₂( (c(aᵢbᵢ)+1) / (c(aᵢ)+V) )   rounded per term to 6 dp,
  *
  * exactly the quantity `aggregate(char_grams(text,2), …)` folded and
  * `Num.dsum(log2(…))` aggregated — the caller still negates and
  * divides in Column algebra, so this slots into BOTH existing scoring
  * forms' outer arithmetic unchanged.
  *
  * Why native (the [[WinnowSelect]]/[[PqEncode]] precedent, r16 verdict
  * task 3): the r16 fold put [[CharGrams]] (CodegenFallback) INSIDE a
  * higher-order `aggregate` lambda, so every bigram paid an interpreted
  * Catalyst dispatch chain (element_at, log2, two decimal casts ≈ 7
  * interpreted nodes/term) — linear in doc size but with a ~10×
  * interpretation constant, measured as charlm_quality 0.41 → 0.91 s on
  * 540-char docs. The join form pays differently: explode multiplies
  * the corpus by doc length and re-aggregates by doc_id. This runs the
  * identical arithmetic as one tight JVM loop per row — no explode, no
  * shuffle, no per-term expression dispatch — and is pinned
  * bit-identical to the join form in CharLmSpec.
  *
  * Bit-identity discipline, mirrored operation by operation:
  *  - lookup misses are 0 (`coalesce(…, 0)`), add-one smoothing on the
  *    bigram count, `+V` on the context count — both sums in Long;
  *  - the ratio divides as DOUBLE (Spark's Divide promotes the bigint
  *    operands), log₂ via `StrictMath.log(x)/StrictMath.log(2)` —
  *    Spark's Log2 codegen calls `java.lang.StrictMath.log`, and
  *    Math.log differs from StrictMath.log in the last bit for ~4% of
  *    inputs on this JVM, enough to flip a term sitting within 1 ulp of
  *    a decimal(18,6) rounding boundary (r17 ADVICE — the argument is
  *    always > 0, the null asymptote is unreachable);
  *  - each term rounds to decimal(18,6) exactly as Spark's double→
  *    decimal cast: `java.math.BigDecimal.valueOf` (shortest decimal
  *    representation) then HALF_UP at scale 6;
  *  - terms sum exactly (BigDecimal, scale 6 — associative, so document
  *    order ≡ any aggregation order) and the sum casts to double by
  *    `BigDecimal.doubleValue`, Spark's decimal→double cast.
  *
  * The model rides as two `Map[String, Long]` constructor constants
  * (structural case-class equality — the [[PqEncode]] IndexedSeq
  * stance) bounded by `HygieneOps.CharLmLiteralMax`; lookups go through
  * a lazily built open-addressed long→long table keyed by packed code
  * points (21 bits each — no per-gram string allocation). NULL when the
  * text has fewer than two code points (no bigram — the callers' `when`
  * guard domain) or is null.
  */
case class CharLmBitSum(child: Expression, bg: Map[String, Long],
    a: Map[String, Long], v: Long) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "charlm_bitsum"
  // the default case-class toString would print the whole model into
  // plan strings (the PqEncode plan-bloat lesson)
  override def toString: String = s"charlm_bitsum($child)"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"charlm_bitsum requires a STRING argument, got ${t.simpleString}")
  }

  /** cp1 in the high 21 bits, cp2 low — code points are ≤ 0x10FFFF, so
    * packed keys are non-negative and −1 is a safe empty-slot marker.
    */
  private def pack(cp1: Int, cp2: Int): Long = (cp1.toLong << 21) | cp2.toLong

  // per-gram lookups go through the shared no-boxing table
  // ([[LongTables]] — one probing/capacity implementation for both
  // charlm halves)
  import LongTables.LongLongMap

  @transient private lazy val bgTable: LongLongMap = new LongLongMap(
    bg.iterator.map { case (k, c) =>
      require(k.codePointCount(0, k.length) == 2,
        s"charlm bigram model key '$k' is not 2 code points")
      val cp1 = k.codePointAt(0)
      pack(cp1, k.codePointAt(Character.charCount(cp1))) -> c
    }, bg.size)

  @transient private lazy val aTable: LongLongMap = new LongLongMap(
    a.iterator.map { case (k, c) =>
      require(k.codePointCount(0, k.length) == 1,
        s"charlm context model key '$k' is not 1 code point")
      k.codePointAt(0).toLong -> c
    }, a.size)

  private val log2d = StrictMath.log(2)

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    val bgT = bgTable
    val aT = aTable
    var sum = java.math.BigDecimal.ZERO
    var prev = s.codePointAt(0)
    var i = Character.charCount(prev)
    if (i >= s.length) return null // single code point: no bigram
    while (i < s.length) {
      val cur = s.codePointAt(i)
      val cBg = bgT.getOrZero(pack(prev, cur))
      val cA = aT.getOrZero(prev.toLong)
      val term = StrictMath.log((cBg + 1L).toDouble / (cA + v).toDouble) / log2d
      sum = sum.add(java.math.BigDecimal.valueOf(term)
        .setScale(6, java.math.RoundingMode.HALF_UP))
      prev = cur
      i += Character.charCount(cur)
    }
    sum.doubleValue()
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmBitSum =
    copy(child = newChild)
}

object CharLmBitSum {
  def charlm_bitsum(text: Column, bg: Map[String, Long],
      a: Map[String, Long], v: Long): Column =
    GraftShim.column(CharLmBitSum(GraftShim.expression(text), bg, a, v))
}

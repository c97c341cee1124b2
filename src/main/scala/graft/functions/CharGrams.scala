package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping character n-grams of a string in ONE pass over its
  * UTF-8 bytes — the `lang_id`/`heavy_hitters` gram generator.
  *
  * The Column form (`transform(sequence(1, length-2), i ->
  * substring(text, i, 3))`) is QUADRATIC per document: every
  * `substring(text, i, n)` call re-scans the string from byte 0 to find
  * the i-th code point, so a d-char doc costs Θ(d²) byte reads — measured
  * as the whole cost of `heavy_hitters` at sf0.1 (chars-linear work
  * budgeted, quadratic delivered). Here the code-point starts are indexed
  * once (O(d)) and each gram is a zero-copy byte-slice view.
  *
  * Semantics are exactly the Column form's, CODE-POINT grams: a string of
  * m code points yields max(0, m−n+1) grams of n code points each —
  * identical to Spark `substring` and DuckDB `substr` windows (both count
  * code points, surrogate pairs included), which is what keeps the
  * `heavy_hitters` oracle cross-engine. Pinned three ways in QueriesSpec:
  * ≡ the transform/substring Column form, ≡ a driver-side
  * `String.codePoints` reference, on ASCII / accents / CJK /
  * supplementary-plane emoji / degenerate lengths.
  *
  * CodegenFallback as with [[WinnowSelect]]: the per-row O(d) loop
  * dominates the one virtual call.
  */
case class CharGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_grams requires a STRING argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // index the code-point start offsets once; UTF-8 continuation bytes
    // are exactly those matching 10xxxxxx
    val starts = new Array[Int](bytes.length + 1)
    var m = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(m) = i; m += 1 }
      i += 1
    }
    starts(m) = bytes.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var g = 0
    while (g <= m - n) {
      out(g) = UTF8String.fromBytes(bytes, starts(g), starts(g + n) - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  def char_grams(text: Column, n: Int): Column =
    GraftShim.column(CharGrams(GraftShim.expression(text), n))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two ARRAY<BIGINT> signatures agree — the
  * minhash slot-agreement verifier as a native codegen expression.
  *
  * Semantics are EXACTLY the interpreted HOF form it replaces,
  * `size(filter(zip_with(a, b, (p, q) -> p = q), m -> m))`, asserted
  * bit-identical in DedupSpec: `zip_with` null-pads the shorter array and
  * a null operand nulls its comparison, `filter(m -> m)` drops null and
  * false entries — so the count covers only positions BOTH arrays define
  * with non-null equal values (a length mismatch silently compares the
  * common prefix, exactly as the HOF did). The win is mechanical, the
  * same as [[FloatDot]]'s: higher-order functions run interpreted
  * (per-element lambda dispatch + two intermediate arrays per row), this
  * compiles to a tight primitive loop inside the whole-stage-codegen
  * span. The expression sits on every candidate pair of the batch dedup
  * path and every band collision of the streaming ingest gate — at
  * corpus scale that row count is billions, not the bounded test sizes.
  */
case class SlotMatch(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "slot_match"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"slot_match requires two ARRAY<BIGINT> arguments, got ${l.simpleString} and ${r.simpleString}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SlotMatch =
    copy(left = newLeft, right = newRight)
}

object SlotMatch {
  def slot_match(a: Column, b: Column): Column =
    GraftShim.column(SlotMatch(GraftShim.expression(a), GraftShim.expression(b)))
}

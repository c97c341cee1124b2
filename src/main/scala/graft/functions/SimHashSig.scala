package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** 64-bit SimHash of a STRING array in one pass: each element is
  * xxhash64'd once (seed 42, matching Spark's `xxhash64` SQL function),
  * its 64 bits vote ±1 into per-bit counters, and bit i of the result is
  * set where the vote sum is positive.
  *
  * Bit-identical to the expression form
  * `aggregate(sequence(0,63), 0L, (acc,i) -> acc + if(aggregate(toks, 0L,
  * (a,t) -> a + if((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)) > 0,
  * shiftleft(1,i), 0))` (null elements vote with the bare seed, exactly
  * like `xxhash64(NULL)`), but one JIT'd loop per row instead of
  * 64 × |tokens| interpreted lambda dispatches — the identical hotspot
  * shape [[MinHashSig]] removed from dedup_minhash in round 1.
  */
case class SimHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires an ARRAY<STRING> argument, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h =
        if (s == null) 42L // xxhash64(NULL) leaves the seed untouched
        else {
          val b = s.getBytes
          XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
        }
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) acc |= 1L << j
      j += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def simhash_sig(c: Column): Column =
    GraftShim.column(SimHashSig(GraftShim.expression(c)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Computes a k-permutation MinHash signature of a STRING array in one
  * pass: each element is xxhash64'd once, then k seeded integer re-hashes
  * update k running minima.
  *
  * Replaces the expression-only form
  * `transform(sequence(0,k-1), k -> aggregate(shingles, MAX, least(..)))`,
  * whose interpreted higher-order-function dispatch (k x |shingles| boxed
  * lambda calls per row — ~10M at sf0.1) dominated the dedup_minhash
  * stage. One JIT'd loop per row instead. Deterministic (seed 42 like
  * Spark's xxhash64 SQL function, then plane index as the re-hash seed).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an ARRAY<STRING> argument, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val b = s.getBytes
        val h0 = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
        var j = 0
        while (j < k) {
          val hj = XXH64.hashLong(h0, j.toLong)
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhash_sig(c: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(c), k))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Random-hyperplane LSH bucket id of an ARRAY<FLOAT> embedding as a
  * native codegen expression — the fourth instance of the established
  * HOF-to-native pattern (FloatDot, MinHashSig, SimHashSig; measured
  * 3-6.7x each).
  *
  * Semantics are EXACTLY the interpreted SQL it replaces (r7
  * `VectorOps.bucketExpr`, pinned bit-identical in VectorSpec):
  *
  * {{{
  * aggregate(sequence(0, nBits-1), 0L, (acc, k) -> acc +
  *   if(aggregate(sequence(0, dims-1), 0.0D,
  *        (s, d) -> s + double(element_at(embedding, d + 1))
  *                    * (double(xxhash64(k, d)) / 9.223372036854775807E18)) >= 0.0D,
  *      shiftleft(1L, k), 0L))
  * }}}
  *
  * i.e. bit k is set iff the dot product of the embedding with
  * pseudo-random hyperplane k (seeded xxhash64 per (plane, dim), scaled
  * to [-1, 1]) is non-negative, accumulated in ascending d order (float
  * widened to double per element — the fold is order-sensitive, so the
  * loop preserves it).
  *
  * The mechanical win over the HOF goes beyond dodging interpreted
  * lambda dispatch: the plane weights depend only on (k, d), so the
  * whole nBits x dims matrix is hashed ONCE at plan time and embedded as
  * a codegen reference object — the HOF re-hashed xxhash64 per (row,
  * plane, dim), i.e. nBits*dims hashes per ROW of a 100 TB scan, all of
  * it loop-invariant.
  *
  * Null semantics mirror the HOF exactly: a null array or any null
  * element nulls the inner fold, the null predicate takes If's false
  * branch, every bit stays 0 — bucket 0, never SQL NULL. An array
  * shorter than `dims` fails loudly (ANSI element_at would throw there
  * too); extra trailing dims are ignored like the HOF's bounded
  * sequence.
  */
case class LshBucket(child: Expression, nBits: Int, dims: Int = 64)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")
  require(dims >= 1, s"dims must be positive, got $dims")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires an ARRAY<FLOAT> argument, got ${other.simpleString}")
  }

  @transient private lazy val planes: Array[Array[Double]] =
    LshBucket.planesFor(nBits, dims)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < dims) throw new IllegalArgumentException(
      s"lsh_bucket: embedding has $n elements, hyperplanes need $dims")
    var d = 0
    while (d < dims) {
      if (arr.isNullAt(d)) return 0L
      d += 1
    }
    var bucket = 0L
    var k = 0
    while (k < nBits) {
      val p = planes(k)
      var s = 0.0
      var i = 0
      while (i < dims) {
        s += arr.getFloat(i).toDouble * p(i)
        i += 1
      }
      if (s >= 0.0) bucket |= (1L << k)
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val hasNull = ctx.freshName("hasNull")
    val d = ctx.freshName("d")
    val k = ctx.freshName("k")
    val p = ctx.freshName("p")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val bucket = ctx.freshName("bucket")
    val javaCode =
      code"""
        ${childGen.code}
        long $bucket = 0L;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
          int $n = $arr.numElements();
          if ($n < $dims) {
            throw new IllegalArgumentException(
              "lsh_bucket: embedding has " + $n + " elements, hyperplanes need " + $dims);
          }
          boolean $hasNull = false;
          for (int $d = 0; $d < $dims; $d++) {
            if ($arr.isNullAt($d)) { $hasNull = true; break; }
          }
          if (!$hasNull) {
            for (int $k = 0; $k < $nBits; $k++) {
              double[] $p = $planesRef[$k];
              double $s = 0.0;
              for (int $i = 0; $i < $dims; $i++) {
                $s += (double) $arr.getFloat($i) * $p[$i];
              }
              if ($s >= 0.0) $bucket |= (1L << $k);
            }
          }
        }
        long ${ev.value} = $bucket;
      """
    ev.copy(code = javaCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** The (k, d) -> weight hyperplane matrix, hashed exactly as the SQL
    * `xxhash64(k, d)` call the HOF made: seed 42, k then d folded as
    * INTs, the long scaled by the HOF's own double literal.
    */
  private[functions] def planesFor(nBits: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dims) { (k, d) =>
      XxHash64Function.hash(d, IntegerType,
        XxHash64Function.hash(k, IntegerType, 42L)).toDouble / 9.223372036854775807e18
    }

  def lsh_bucket(embedding: Column, nBits: Int): Column =
    GraftShim.column(LshBucket(GraftShim.expression(embedding), nBits))
}

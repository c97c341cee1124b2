package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation: keeps the k best (score, id, payload) triples
  * ordered by (score DESC, id ASC), returning them as a sorted
  * ARRAY<STRUCT<score, id, payload>>.
  *
  * This is the scale-correct form of "top-k per group": the aggregation
  * buffer is bounded at k entries, so map-side partial aggregation reduces
  * each task's slice to <=k rows before the exchange — the shuffle carries
  * |groups| x |tasks| x k rows, versus a `row_number().over(partitionBy)`
  * window which must move EVERY candidate row into |groups| partitions and
  * sort them there (the skew-by-construction pattern when |groups| is
  * small, e.g. 10 query vectors against 1e9 candidates).
  *
  * The tie-break (score DESC, id ASC) matches the reference's 1-NN
  * argmin semantics (`/root/reference/src/ansi.tpp:351-363`: strict
  * comparison keeps the lowest-index entry on equal distance).
  */
case class TopK(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopK.Buf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  // update() casts these blindly, so mistyped args must fail analysis,
  // not throw ClassCastException mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, payload.dataType) match {
      case (DoubleType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i, p) => TypeCheckResult.TypeCheckFailure(
        s"top_k requires (DOUBLE score, BIGINT id, BIGINT payload), got ${s.simpleString}, ${i.simpleString}, ${p.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopK.Buf = new TopK.Buf(k)

  override def update(buf: TopK.Buf, input: InternalRow): TopK.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    // a row without a score or id cannot be ranked and is skipped; a NULL
    // payload does NOT disqualify the candidate — payload is carried
    // metadata, and the output struct field is non-nullable, so NULL maps
    // to the documented sentinel 0L
    if (s != null && i != null) {
      val p = payload.eval(input)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopK.Buf, other: TopK.Buf): TopK.Buf = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i), other.payloads(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopK.Buf): Any =
    new GenericArrayData((0 until buf.size).map { i =>
      InternalRow(buf.scores(i), buf.ids(i), buf.payloads(i))
    }.toArray[Any])

  override def serialize(buf: TopK.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); bb.putLong(buf.payloads(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopK.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopK.Buf(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
}

object TopK {

  /** Fixed-capacity sorted buffer (score DESC, id ASC); insertion is a
    * linear scan — k is small (single digits) by construction.
    */
  final class Buf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    val payloads = new Array[Long](k)
    var size: Int = 0

    private def better(s: Double, i: Long, at: Int): Boolean =
      s > scores(at) || (s == scores(at) && i < ids(at))

    def insert(s: Double, i: Long, p: Long): Unit = {
      // NaN scores (e.g. a zero-norm vector's cosine) are dropped: NaN
      // compares false both ways, so admitting one would make the kept
      // set depend on arrival order — a nondeterminism across task/merge
      // schedules. Dropping is deterministic and matches "rank by score".
      if (s.isNaN) return
      if (size < k || better(s, i, size - 1)) {
        var pos = if (size < k) size else size - 1
        if (size < k) size += 1
        while (pos > 0 && better(s, i, pos - 1)) {
          scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); payloads(pos) = payloads(pos - 1)
          pos -= 1
        }
        scores(pos) = s; ids(pos) = i; payloads(pos) = p
      }
    }
  }

  /** Aggregate Column: ARRAY<STRUCT<score,id,payload>> of the k best rows
    * by (score DESC, id ASC).
    */
  def top_k(score: Column, id: Column, payload: Column, k: Int): Column =
    GraftShim.column(
      TopK(GraftShim.expression(score), GraftShim.expression(id),
        GraftShim.expression(payload), k).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Char-bigram model training as ONE mergeable aggregate pass — the
  * corpus-side half of the charlm family ([[CharLmBitSum]] is the
  * scoring half). For every input string it counts adjacent
  * code-point pairs and collects the distinct code points, directly
  * into a per-partition buffer:
  *
  *   {{{ select bigram_counts(text) }}}  →  one row
  *   (bgs: ARRAY<STRUCT<bg STRING, c BIGINT>>, chars: ARRAY<STRING>,
  *    overflow: BOOLEAN)
  *
  * value-identical to the explode form's three frames —
  * `explode(char_grams(text,2)) → groupBy(bg).count()` for `bgs`,
  * `countDistinct(char_grams(text,1))` for `chars` — when
  * `overflow = false` (pinned in CharLmSpec).
  *
  * Why an aggregate and not explode+groupBy (r16 verdict task 3): the
  * explode form materializes one row PER BIGRAM OCCURRENCE — corpus ×
  * doc-length rows pushed through Generate and a hash aggregate — to
  * produce a result bounded by |charset|². Here each task folds its
  * slice straight into a ≤|charset|²-entry primitive map (open
  * addressing, no boxing, no per-gram allocation), partials merge by
  * pointwise add, and the exchange carries one buffer per task. Same
  * shape as [[MisraGries]], but EXACT — the domain is charset-bounded,
  * so no sketch restriction is needed.
  *
  * Bounded-state discipline: a corpus whose distinct-bigram count
  * exceeds [[BigramCounts.MaxBigrams]] (or charset exceeds
  * [[BigramCounts.MaxChars]]) would grow the buffer past what a
  * metadata-scale model may hold — the buffer then STOPS admitting new
  * keys and raises `overflow`, and the consumer
  * ([[graft.operators.HygieneOps.trainCharLmDriver]]) falls back to the
  * explode+groupBy form, which is correct at any domain size. Counts
  * in an overflowed buffer are unreliable by contract (merges may have
  * admitted different key sets) and must not be read.
  */
case class BigramCounts(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BigramCounts.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_counts requires a STRING argument, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("bgs", ArrayType(
      StructType(Seq(
        StructField("bg", StringType, nullable = false),
        StructField("c", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("chars", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("overflow", BooleanType, nullable = false)))

  override def createAggregationBuffer(): BigramCounts.Buf = new BigramCounts.Buf()

  override def update(buf: BigramCounts.Buf, input: InternalRow): BigramCounts.Buf = {
    val v = child.eval(input)
    if (v != null) buf.addDoc(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: BigramCounts.Buf, other: BigramCounts.Buf): BigramCounts.Buf = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: BigramCounts.Buf): Any = {
    // sorted by packed key for a deterministic row regardless of
    // partial-agg order
    val bgs = buf.bigramEntries.sortBy(_._1).map { case (packed, c) =>
      val s = new java.lang.StringBuilder(4)
      s.appendCodePoint((packed >>> 21).toInt)
      s.appendCodePoint((packed & 0x1FFFFF).toInt)
      InternalRow(UTF8String.fromString(s.toString), c): Any
    }
    val chars = buf.charEntries.sorted.map { cp =>
      val s = new java.lang.StringBuilder(2)
      s.appendCodePoint(cp.toInt)
      UTF8String.fromString(s.toString): Any
    }
    InternalRow(new GenericArrayData(bgs), new GenericArrayData(chars), buf.overflowed)
  }

  override def serialize(buf: BigramCounts.Buf): Array[Byte] = {
    val bgs = buf.bigramEntries
    val chars = buf.charEntries
    val bb = ByteBuffer.allocate(1 + 4 + bgs.length * 16 + 4 + chars.length * 8)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(bgs.length)
    bgs.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.putInt(chars.length)
    chars.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BigramCounts.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BigramCounts.Buf()
    if (bb.get() == 1.toByte) buf.markOverflow()
    var n = bb.getInt
    while (n > 0) { buf.addBigram(bb.getLong, bb.getLong); n -= 1 }
    n = bb.getInt
    while (n > 0) { buf.addChar(bb.getLong); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BigramCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BigramCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BigramCounts =
    copy(child = newChildren(0))
}

object BigramCounts {

  /** Distinct-bigram ceiling before a buffer declares overflow — above
    * the literal-model cap with headroom, since the consumer falls back
    * past `CharLmLiteralMax` anyway.
    */
  val MaxBigrams = 65536

  /** Distinct-code-point ceiling (a full realistic charset is ≤ a few
    * thousand; hitting this means the corpus needs the join-form path).
    */
  val MaxChars = 65536

  // per-gram updates go through the shared no-boxing counter
  // ([[LongTables]] — one probing/capacity implementation for both
  // charlm halves); keys are packed code points, always ≥ 0
  import LongTables.LongLongCounter

  final class Buf {
    private val bgs = new LongLongCounter(1024)
    private val chars = new LongLongCounter(256)
    private var overflow = false

    def overflowed: Boolean = overflow
    def markOverflow(): Unit = overflow = true

    def addDoc(s: String): Unit = {
      if (s.isEmpty) return
      var prev = s.codePointAt(0)
      addChar(prev.toLong)
      var i = Character.charCount(prev)
      while (i < s.length) {
        val cur = s.codePointAt(i)
        addChar(cur.toLong)
        addBigram((prev.toLong << 21) | cur.toLong, 1L)
        prev = cur
        i += Character.charCount(cur)
      }
    }

    def addBigram(k: Long, c: Long): Unit = {
      if (bgs.size >= MaxBigrams && !bgs.contains(k)) overflow = true
      else bgs.add(k, c)
    }

    def addChar(cp: Long): Unit = {
      if (chars.size >= MaxChars && !chars.contains(cp)) overflow = true
      else chars.add(cp, 1L)
    }

    def mergeIn(other: Buf): Unit = {
      if (other.overflow) overflow = true
      other.bgs.entries.foreach { case (k, c) => addBigram(k, c) }
      other.chars.entries.foreach { case (cp, _) => addChar(cp) }
    }

    def bigramEntries: Array[(Long, Long)] = bgs.entries
    def charEntries: Array[Long] = chars.entries.map(_._1)
  }

  /** Aggregate Column: the trained model in one pass (see above). */
  def bigram_counts(text: Column): Column =
    GraftShim.column(
      BigramCounts(GraftShim.expression(text)).toAggregateExpression())
}

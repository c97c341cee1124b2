package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflated byte length of a string — the raw material of the
  * compression-ratio quality signal (Gopher/MassiveText-family corpus
  * filtering): text that compresses far below the corpus norm is
  * boilerplate/repetition (templated spam, keyword stuffing), text that
  * barely compresses is high-entropy non-language (minified blobs, base64,
  * binary-in-text). Neither end is trainable prose, and the signal is
  * orthogonal to word-level repetition counters (`doc_repetition` sees
  * exact line/n-gram repeats; deflate's LZ77 window also prices
  * NEAR-repeats and low-entropy character structure).
  *
  * Semantics: `new Deflater(6, false)` (fixed level, zlib wrapper) over the
  * UTF-8 bytes, returning the TOTAL deflated length in bytes. Level is
  * pinned — determinism holds for a fixed zlib build, which is the JDK's
  * bundled zlib here; that is exactly why the signal is spec-pinned rather
  * than cross-engine oracle-checked (DuckDB exposes no deflate).
  *
  * The Deflater is native-backed: one per thread via ThreadLocal with
  * `reset()` per row — per-row allocation would churn native memory and
  * finalizers. CodegenFallback as with [[NfcNormalize]]: the per-row
  * deflate dominates the one virtual call.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_size"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires a STRING argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = DeflateSize.deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateSize.scratch.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  // Per-thread native footprint (r16 ADVICE, accepted): each executor
  // task thread lazily allocates ONE zlib Deflater (~256 KB native
  // window at level 6) that is reused for every row and held for the
  // thread's lifetime — bounded by the task-thread pool size (32 threads
  // → ~8 MB/executor), invisible to JVM heap accounting, reclaimed only
  // at thread death via the ThreadLocal. The alternative (end() per
  // batch) re-pays native init per row group for memory the pool bound
  // already caps.
  private val deflater: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6, false))
  private val scratch: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  def deflate_size(text: Column): Column =
    GraftShim.column(DeflateSize(GraftShim.expression(text)))
}

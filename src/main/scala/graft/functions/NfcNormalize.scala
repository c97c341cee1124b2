package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark ships no
  * normalizer builtin, and a corpus cleanup pass needs one: NFD-encoded
  * accents (`e` + U+0301) must compare, hash, and dedup equal to their
  * composed forms (U+00E9), or every downstream exact-dedup/fingerprint
  * operator silently treats equal-looking text as distinct.
  *
  * Semantics are exactly `java.text.Normalizer.normalize(s, NFC)` —
  * the same Unicode 15 normalization DuckDB's `nfc_normalize` applies,
  * which is what makes the `text_normalize` key oracle-checkable
  * cross-engine. Already-normalized strings (the overwhelming common
  * case on real corpora) take the allocation-free `isNormalized` fast
  * path and return the input buffer unchanged.
  *
  * CodegenFallback for the same reason as [[WinnowSelect]]: the per-row
  * work dominates the one virtual call.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a STRING argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc_normalize(text: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(text)))
}

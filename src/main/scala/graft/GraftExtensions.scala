package graft

import graft.functions.{CharGrams, DeflateSize, FloatDot, FmtSize, MinHashSig, MisraGries, NfcNormalize, SimHashSig, SlotMatch, TopK, WinnowSelect}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, NumericType}

/** Session-extension injector — the standard packaging for a Spark
  * extension library: users enable every graft custom expression for SQL
  * with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * after which `fmt_size`, `float_dot`, `minhash_sig` and the `top_k`
  * aggregate are callable from `spark.sql(...)` / `selectExpr` alongside
  * the built-ins (they resolve through the same function registry, so
  * Catalyst optimizes and codegens them like any built-in).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** Widens NUMERIC inputs to the expression's required type; anything
    * else passes through raw so the expression's own checkInputDataTypes
    * rejects it at analysis — an unconditional cast would turn e.g.
    * ARRAY<STRING> into silent all-NULL floats instead of an error.
    */
  private def castNumeric(e: Expression, to: DataType): Expression = (e.dataType, to) match {
    case (ArrayType(_: NumericType, _), ArrayType(_, _)) => Cast(e, to)
    case (_: NumericType, _) => Cast(e, to)
    case _ => e
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // first-row-per-key window → partial-aggregable argmin (narrow
    // conditions; see the rule's scaladoc for the tie-break contract)
    ext.injectOptimizerRule(_ => graft.plans.WindowArgminToAggregate)

    ext.injectFunction((
      FunctionIdentifier("fmt_size"),
      info("fmt_size", "fmt_size(bytes) - humanized size, reference integer semantics"),
      (exprs: Seq[Expression]) => FmtSize(Cast(exprs.head, LongType))))

    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - ARRAY<FLOAT> dot product (codegen)"),
      // SQL arrays of numbers default to ARRAY<DOUBLE>/<INT>; widen
      // numeric arrays to the float element width, let everything else
      // hit the expression's analysis-time rejection
      (exprs: Seq[Expression]) => FloatDot(
        castNumeric(exprs(0), ArrayType(FloatType)), castNumeric(exprs(1), ArrayType(FloatType)))))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0), intLit(exprs(1), "minhash_sig k"))))

    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(tokens) - 64-bit SimHash signature"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("slot_match"),
      info("slot_match", "slot_match(a, b) - count of equal non-null ARRAY<BIGINT> slots (codegen)"),
      (exprs: Seq[Expression]) => SlotMatch(
        castNumeric(exprs(0), ArrayType(LongType)), castNumeric(exprs(1), ArrayType(LongType)))))

    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      info("winnow_select", "winnow_select(text, k, w) - 1-based code-point positions of the " +
        "window-min winnowing fingerprint sites over K-char grams (Schleimer et al. 2003)"),
      (exprs: Seq[Expression]) => WinnowSelect(exprs.head,
        intLit(exprs(1), "winnow_select k"), intLit(exprs(2), "winnow_select w"))))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC normalization"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("char_grams"),
      info("char_grams", "char_grams(text, n) - all overlapping code-point n-grams in one pass"),
      (exprs: Seq[Expression]) => CharGrams(exprs(0), intLit(exprs(1), "char_grams n"))))

    ext.injectFunction((
      FunctionIdentifier("deflate_size"),
      info("deflate_size", "deflate_size(text) - zlib-deflated byte length (compression-ratio quality signal)"),
      (exprs: Seq[Expression]) => DeflateSize(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries", "misra_gries(item, k) - mergeable frequent-items sketch: <=k candidates " +
        "with lower-bound estimates (superset of items with share > 1/(k+1))"),
      (exprs: Seq[Expression]) =>
        MisraGries(exprs(0), intLit(exprs(1), "misra_gries k")).toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("top_k"),
      info("top_k", "top_k(score, id, payload, k) - bounded k-best aggregate (score DESC, id ASC)"),
      (exprs: Seq[Expression]) =>
        TopK(castNumeric(exprs(0), DoubleType), castNumeric(exprs(1), LongType),
          castNumeric(exprs(2), LongType), intLit(exprs(3), "top_k k")).toAggregateExpression()))
  }
}

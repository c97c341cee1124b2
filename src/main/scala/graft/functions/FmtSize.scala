package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Humanized byte-size formatting with the reference's exact integer
  * semantics (`fmt_size`, /root/reference/src/utils.tpp:18-33):
  *
  *   - divide by 1024 up to 4 times (B, KB, MB, GB, TB), keeping the last
  *     step's remainder percentage p = (s % 1024) * 100 / 1024 % 100;
  *   - fraction rendering quirks, exactly as the C++: p == 0 -> no
  *     fraction at all; p < 10 -> zero-padded two digits ("5.05 KB");
  *     p % 10 == 0 -> single digit (p = 50 renders "1.5 MB"); otherwise
  *     two digits (p = 51 renders "1.51 MB").
  *
  * Implemented as a native Catalyst `UnaryExpression` with whole-stage
  * codegen (`defineCodeGen` emits a static call — stays inside the codegen
  * span, no UDF/serialization overhead), which is the preferred extension
  * point for scalar functions at 100 TB scale.
  */
case class FmtSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fmt_size"

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(FmtSize.format(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.FmtSize.format($c))")

  override protected def withNewChildInternal(newChild: Expression): FmtSize =
    copy(child = newChild)
}

object FmtSize {
  private val Units = Array("B", "KB", "MB", "GB", "TB")

  /** Reference algorithm verbatim (utils.tpp:18-33), widened to Long.
    *
    * The reference takes `u_long` (unsigned), so negative input cannot
    * occur there; since `fmt_size(c)` casts arbitrary columns to LONG,
    * negatives ARE reachable here and are clamped to 0 ("0 B") — the same
    * guard is applied in [[fmtSizeSql]] so both engines agree.
    */
  def format(size: Long): String = {
    var s = math.max(0L, size)
    var p = 0L
    var i = 0
    while (s >= 1024 && i < 4) {
      p = s % 1024 * 100 / 1024 % 100
      s /= 1024
      i += 1
    }
    val pStr =
      if (p < 10) "0" + p
      else if (p % 10 == 0) (p / 10).toString
      else p.toString
    val num = s.toString + (if (p == 0) "" else "." + pStr)
    num + " " + Units(i)
  }

  /** Column-API entry point (input cast to LONG; no-op when already long). */
  def fmt_size(c: Column): Column =
    GraftShim.column(FmtSize(Cast(GraftShim.expression(c), LongType)))

  /** Makes `fmt_size(...)` usable from SQL strings in this session. */
  def register(spark: SparkSession): Unit =
    GraftShim.register(spark, "fmt_size", exprs => FmtSize(Cast(exprs.head, LongType)))

  /** Oracle-SQL equivalent of [[format]] for a BIGINT expression `vRaw`
    * (portable integer CASE math; `//` = DuckDB int div). Negatives clamp
    * to 0 exactly like [[format]].
    */
  def fmtSizeSql(vRaw: String): String = {
    val v = s"greatest($vRaw, 0)"
    val i = s"(CASE WHEN $v < 1024 THEN 0 WHEN $v < 1048576 THEN 1 WHEN $v < 1073741824 THEN 2 WHEN $v < 1099511627776 THEN 3 ELSE 4 END)"
    val s = s"($v // CASE $i WHEN 0 THEN 1 WHEN 1 THEN 1024 WHEN 2 THEN 1048576 WHEN 3 THEN 1073741824 ELSE 1099511627776 END)"
    val p = s"(CASE WHEN $i = 0 THEN 0 ELSE (($v // CASE $i WHEN 1 THEN 1 WHEN 2 THEN 1024 WHEN 3 THEN 1048576 ELSE 1073741824 END) % 1024) * 100 // 1024 % 100 END)"
    val pStr = s"(CASE WHEN $p < 10 THEN '0' || CAST($p AS VARCHAR) WHEN $p % 10 = 0 THEN CAST($p // 10 AS VARCHAR) ELSE CAST($p AS VARCHAR) END)"
    val unit = s"(CASE $i WHEN 0 THEN 'B' WHEN 1 THEN 'KB' WHEN 2 THEN 'MB' WHEN 3 THEN 'GB' ELSE 'TB' END)"
    s"(CAST($s AS VARCHAR) || (CASE WHEN $p = 0 THEN '' ELSE '.' || $pStr END) || ' ' || $unit)"
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable float aggregation.
  *
  * `round(sum(double))` is NOT stable across engines: summation order
  * differs (Spark partial aggs vs DuckDB's order; DuckDB windows use segment
  * trees), and round() tie-breaking on `.xx5` values differs (Spark HALF_UP
  * on the shortest decimal representation; DuckDB on the binary double).
  * Both produced real mismatches at sf0.01.
  *
  * Instead: cast each input to DECIMAL(18,6) (deterministic nearest-decimal
  * rounding, identical in both engines for any non-pathological double), sum
  * exactly (decimal addition is associative — order-insensitive), and cast
  * the exact result back to DOUBLE (deterministic IEEE nearest). The result
  * is bit-identical regardless of partitioning/summation order — which also
  * makes it stable at 1000-executor scale where partial-agg order is
  * nondeterministic run to run.
  */
object Num {
  /** Order-insensitive, engine-stable sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Engine-stable average: exact decimal sum -> double, / non-null count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-SQL equivalents. */
  def dsumSql(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  def davgSql(e: String): String = s"${dsumSql(e)} / count($e)"
}

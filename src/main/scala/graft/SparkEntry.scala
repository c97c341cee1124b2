package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (Table B) for the declared
  * operator inventory. Each query key maps to a Spark implementation and,
  * where ANSI-SQL-expressible, a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  private lazy val all: Map[String, QueryDef] =
    PipelineOps.defs ++ RelationalOps.defs ++ SessionOps.defs ++ ScalarOps.defs ++
      TextOps.defs ++ HygieneOps.defs ++ DedupOps.defs ++ VectorOps.defs ++
      MultimodalOps.defs ++ SpanOps.defs ++ WebOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full transfer-pipeline round trip: chunk → frame encode → decode →
    * ordered reassembly, self-verified against `documents.text`.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineOps.roundtrip(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}

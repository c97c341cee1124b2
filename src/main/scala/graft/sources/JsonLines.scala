package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Permissive JSONL ingestion — how raw training-data usually arrives
  * (scrape exports, API dumps): schema-projected parse where well-formed
  * lines fill the declared columns and malformed lines are CAPTURED in
  * `_corrupt_record` instead of failing the job (a 100 TB crawl always
  * contains garbage; dropping it silently hides pipeline bugs, dying on
  * it wastes the cluster). The scan is line-splittable, so a directory of
  * JSONL files parallelizes like any text source, and unreferenced
  * columns are pruned from parsing.
  *
  * Spark caveat (enforced since 2.3): a query referencing ONLY
  * `_corrupt_record` raises AnalysisException — always select at least
  * one data column alongside it (or persist first), as [[corruptLines]]
  * does.
  */
object JsonLines {

  val CorruptCol: String = Quarantine.CorruptCol

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The quarantine view: raw text of every line that failed the schema,
    * for reprocessing/auditing (see [[Quarantine]] for the corrupt-only-
    * scan workaround this shares with the CSV source).
    */
  def corruptLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    Quarantine.corruptOnly(read(spark, path, schema), schema)
}

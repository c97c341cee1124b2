package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Permissive CSV ingestion — the [[JsonLines]] sibling for the other
  * format raw corpora actually arrive in (metadata manifests, label
  * sheets, legacy exports). Same quarantine philosophy: well-formed rows
  * fill the declared schema, malformed rows (wrong arity, uncastable
  * fields) are CAPTURED whole in `_corrupt_record` instead of failing
  * the job or silently nulling — at 100 TB the garbage is guaranteed and
  * both failure modes hide pipeline bugs.
  *
  * Quarantine contract (Spark's CSV parser, pinned in IngestSpec):
  * a row lands in `_corrupt_record` on TYPE failure (a field that does
  * not cast to its declared type). Arity mismatches follow CSV's
  * loose-schema tradition instead: missing trailing fields parse as
  * nulls and EXTRA fields are silently dropped — rows that need strict
  * arity should declare a trailing string column and filter on it.
  *
  * The scan is line-splittable as long as quoted fields contain no
  * newlines (`multiLine` stays false here — a multiline CSV forces
  * whole-file reads and is the wrong ingest format at scale), so a
  * directory of CSV parts parallelizes like any text source.
  *
  * Same Spark caveat as JSON — the corrupt-only-scan workaround lives
  * once, in [[Quarantine]].
  */
object CsvLines {

  val CorruptCol: String = Quarantine.CorruptCol

  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(path)

  /** The quarantine view: raw text of every row that failed the schema,
    * for reprocessing/auditing.
    */
  def corruptLines(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    Quarantine.corruptOnly(read(spark, path, schema, header), schema)
}

package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The shared corrupt-record quarantine view over any PERMISSIVE-parsed
  * frame — one home for the subtle part: Spark rejects a query whose SCAN
  * references ONLY the corrupt column, and column PRUNING re-triggers the
  * check even when intermediate selects carry data columns. The
  * always-true `length(coalesce(CAST(first AS STRING), '')) >= 0` guard
  * keeps a data column referenced in a filter, where pruning cannot drop
  * it and constant folding cannot prove it away.
  */
private[sources] object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** Raw text of every record that failed `schema`, from a frame parsed
    * with `columnNameOfCorruptRecord = CorruptCol`.
    */
  def corruptOnly(parsed: DataFrame, schema: StructType): DataFrame = {
    val first = schema.fieldNames.head
    parsed
      .filter(s"$CorruptCol IS NOT NULL AND length(coalesce(CAST(`$first` AS STRING), '')) >= 0")
      .select(CorruptCol)
  }
}

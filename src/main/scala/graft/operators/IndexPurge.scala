package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.{broadcast, col}

/** Right-to-be-forgotten over the persisted artifacts: delete every row
  * belonging to a set of identities from an index/code table, preserving
  * its at-rest layout, under the same single-maintainer epoch discipline
  * as the append paths.
  *
  * A training-data pipeline that persists derived artifacts — near-dup
  * signature indexes ([[graft.streaming.DedupGate]], `doc_id`), winnowed
  * eval-span indexes ([[graft.streaming.SpanGate]], `eval_doc`), ANN
  * bucket/cell/code tables ([[VectorOps]], `vec_id`) — cannot honor a
  * deletion request by dropping the source document alone: the artifacts
  * keep hashes, n-gram sites, and quantized codes derived from the
  * deleted content, and the ANN tables can keep serving the deleted
  * vector as a nearest neighbor. Purge is the lifecycle complement of
  * the idempotent appends.
  *
  * Mechanics (plain parquet — no transactional format in this
  * container, see the FileSink port note in SURVEY §2):
  *   - the survivor set stages through `<table>_purge` and writes back,
  *     because Spark cannot overwrite a table from a plan that reads it
  *     (the [[graft.streaming.DedupGate.rebuildSigIndex]] pattern);
  *   - the table's BUCKETING layout is read from the catalog and
  *     re-applied verbatim — a purge must not silently flatten the
  *     bucket-pruned probe shape the index was built for — and columns
  *     re-select in table order (a `Seq`-based join moves the join key
  *     to column 0);
  *   - ids ride a broadcast anti-join, never an `isin` literal tree
  *     (the plan-scale trap measured on the span-gate probe);
  *   - the epoch is read at span start and check-and-bumped immediately
  *     before the write-back, so a purge interleaving another
  *     maintainer fails LOUDLY with the table untouched
  *     ([[IndexEpoch]]), and any in-flight appender that began before
  *     the purge fails ITS commit instead of resurrecting purged rows
  *     it had already read.
  *
  * What purge deliberately does NOT touch: meta/books/codebook side
  * tables (geometry and quantizers are corpus-level artifacts, not
  * per-doc data — frozen books legitimately outlive any document), and
  * staleness counters (`base_n`) — [[graft.streaming.DedupGate
  * .sigIndexStaleness]] clamps at 0, so a purge under-reads staleness
  * until appends pass the old base; a maintainer whose cumulative purges
  * are material should rebuild, which resets the counter.
  *
  * A purge of ZERO matching rows is a no-op: nothing rewrites, the epoch
  * does not move — so re-issuing a deletion request (the at-least-once
  * delivery every deletion queue has) is idempotent and cheap.
  */
object IndexPurge {

  /** Deletes `ids` (matched on `idCol`) from `table`. Returns the number
    * of rows removed.
    */
  def purge(spark: SparkSession, table: String, idCol: String, ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "purge requires at least one id")
    require(spark.catalog.tableExists(table), s"no such table: $table")
    spark.catalog.refreshTable(table)
    val base = spark.table(table)
    require(base.columns.contains(idCol),
      s"$table has no column $idCol (columns: ${base.columns.mkString(", ")})")

    val epoch0 = IndexEpoch.current(spark, table)
    val idsDf = spark.createDataFrame(ids.distinct.map(Tuple1(_))).toDF(idCol)
    val removed = base.join(broadcast(idsDf), Seq(idCol), "left_semi").count()
    if (removed == 0L) return 0L

    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
    val order = base.columns.toSeq
    val kept = base.join(broadcast(idsDf), Seq(idCol), "left_anti")
      .select(order.map(col): _*)

    def write(df: org.apache.spark.sql.DataFrame, target: String): Unit = {
      var w = df.write.mode("overwrite").format("parquet")
      meta.bucketSpec.foreach { bs =>
        w = w.bucketBy(bs.numBuckets, bs.bucketColumnNames.head, bs.bucketColumnNames.tail: _*)
        if (bs.sortColumnNames.nonEmpty)
          w = w.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
      }
      w.saveAsTable(target)
    }

    val staging = table + "_purge"
    VectorOps.clearStaleLocation(spark, staging)
    write(kept, staging)
    // commit point: if another maintainer moved the epoch during our
    // read-stage span, this throws and the live table is untouched
    IndexEpoch.bump(spark, table, epoch0)
    write(spark.table(staging), table)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.catalog.refreshTable(table)
    removed
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession

/** Optimistic multi-writer guard for the persisted indexes (LSH / IVF /
  * signature): a monotonic epoch in a tiny side table (`<index>_epoch`,
  * one bigint row), read at the START of an append's read-compute-write
  * span and CHECK-AND-BUMPED immediately before the data write.
  *
  * Every append path documents a single-sequential-maintainer contract:
  * the idempotence anti-joins read the at-rest identity set, so two
  * appenders interleaving the same span can each pass the check and land
  * duplicate rows — duplicate probe candidates that silently skew TopK
  * and staleness. Plain parquet has no compare-and-swap, so this guard
  * cannot PREVENT that; what it does is make the contract violation
  * LOUD: the second writer's bump observes the first writer's bump (its
  * snapshot epoch is stale) and throws BEFORE writing any data, leaving
  * the index exactly as the first writer committed it. Rebuilds bump
  * unconditionally, so an appender that began before a rebuild also
  * fails its commit instead of appending rows signed under the replaced
  * geometry/quantizer.
  *
  * Residual window (documented, not hidden): a writer that BEGINS after
  * another's bump but before its data write becomes visible can still
  * compute a stale anti-join — detection covers spans that overlap a
  * bump, which is every interleaving longer than the sub-second
  * bump-to-write gap. True concurrent maintenance needs a transactional
  * table format (SURVEY §2's FileSink note); until then the contract
  * stays single-maintainer and this guard converts violations from
  * silent corruption to a loud, data-less failure.
  *
  * Legacy indexes without an epoch table read as epoch 0 and gain the
  * table on their first guarded append.
  */
object IndexEpoch {

  private[graft] def epochTableFor(table: String): String = table + "_epoch"

  /** The index's current epoch: 0 for a legacy index (no epoch table
    * yet). Refreshes the relation cache first — bumps may have landed
    * through a micro-batch clone session (the [[graft.streaming.DedupGate]]
    * hazard).
    */
  def current(spark: SparkSession, table: String): Long = {
    val t = epochTableFor(table)
    if (!spark.catalog.tableExists(t)) 0L
    else {
      spark.catalog.refreshTable(t)
      spark.table(t).collect().headOption.map(_.getLong(0)).getOrElse(0L)
    }
  }

  /** Check-and-bump: requires the epoch is still `expected` (the value
    * read when the caller's read-compute-write span began) and advances
    * it. Throws [[java.util.ConcurrentModificationException]] — with no
    * data written by the caller — if another writer bumped in between.
    */
  def bump(spark: SparkSession, table: String, expected: Long): Unit = {
    val now = current(spark, table)
    if (now != expected) throw new java.util.ConcurrentModificationException(
      s"index $table epoch moved $expected -> $now during this append's " +
        "read-compute-write span: another maintainer (append or rebuild) committed in " +
        "between, so this append's idempotence anti-join and geometry validation are " +
        "stale. Nothing was written. The index supports ONE sequential maintainer — " +
        "serialize appends, or rebuild if a concurrent write already landed.")
    VectorOps.clearStaleLocation(spark, epochTableFor(table))
    spark.createDataFrame(Seq(Tuple1(expected + 1))).toDF("epoch")
      .write.mode("overwrite").format("parquet").saveAsTable(epochTableFor(table))
  }

  /** Unconditional bump for REBUILDS (overwrite paths own the index by
    * contract): any in-flight appender that began before the rebuild
    * fails its own commit instead of appending under dead geometry.
    */
  def bumpUnconditional(spark: SparkSession, table: String): Unit =
    bump(spark, table, current(spark, table))
}

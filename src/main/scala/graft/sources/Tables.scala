package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet test tables.
  *
  * Scale notes (100 TB design): each table is read as a plain parquet scan so
  * Catalyst's predicate pushdown / column pruning / partition pruning apply
  * untouched. Nothing here caches or collects; at cluster scale the same code
  * reads a partitioned table directory instead of a single file.
  *
  * The only normalization is `events.ts`, which the fixture generator has
  * shipped under several physical encodings over time. We branch on the type
  * the scan actually produced so a fixture regeneration cannot break every
  * time-based query:
  *
  *  - parquet TIMESTAMP(NANOS): Spark 4.x rejects it unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (set below, idempotent),
  *    after which the column arrives as LongType nanoseconds. Converted with
  *    *integer* division (`div`) — a double division would lose precision
  *    above 2^53 ns (~1970+104 days) and corrupt every microsecond value.
  *  - parquet timestamp[us] without timezone: arrives as TIMESTAMP_NTZ.
  *    The session timezone is pinned to UTC everywhere (Bench/Verify/specs),
  *    so casting to the session-TZ TimestampType is value-preserving and
  *    matches the DuckDB oracle's `CAST(ts AS TIMESTAMP)`.
  *  - parquet timestamp[us] with timezone (instant semantics): arrives as
  *    TimestampType already — pass through.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime-settable SQLConf; idempotent. Needed even when the driver
      // created the session without it. Only affects NANOS-encoded columns;
      // harmless for micros fixtures.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts has unsupported type $other; expected int64 nanos, timestamp_ntz, or timestamp")
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}

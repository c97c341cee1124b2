package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet test tables.
  *
  * Scale notes (100 TB design): each table is read as a plain parquet scan so
  * Catalyst's predicate pushdown / column pruning / partition pruning apply
  * untouched. Nothing here caches or collects; at cluster scale the same code
  * reads a partitioned table directory instead of a single file.
  *
  * The only normalization is `events.ts`: the driver writes parquet
  * TIMESTAMP(NANOS), which Spark 4.x rejects unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, after which the column
  * arrives as a LongType of nanoseconds. We convert with *integer* division
  * (`div`) — a double division would lose precision above 2^53 ns (~1970+104
  * days) and corrupt every microsecond value.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime-settable SQLConf; idempotent. Needed even when the driver
      // created the session without it.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}

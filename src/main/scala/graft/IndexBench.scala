package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Ad-hoc measurement for SURVEY §6: persisted-LSH-index build cost vs
  * per-query probe cost vs the inline (index-less) ann_lsh path — the
  * amortization story of `VectorOps.writeLshIndex`. Usage:
  * runMain graft.IndexBench [sfDir].
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-idx-warehouse").toString)
      // required for probe-time bucket pruning (see writeLshIndex docs)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.VectorOps

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (nBits, build) = time(VectorOps.writeLshIndex(spark, sfDir, "lsh_bench_idx"))
    val qVecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 10).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // warm then median-of-3 of a full 10-query probe sweep
    def probeAll(): Unit = qVecs.values.foreach { v =>
      VectorOps.probeLshIndex(spark, "lsh_bench_idx", v, nBits, 3).collect()
    }
    probeAll()
    val probeTs = (1 to 3).map(_ => time(probeAll())._2).sorted
    // inline path (recomputes signatures every call), same 10 queries
    def inline(): Unit = SparkEntry.queries("ann_lsh")(spark, sfDir).collect()
    inline()
    val inlineTs = (1 to 3).map(_ => time(inline())._2).sorted
    println(f"INDEX_BENCH build=${build}%.3f probe10_median=${probeTs(1)}%.3f " +
      f"(${probeTs(1) / 10}%.4f/query) inline10_median=${inlineTs(1)}%.3f sf=$sfDir")

    // incremental maintenance: append a 1% batch to each index family vs
    // the full rebuild it saves — the arrival-path amortization
    import spark.implicits._
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val batch = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < (n / 100).max(1))
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      .cache()
    batch.count() // pin the batch so the timed appends measure only the append
    val (_, lshAppend) = time {
      VectorOps.appendToLshIndex(spark, batch, "lsh_bench_idx", nBits)
    }
    val (_, ivfBuild) = time(VectorOps.writeIvfIndex(spark, sfDir, "ivf_bench_idx"))
    val (_, ivfAppend) = time {
      VectorOps.appendToIvfIndex(spark, batch, "ivf_bench_idx")
    }
    val lshStale = VectorOps.lshIndexStaleness(spark, "lsh_bench_idx")
    val ivfStale = VectorOps.ivfIndexStaleness(spark, "ivf_bench_idx")
    println(f"INDEX_APPEND lsh_append=$lshAppend%.3f (vs build=$build%.3f) " +
      f"ivf_append=$ivfAppend%.3f (vs build=$ivfBuild%.3f) " +
      f"staleness lsh=$lshStale%.4f ivf=$ivfStale%.4f sf=$sfDir")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Apples-to-apples record against BASELINE.md §2 (r14 verdict task 4):
  * runs exactly the 10 baseline keys at sf0.1 under the BASELINE
  * config — `local[4]`, `spark.sql.shuffle.partitions=4` — instead of
  * `graft.Bench`'s `local[32]`/32. The per-round bench intentionally
  * keeps the wide config (it measures the engine, and most keys gain
  * from 32 threads), but sub-second scan-bound keys pay the 8× task
  * floor there: `dedup_exact` read 2.42× baseline in BENCH_r14 under
  * local[32] — a config artifact this record exists to isolate, not an
  * engine regression. Methodology matches `graft.Bench` (warmup pass,
  * interleaved reps, per-key median) so a host burst cannot fabricate
  * the comparison; output is one JSON line to
  * BENCH_BASELINE_MATCHED.json with per-key medians, the BASELINE.md §2
  * numbers, and the per-key ratio.
  */
object BaselineBench {

  /** The BASELINE.md §2 representative set with its measured warm
    * seconds (naive pyspark 4.1.2, local[4], shuffle=4, 2026-08-12).
    */
  val Baseline: Seq[(String, Double)] = Seq(
    "filter_project" -> 0.430, "agg_group" -> 0.339, "join_hash" -> 0.506,
    "join_multi" -> 0.846, "window_rank" -> 0.415, "sort_topk" -> 0.119,
    "reassemble_ordered" -> 0.206, "window_tumbling" -> 0.275,
    "dedup_exact" -> 0.120, "knn_cosine" -> 0.322)

  val Reps = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val names = Baseline.map(_._1)
    names.foreach(run) // warmup (codegen, file caches) — the §2 protocol
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to Reps; n <- names) times(n) :+= run(n)

    def f3(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val med = names.map(n => n -> times(n).sorted.apply(Reps / 2)).toMap
    val entries = Baseline.map { case (n, base) =>
      s""""$n":{"sec":${f3(med(n))},"baseline_sec":${f3(base)},"ratio":${f3(med(n) / base)}}"""
    }.mkString("{", ",", "}")
    val total = names.map(med).sum
    val baseTotal = Baseline.map(_._2).sum
    val out = s"""{"config":"local[4] shuffle=4 (BASELINE.md §2 matched)","sf":"$sfDir",""" +
      s""""reps":$Reps,"interleaved":true,"total_sec":${f3(total)},""" +
      s""""baseline_total_sec":${f3(baseTotal)},"total_ratio":${f3(total / baseTotal)},""" +
      s""""queries":$entries}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_BASELINE_MATCHED.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"BASELINE_MATCHED $out")
    spark.stop()
  }
}

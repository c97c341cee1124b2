package graft

import org.apache.spark.sql.SparkSession

/** Cross-SF scaling record: the same keyed subset timed at sf0.01 AND
  * sf0.1, so the "fixed job floor amortizes at scale" argument for the
  * iterative family (connected components, BPE training) is MEASURED, not
  * argued. The subset is the ten most expensive keys' families plus
  * scan-bound contrast keys:
  *   - iterative CC / iterative-merge (cost = rounds × job floor, should
  *     grow far sub-linearly in rows): dedup_clusters,
  *     dedup_clusters_minhash, dedup_clusters_simhash, embed_clusters,
  *     embed_clusters_lsh, bpe_merges, bpe_encode
  *   - ANN probes (bounded probe work): ann_lsh, ann_ivf, knn_cosine
  *   - scan-bound contrast (should grow ~linearly once past the floor):
  *     dedup_exact, agg_group, dedup_lines_global
  *
  * Writes BENCH_SCALING.json: per key, median seconds at each SF and the
  * growth ratio, plus the input row-count growth per table as the
  * denominator. Methodology matches Bench (warmup + median of Reps).
  */
object BenchScaling {

  val Reps = 5

  val Keys: Seq[String] = Seq(
    "dedup_clusters", "dedup_clusters_minhash", "dedup_clusters_simhash",
    "embed_clusters", "embed_clusters_lsh", "bpe_merges", "bpe_encode",
    "ann_lsh", "ann_ivf", "knn_cosine",
    "dedup_exact", "agg_group", "dedup_lines_global")

  def main(args: Array[String]): Unit = {
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val rows = sfs.map { dir =>
      dir -> Seq("documents", "embeddings", "lineitem", "events").map { t =>
        t -> spark.read.parquet(s"$dir/$t.parquet").count()
      }
    }
    val timings: Seq[(String, Seq[(String, Double)])] = sfs.map { dir =>
      dir -> Keys.map { name =>
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warmup
        val m = median(Seq.fill(Reps)(once()))
        println(f"BENCH_SCALING $dir $name $m%.3f s")
        name -> m
      }
    }
    def f4(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val Seq((_, t001), (_, t01)) = timings
    val m001 = t001.toMap
    val perKey = t01.map { case (name, s01) =>
      val s001 = m001(name)
      s""""$name":{"sf001":${f4(s001)},"sf01":${f4(s01)},"growth":${f4(s01 / s001)}}"""
    }.mkString("{", ",", "}")
    val rowsJson = rows.map { case (dir, ts) =>
      val sf = dir.split('/').last
      s""""$sf":${ts.map { case (t, n) => s""""$t":$n""" }.mkString("{", ",", "}")}"""
    }.mkString("{", ",", "}")
    val out =
      s"""{"reps":$Reps,"keys":${Keys.size},"rows":$rowsJson,"queries":$perKey}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALING.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(out)
    spark.stop()
  }
}

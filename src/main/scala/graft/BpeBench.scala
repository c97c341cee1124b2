package graft

import org.apache.spark.sql.SparkSession

/** Rounds-vs-merges curve of the BATCHED BPE trainer (r14 verdict task
  * 2's bench deliverable): trains the same corpus to the same merge
  * count at several batch widths, records driver rounds + wall seconds
  * per width, and asserts every width produced the IDENTICAL merge list
  * (the exactness contract, re-checked on the real corpus). Writes one
  * JSON line to BPE_BENCH.json.
  *
  * The point of the curve: each driver round is one cluster job (a
  * pair-count aggregation over the word table) — at real job latencies
  * the ROUND COUNT, not the per-round work, is what makes a 32k-merge
  * vocabulary days (32k sequential rounds) vs hours (32k/batch).
  */
object BpeBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "128").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir, "documents").select("doc_id", "text")

    val widths = Seq(1, 8, 32, 128)
    // warmup (codegen, file caches) so width 1 is not penalized cold
    graft.operators.TextOps.bpeMergesTrained(spark, docs, 8, 8)
    val runs = widths.map { w =>
      val t0 = System.nanoTime()
      val (ms, rounds) = graft.operators.TextOps.bpeMergesTrained(spark, docs, merges, w)
      val sec = (System.nanoTime() - t0) / 1e9
      (w, ms, rounds, sec)
    }
    val ref = runs.head._2
    runs.foreach { case (w, ms, _, _) =>
      require(ms == ref,
        s"batch=$w merge list diverged from batch=1 — the exactness contract is broken")
    }
    def f2(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    val curve = runs.map { case (w, _, rounds, sec) =>
      s"""{"batch":$w,"driver_rounds":$rounds,"wall_sec":${f2(sec)}}"""
    }.mkString("[", ",", "]")
    val out = s"""{"sf":"$sfDir","merges":${ref.size},"identical_across_widths":true,""" +
      s""""curve":$curve}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BPE_BENCH.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"BPE_BENCH $out")
    spark.stop()
  }
}

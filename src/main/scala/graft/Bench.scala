package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with warm per-query seconds
  * (each query runs once to warm codegen/caches, then `Reps` timed runs;
  * the reported number is the median — matching BASELINE.md §2 methodology
  * while de-noising the 0.1-1 s magnitudes).
  *
  * Failures are never swallowed: a query that throws (warmup or timed run)
  * is recorded in the `errors` map with a null timing, and the process
  * exits nonzero — a regression can only make the bench fail loudly, not
  * "improve" it.
  */
object Bench {

  /** Timed repetitions per query (median reported). 5 because the host
    * occasionally suffers multi-second external CPU bursts that pollute up
    * to two consecutive reps; the median of 5 still lands on a clean run.
    */
  val Reps = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Res(name: String, median: Double, min: Double, max: Double, err: Option[String])

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        once() // warmup
        val times = Seq.fill(Reps)(once()).sorted
        Res(name, times(Reps / 2), times.head, times.last, None)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          Res(name, -1.0, -1.0, -1.0, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      } + "\""
    // the driver captures only the TAIL of the build output, so the primary
    // line must stay small: 4-decimal medians, no per-query spread (r03's
    // full-precision line overflowed the capture window and parsed as null).
    // Full-precision medians + min/max spread go to BENCH_DETAIL.json.
    // Locale.ROOT: a comma-decimal default locale would otherwise format
    // "1,2345" and break the JSON.
    def f4(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val ok = results.filter(_.err.isEmpty)
    val qs = ok.map(r => jstr(r.name) + ":" + f4(r.median)).mkString("{", ",", "}")
    val qsFull = ok.map(r => jstr(r.name) + ":" + r.median).mkString("{", ",", "}")
    val spread = ok.map(r => jstr(r.name) + s""":[${r.min},${r.max}]""").mkString("{", ",", "}")
    val errs = results.flatMap(r => r.err.map(e => jstr(r.name) + ":" + jstr(e))).mkString("{", ",", "}")
    val total = ok.map(_.median).sum
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"reps":$Reps,"total":$total,"queries":$qsFull,"spread":$spread,"errors":$errs,"sf":"$sfDir"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val primary =
      s"""{"metric":"total","value":${f4(total)},"unit":"sec","queries":$qs,"reps":$Reps,"errors":$errs,"sf":"$sfDir"}"""
    // the driver tail-scrapes stdout for this line and has parsed it as
    // null for five rounds running (capture-window truncation) — persist
    // the identical object to a flat file so the totals are always
    // machine-readable regardless of log capture
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_PRIMARY.json"),
      (primary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(primary)
    spark.stop()
    if (results.exists(_.err.nonEmpty)) sys.exit(1)
  }
}

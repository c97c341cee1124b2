package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timing helper (same session shape as Bench). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"BENCH_ONE $name median=${times(1)}%.3f [${times.head}%.3f, ${times.last}%.3f]")
    }
    spark.stop()
  }
}

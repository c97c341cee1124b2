package graft

import org.apache.spark.sql.SparkSession

/** Local smoke-runner for the driver's t1 check: runs SparkEntry.entry and
  * asserts rows > 0 and every round-trip row ok. Exit 0 on success.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    val notOk = if (df.columns.contains("ok")) df.filter("NOT ok").count() else 0L
    df.show(5, truncate = false)
    println(s"ENTRY_SMOKE rows=$n not_ok=$notOk")
    spark.stop()
    if (n <= 0 || notOk != 0) sys.exit(1)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables — the pre-partitioning pattern
  * that removes the join shuffle entirely at scale: both sides written
  * `bucketBy` the join key land partition-aligned, so the join plans with
  * NO Exchange on either side (only per-bucket sorts). At 100 TB this is
  * the difference between shuffling two fact tables and streaming them.
  *
  * This suite's session carries special conf (no auto-broadcast, its own
  * warehouse/metastore), so it is stopped after the suite — later suites
  * must not inherit it through getOrCreate.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  override def afterAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      // at sf0.001 everything fits the broadcast threshold and the planner
      // would skip the bucketed path entirely; disable auto-broadcast so
      // the join exercises what bucketing buys at REAL scale (where
      // neither fact side is broadcastable)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // isolate the derby metastore too, so reruns don't collide
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${Files.createTempDirectory("graft-metastore")}/db;create=true")
      .getOrCreate()
  }

  test("bucketed join on the bucket key plans no exchange on either side") {
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        spark.table("orders_b")("o_custkey") === spark.table("customer_b")("c_custkey"))
      .select("o_orderkey", "c_name")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")

    // and it computes the same rows as the plain shuffled join
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/customer.parquet"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .select("o_orderkey", "c_name")
    assert(joined.count() == plain.count())
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
  }
}

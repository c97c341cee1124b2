package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prints `explain("formatted")` for named SUBPLANS of the composite keys
  * whose declared frame is a post-execution sink re-read (the clustering
  * family executes its pair generation + CC loop eagerly inside the query
  * call, so `graft.Explain <key>` shows only the label-table scan). The
  * r21 optimization round's plan-capture companion to [[ProfileR21]]; not
  * part of the declared surface.
  *
  * Usage: runMain graft.PlanDump [sfDir] <probe> [probe ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.sources.Tables(spark, sfDir, "documents")

    val registry: Map[String, () => DataFrame] = Map(
      "embed_clusters_lsh_edges" -> (() =>
        graft.operators.VectorOps.embedClustersEdges(spark, sfDir)),
      "simhash_edges" -> (() =>
        graft.operators.DedupOps.simhashPairsScored(docs)),
      "minhash_edges" -> (() =>
        graft.operators.DedupOps.minhashPairsScored(docs)))

    probes.foreach { p =>
      println(s"\n===== $p =====")
      registry(p)().explain("formatted")
    }
    spark.stop()
  }
}

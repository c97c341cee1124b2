package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc measurement harness for the connectedComponents checkpoint
  * modes (SURVEY §6): times the full minhash-edges clustering at the
  * given SF dir with per-round localCheckpoint vs reliable checkpoint,
  * median of 3. Usage: runMain graft.CcBench [sfDir].
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-cc-bench")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)

    import org.apache.spark.sql.functions.col
    import graft.operators.DedupOps
    val d = graft.sources.Tables(spark, sfDir, "documents")
    // PRODUCTION edge sets: the verified / unsorted forms the shipped
    // clustering keys actually feed into CC — a measurement over raw
    // band collisions or sorted pairs would describe a different graph
    // and a different plan than the queries being tuned
    def minhashEdges() = DedupOps.minhashPairsScored(d)
      .filter(col("sig_match") >= DedupOps.MinhashVerifySlots)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    def simhashEdges() = DedupOps.simhashPairsScored(d)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    def run(reliable: Boolean): Double = {
      val t0 = System.nanoTime()
      val res = DedupOps.connectedComponentsTracked(d.select("doc_id"), minhashEdges(), reliable = reliable)
      res.labels.count()
      res.release()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(false, true).foreach(run) // warm both paths
    Seq("local" -> false, "reliable" -> true).foreach { case (name, rel) =>
      val ts = (1 to 3).map(_ => run(rel)).sorted
      println(f"CC_BENCH mode=$name median=${ts(1)}%.3f [${ts.head}%.3f, ${ts.last}%.3f] sf=$sfDir")
    }

    // propagation-round counts per clustering key's edge set — the
    // scheduling-floor multiplier; decides whether path compression
    // (extra shuffle per round, fewer rounds) would pay
    import graft.operators.VectorOps
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      ("dedup_clusters_minhash", () => minhashEdges(), d.select("doc_id")),
      ("dedup_clusters_simhash", () => simhashEdges(), d.select("doc_id")),
      ("embed_clusters_lsh",
        () => VectorOps.embedClustersEdges(spark, sfDir),
        emb.select(col("vec_id").as("doc_id"))))
    shapes.foreach { case (name, mkEdges, nodes) =>
      Seq(false, true).foreach { comp =>
        val t0 = System.nanoTime()
        val res = DedupOps.connectedComponentsTracked(nodes, mkEdges(), compress = comp)
        res.labels.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"CC_ROUNDS key=$name compress=$comp rounds=${res.rounds} secs=$secs%.3f sf=$sfDir")
        res.release()
      }
    }
    spark.stop()
  }
}

package graft

import graft.functions.FloatDot.float_dot
import graft.operators.VectorOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Codebook-training sample-factor sweep: recall@3 (at the corpus-scaled
  * nProbe) and training wall time per `sampleFactor`, against full-corpus
  * Lloyd — the measurement behind [[VectorOps.TrainSampleFactor]]'s
  * default (SURVEY §6). Usage: runMain graft.SampleSweep [sfDir]
  */
object SampleSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        sqrt(float_dot(col("embedding"), col("embedding"))).as("nrm"))
    val n = e.count()
    val k = VectorOps.ivfK(n)
    val auto = VectorOps.nProbeFor(k)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    val bf = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", float_dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    println(s"SAMPLE_SWEEP sfDir=$sfDir n=$n k=$k nProbe=$auto")
    for (factor <- Seq(0, 64, 32, 16, 8, 4)) {
      val t0 = System.nanoTime()
      val cents = VectorOps.trainCodebook(
        e.select("vec_id", "embedding"), n, k, lloydRounds = 10, sampleFactor = factor)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val got = VectorOps.annIvf(spark, sfDir, nProbe = auto, sampleFactor = factor)
        .select("q_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(bf).size.toDouble / bf.size
      val capped = if (factor <= 0) n else math.min(n, factor.toLong * k)
      println(f"SAMPLE_SWEEP factor=$factor%3d trainRows=$capped%6d " +
        f"train=$trainSec%.2f s recall@3=$recall%.3f (cents=${cents.size})")
    }
    spark.stop()
  }
}

package graft

import graft.functions.FloatDot.float_dot
import graft.operators.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN operating-knob sweep: recall@3 and wall latency per LSH probe
  * radius and IVF nProbe, against the brute-force ground truth — the
  * measured table a user tunes from (SURVEY §6). Latency is the median of
  * 3 warm runs (the first run pays plan compilation and, for IVF, the
  * one-time codebook training, which is cached per JVM like a real
  * offline-trained index).
  *
  * Usage: runMain graft.AnnSweep [sfDir]
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the persisted-index probes file-prune only with auto-bucketed-scan
      // off (the documented probe-session conf — VectorOps.writeLshIndex)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        sqrt(float_dot(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    val bf = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", float_dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(mk: => DataFrame): (Double, Double) = {
      val got = mk.select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.select("q_id", "cand_id").collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      (got.intersect(bf).size.toDouble / bf.size, times(1))
    }

    val corpus = e.count()
    println(s"ANN_SWEEP sfDir=$sfDir corpus=$corpus")
    // `cands` = scored candidates across the 10 queries — the latency
    // driver at scale (wall ms at test SF is fixed-overhead-dominated).
    // the PERSISTED LSH index probe swept beside the inline form at every
    // radius (the ivfpq_indexed closure's logic applied to this family):
    // the indexed plan is the one an operator tunes in production
    // (bucketed signature scan, file-pruned), and `match_inline` pins
    // row-identity at every swept radius — the index and the inline path
    // share nBits by construction only for the derived-bits (None) rows,
    // so the Some(6) variants sweep inline-only.
    for (radius <- Seq(0, 1, 2); nBits <- Seq(None, Some(6))) {
      val inline = VectorOps.annLshAt(spark, sfDir, nBits, 3, probeRadius = radius)
      val (r, ms) = measure(inline)
      val cands = VectorOps.annLshCandidates(spark, sfDir, nBits, radius).count()
      println(f"ANN_SWEEP ann_lsh radius=$radius nBits=${nBits.getOrElse(-1)} recall@3=$r%.2f cands=$cands scanned_frac=${cands / (10.0 * corpus)}%.3f latency_ms=$ms%.0f")
      if (nBits.isEmpty) {
        val indexed = VectorOps.annLshIndexed(spark, sfDir, probeRadius = radius)
        val (ri, msi) = measure(indexed)
        val same = inline.collect().toSeq == indexed.collect().toSeq
        println(f"ANN_SWEEP ann_lsh_indexed radius=$radius recall@3=$ri%.2f latency_ms=$msi%.0f match_inline=$same")
      }
    }
    for (ma <- Seq(2, 3); nProbe <- Seq(1, 2, 4, 6, 8, 12)) {
      val (r, ms) = measure(VectorOps.annIvf(spark, sfDir, nProbe = nProbe, multiAssign = ma))
      val cands = VectorOps.annIvfCandidates(spark, sfDir, nProbe = nProbe, multiAssign = ma).count()
      println(f"ANN_SWEEP ann_ivf nProbe=$nProbe ma=$ma recall@3=$r%.2f cands=$cands scanned_frac=${cands / (10.0 * corpus)}%.3f latency_ms=$ms%.0f")
    }
    // PQ: the refine knob trades the exact-re-rank shortlist width
    // against recall; the ADC scan always reads every code (32× fewer
    // bytes), so scanned_frac is the SHORTLIST fraction re-ranked exactly
    for (refine <- Seq(5, 10, 20, 50)) {
      val (r, ms) = measure(VectorOps.annPq(spark, sfDir, refine = refine))
      println(f"ANN_SWEEP ann_pq refine=$refine recall@3=$r%.2f reranked_frac=${refine / corpus.toDouble}%.4f latency_ms=$ms%.0f")
    }
    // IVFADC: both knobs — cells scanned × shortlist width; the PERSISTED
    // index probe swept beside the inline form at every knob point (r18
    // verdict task 4): the indexed plan differs (bucketed code scan +
    // cell pruning + sidecar re-rank), and it is the plan an operator
    // actually tunes in production — `match` pins that the frozen
    // persisted quantizers return the indexed probe's rows IDENTICAL to
    // inline training at every swept setting, not just the defaults
    // VectorSpec checks. First indexed call pays the one-time index
    // build (ensureIndexTable), excluded from the warm medians like the
    // inline paths' cached training.
    for (nProbe <- Seq(2, 4, 8); refine <- Seq(10, 50)) {
      val inline = VectorOps.annIvfPq(spark, sfDir, nProbe = nProbe, refine = refine)
      val (r, ms) = measure(inline)
      println(f"ANN_SWEEP ann_ivfpq nProbe=$nProbe refine=$refine recall@3=$r%.2f latency_ms=$ms%.0f")
      val indexed = VectorOps.annIvfPqIndexed(spark, sfDir, nProbe = nProbe, refine = refine)
      val (ri, msi) = measure(indexed)
      val same = inline.collect().toSeq == indexed.collect().toSeq
      println(f"ANN_SWEEP ann_ivfpq_indexed nProbe=$nProbe refine=$refine recall@3=$ri%.2f latency_ms=$msi%.0f match_inline=$same")
    }
    spark.stop()
  }
}

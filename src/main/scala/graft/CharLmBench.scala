package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The charlm long-doc micro-bench (r16 verdict task 3): pins that the
  * native scoring path ([[graft.functions.CharLmBitSum]]) stays LINEAR
  * in document size — the property the r16 CharGrams rewrite bought —
  * while also being rid of the interpreted-fold constant that rewrite
  * cost the 540-char keys. Scores fixed-count corpora of 1 KB / 10 KB /
  * 100 KB docs against one trained model and prints per-size walls plus
  * the per-char throughput ratio; a quadratic path shows a ~10× ratio
  * step per size decade (the r15 substring form measured exactly that),
  * a linear one stays flat.
  *
  * Output: one JSON line, committed as CHARLM_BENCH.json.
  */
object CharLmBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-charlm-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.sources.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val model = graft.operators.HygieneOps.trainCharLmDriver(base).getOrElse(
      sys.error("sf corpus must fit the literal model cap"))

    // deterministic text from the corpus's own charset (so lookups hit
    // like real docs, not the all-miss smoothing path)
    val seedChars = model._2.keys.toSeq.sorted.mkString
    def docOf(len: Int, salt: Int): String = {
      val sb = new java.lang.StringBuilder(len)
      var x = 0x9E3779B9L * (salt + 1)
      while (sb.length < len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(seedChars.charAt(((x >>> 33) % seedChars.length).toInt))
      }
      sb.toString
    }

    val nDocs = 512
    def corpus(len: Int): DataFrame =
      (0 until nDocs).map(i => (i.toLong, docOf(len, i))).toDF("doc_id", "text")
        .repartition(32)

    def scoreWall(d: DataFrame): Double = {
      val scored = graft.operators.HygieneOps
        .withCharLmScore(d, model._1, model._2, model._3)
      val t0 = System.nanoTime()
      // sum(bits) forces every row's score without a collect funnel
      scored.agg(sum("bits")).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val sizes = Seq(1000, 10000, 100000)
    // warm
    scoreWall(corpus(1000))
    val walls = sizes.map { len =>
      // pin the generated corpus into executor blocks OUTSIDE the timed
      // region: a LocalTableScan re-serializes the driver-local rows
      // (~50 MB at 100 KB×512) into tasks on EVERY rep, which added a
      // linear shipping constant to every published ns_per_char figure
      // (r17 review) — localCheckpoint makes the timed region scorer-only
      val d = corpus(len).localCheckpoint()
      d.count()
      try {
        val reps = (0 until 5).map(_ => scoreWall(d))
        len -> reps.sorted.apply(reps.length / 2)
      } finally { d.unpersist(true): Unit }
    }
    val perChar = walls.map { case (len, w) => len -> w / (len.toDouble * nDocs) * 1e9 }
    val ratio = perChar.last._2 / perChar.head._2
    val json = "{" +
      s""""sizes_chars":[${sizes.mkString(",")}],""" +
      s""""docs_per_size":$nDocs,""" +
      s""""median_walls_sec":[${walls.map(w => f"${w._2}%.4f").mkString(",")}],""" +
      s""""ns_per_char":[${perChar.map(p => f"${p._2}%.2f").mkString(",")}],""" +
      s""""ns_per_char_ratio_100k_vs_1k":${f"$ratio%.3f"},""" +
      s""""linear_if":"ratio ~ 1 (quadratic would be ~100x)"}"""
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    spark.stop()
  }
}

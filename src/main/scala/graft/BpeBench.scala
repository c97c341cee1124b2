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

    // ENCODE curve (r15 verdict task 1's bench deliverable): wall time of
    // the native BpeEncode expression over the corpus as the vocabulary
    // grows — must stay FLAT, vs the replace-chain form whose plan grows
    // linearly with the table. The 1024-merge vocabulary trains on the
    // corpus' space-stripped character streams (the corpus has 31
    // distinct words, so word-level BPE exhausts at 89 merges — see the
    // QueriesSpec 1k-vocabulary pin); prefixes of one greedy training ARE
    // the smaller tables (BPE trains greedily, so the first k merges of a
    // 1024-round run equal the k-round run).
    val texts = docs.select("text").collect().map(_.getString(0))
    val big = BpeBench.trainCharMerges(texts.map(_.replace(" ", "").take(150)), 1024)
    require(big.length >= 1024, s"char streams exhausted at ${big.length} merges")
    import org.apache.spark.sql.functions.{col, size => asize, sum}
    def timeEncode(frame: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      frame.collect()
      (System.nanoTime() - t0) / 1e9
    }
    def nativeFrame(n: Int) = graft.operators.TextOps
      .bpeEncodeNativeFrom(docs, big.take(n)).agg(sum(col("n_tok")))
    def chainFrame(n: Int) = graft.operators.TextOps
      .bpeEncodeFrom(docs, big.take(n)).agg(sum(col("n_tok")))
    // equal tokenization at every width the chain can still serve (the
    // full row-level pin is QueriesSpec's; this guards the bench itself)
    require(nativeFrame(64).collect()(0).getLong(0) == chainFrame(64).collect()(0).getLong(0),
      "native and chain encodes disagree on total tokens at 64 merges")
    val encodeWidths = Seq(10, 128, 512, 1024)
    val encCurve = encodeWidths.map { n =>
      timeEncode(nativeFrame(n)) // warm
      val nat = timeEncode(nativeFrame(n))
      // the chain's plan grows linearly; past a few hundred merges the
      // driver-side analysis alone dominates — only measure it while sane.
      // Warm the chain the same way the native form is warmed: each width
      // is a DIFFERENT plan, and a cold-only measurement overstates the
      // chain exactly where the two forms are meant to be comparable
      val chain = if (n <= 128) {
        timeEncode(chainFrame(n)) // warm
        Some(timeEncode(chainFrame(n)))
      } else None
      s"""{"merges":$n,"native_sec":${f2(nat)},""" +
        s""""chain_sec":${chain.map(f2).getOrElse("null")}}"""
    }.mkString("[", ",", "]")

    val out = s"""{"sf":"$sfDir","merges":${ref.size},"identical_across_widths":true,""" +
      s""""curve":$curve,"encode_curve":$encCurve}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BPE_BENCH.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"BPE_BENCH $out")
    spark.stop()
  }

  /** Driver-side greedy BPE over character sequences (count all adjacent
    * pairs weighted by sequence frequency, merge the (freq desc, l asc,
    * r asc) winner leftmost-greedy, repeat) — the bench's vocabulary
    * factory for the encode curve. Same count/tie rule the Spark trainer
    * is pinned to in QueriesSpec/PropertySpec; driver-side because 1024
    * sequential cluster rounds are training cost, not the encode cost
    * this curve isolates.
    */
  private[graft] def trainCharMerges(seqs: Seq[String], nMerges: Int): Seq[(String, String)] = {
    var words = new scala.collection.mutable.HashMap[Vector[String], Long]()
    seqs.foreach { s =>
      val k = s.split("").toVector
      words.update(k, words.getOrElse(k, 0L) + 1L)
    }
    def mergeOne(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val pairs = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((l, r), _) = pairs.minBy { case ((l, r), pf) => (-pf, l, r) }
        merges += ((l, r))
        val nw = new scala.collection.mutable.HashMap[Vector[String], Long]()
        words.foreach { case (syms, f) =>
          val m = mergeOne(syms, l, r)
          nw.update(m, nw.getOrElse(m, 0L) + f)
        }
        words = nw
      }
    }
    merges.toSeq
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition helper for the r21 optimization round:
  * times labeled sub-plans of the expensive keys through the noop sink
  * (guide §1.4 — computes every column, no sink cost) so a key's wall
  * can be attributed to its stages. Not part of the declared surface.
  *
  * Usage: runMain graft.ProfileR21 [sfDir] <probe> [probe ...]
  */
object ProfileR21 {

  private def timeNoop(label: String, df: => DataFrame): Unit = {
    val d = df
    d.sparkSession.sparkContext.setJobDescription(label)
    d.write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"PROFILE $label median=${ts(1)}%.3f [${ts.head}%.3f, ${ts.last}%.3f]")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = graft.sources.Tables(spark, sfDir, "documents")

    val registry: Map[String, () => Unit] = Map(
      "nde" -> (() => {
        // near_dup_edit decomposition
        val d = docs.filter(col("doc_id") < 400)
          .select(col("doc_id"), col("text"), length(col("text")).as("l"))
          .withColumn("bucket", floor(log(col("l") + lit(1.0)) / math.log(1.25)))
        val probesDf = d.select(col("doc_id"), col("text"), col("l"),
          explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
        val joined = probesDf.as("a").join(d.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
          .filter(abs(col("a.l") - col("b.l")) * 5 <= greatest(col("a.l"), col("b.l")))
        timeNoop("nde:pairs-only", joined.select(col("a.doc_id"), col("b.doc_id")))
        timeNoop("nde:pairs+texts", joined.select(col("a.doc_id"), col("b.doc_id"),
          length(col("a.text")).as("x"), length(col("b.text")).as("y")))
        timeNoop("nde:pairs+dp", joined.select(col("a.doc_id"), col("b.doc_id"),
          graft.functions.ThresholdLevenshtein.threshold_levenshtein(
            col("a.text"), col("b.text"),
            (greatest(col("a.l"), col("b.l")) / 5).cast("int")).as("dist")))
        timeNoop("nde:full", SparkEntry.queries("near_dup_edit")(spark, sfDir))
      }),
      "ccf" -> (() => {
        // corpus_curate_full decomposition (artifacts must already exist —
        // run the full key once first)
        import graft.operators.{HygieneOps, TextOps, WebOps}
        val d = WebOps.decorated(graft.operators.SpanOps.planted(docs))
        val raw = d.filter(col("doc_id") % 10 =!= 7)
        timeNoop("ccf:raw-scan", raw.select("doc_id", "text"))
        timeNoop("ccf:quality+domain", WebOps.withDomainGate(TextOps.withQualityScore(raw)))
        val sfx = sfDir.replaceAll("[^A-Za-z0-9]", "_")
        val lmTable = "graft_curate_lm_" + sfx
        if (spark.catalog.tableExists(lmTable + "_ctx")) {
          val ctxV = spark.table(lmTable + "_ctx")
          timeNoop("ccf:lm-join-form", HygieneOps.charlmScoreAgainst(
            raw.select("doc_id", "text"), spark.table(lmTable),
            ctxV.select("ch", "c_a"), ctxV.select("v").limit(1)))
          HygieneOps.collectCharLmModelFromTables(spark, lmTable).foreach {
            case (bg, a, v) =>
              timeNoop("ccf:lm-literal-form",
                HygieneOps.withCharLmScore(raw.select("doc_id", "text"), bg, a, v)
                  .filter(col("n_bigrams") > 0).select("doc_id", "n_bigrams", "bits"))
          }
        }
        timeNoop("ccf:full", SparkEntry.queries("corpus_curate_full")(spark, sfDir))
      }),
      "dsp" -> (() => {
        // dup_spans decomposition
        val d = graft.operators.SpanOps.planted(docs)
        val g = graft.operators.SpanOps.gramSites(d)
        timeNoop("dsp:gram-gen", g)
        timeNoop("dsp:gram-hash-gen", g.select(xxhash64(col("gram")).as("gh")))
        timeNoop("dsp:dup-count-str", g.groupBy("gram")
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("gram"))
        timeNoop("dsp:dup-count-hash", g.select(xxhash64(col("gram")).as("gh"))
          .groupBy("gh").agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("gh"))
        timeNoop("dsp:full", SparkEntry.queries("dup_spans")(spark, sfDir))
      }),
      "dsp2" -> (() => {
        // dup_spans single-pass alternatives vs the two-pass HAVING join
        val d = graft.operators.SpanOps.planted(docs)
        val g = graft.operators.SpanOps.gramSites(d)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
        val markedWin = g.withColumn("n_sites", count(lit(1)).over(w))
          .filter(col("n_sites") >= 2).select("doc_id", "pos")
        timeNoop("dsp2:marked-window", markedWin)
        timeNoop("dsp2:full-window", graft.operators.SpanOps.mergeSpans(markedWin))
        val markedCl = g.groupBy("gram")
          .agg(collect_list(struct(col("doc_id"), col("pos"))).as("sites"))
          .filter(size(col("sites")) >= 2)
          .select(explode(col("sites")).as("s"))
          .select(col("s.doc_id"), col("s.pos"))
        timeNoop("dsp2:marked-collect", markedCl)
        timeNoop("dsp2:full-collect", graft.operators.SpanOps.mergeSpans(markedCl))
        timeNoop("dsp2:full-current", graft.operators.SpanOps.dupSpansOf(d))
      }),
      "cc" -> (() => {
        // CC loop decomposition on the exact-jaccard 300-doc graph
        import graft.operators.DedupOps
        val toksD = docs.filter(col("doc_id") < 300)
          .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        val sizes = toksD.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val edges = toksD.as("a")
          .join(toksD.as("b"), col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
          .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
          .filter(col("jacc") >= 0.8)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        val nodes = docs.filter(col("doc_id") < 300).select("doc_id")
        timeNoop("cc:edges-only", edges)
        val t0 = System.nanoTime()
        val res = DedupOps.connectedComponentsTracked(nodes, edges)
        res.labels.count()
        println(f"PROFILE cc:cc-loop once=${(System.nanoTime() - t0) / 1e9}%.3f rounds=${res.rounds}")
        res.release()
        timeNoop("cc:full", SparkEntry.queries("dedup_clusters")(spark, sfDir))
      }),
      "kernels" -> (() => {
        // r21 broadcast-probe kernels vs the retained join forms (same
        // session, noop sink): the decontaminate family + heavy_hitters
        import graft.operators.{DedupOps, SpanOps, TextOps}
        val d = SpanOps.planted(docs)
        val train = d.filter(col("doc_id") % 10 =!= 7)
        val eval = d.filter(col("doc_id") % 10 === 7)
        timeNoop("kern:cross-span-join", SpanOps.crossSpansJoinFormOf(train, eval))
        timeNoop("kern:cross-span-kernel", SpanOps.crossSpansOf(train, eval))
        val dr = docs
        val tr = dr.filter(col("doc_id") % 10 =!= 7)
        val ev = dr.filter(col("doc_id") % 10 === 7)
        timeNoop("kern:decon-join", DedupOps.decontaminateAgainstJoinForm(tr, ev))
        timeNoop("kern:decon-kernel", DedupOps.decontaminateAgainst(tr, ev))
        timeNoop("kern:hh-join", TextOps.heavyHittersJoinFormOf(dr))
        timeNoop("kern:hh-kernel", TextOps.heavyHittersOf(dr))
        timeNoop("kern:decon-spans-full", SparkEntry.queries("decontaminate_spans")(spark, sfDir))
        timeNoop("kern:decon-report-full", SparkEntry.queries("decontaminate_report")(spark, sfDir))
        timeNoop("kern:corpus-curate-full-key", SparkEntry.queries("corpus_curate_full")(spark, sfDir))
      }),
      "hh" -> (() => {
        // heavy_hitters decomposition: gram generation vs MG pass vs recount
        import graft.functions.MisraGries.misra_gries
        val k = 127
        val grams = docs.filter(length(col("text")) >= 3)
          .select(col("lang"),
            explode(graft.functions.CharGrams.char_grams(col("text"), 3)).as("gram"))
        timeNoop("hh:gram-gen", grams)
        val cand = grams.groupBy("lang")
          .agg(misra_gries(col("gram"), k).as("cands"), count(lit(1)).as("n"))
          .select(col("lang"), col("n"), explode(col("cands")).as("c"))
          .select(col("lang"), col("n"), col("c.item").as("gram"))
        timeNoop("hh:mg-pass", cand)
        timeNoop("hh:recount", grams.join(broadcast(cand), Seq("lang", "gram"))
          .groupBy("lang", "gram", "n").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * (k + 1) > col("n")))
        timeNoop("hh:full", SparkEntry.queries("heavy_hitters")(spark, sfDir))
      }),
      "dkb" -> (() => {
        // dedup_keep_best decomposition: jaccard edges vs CC vs keep policy
        import graft.operators.{DedupOps, TextOps}
        timeNoop("dkb:quality", TextOps.withQualityScore(
          docs.filter(col("doc_id") < 300)).select(col("doc_id"), col("quality")))
        timeNoop("dkb:full", SparkEntry.queries("dedup_keep_best")(spark, sfDir))
        timeNoop("dkb:clusters-full", SparkEntry.queries("dedup_clusters")(spark, sfDir))
      }),
      "mmc" -> (() => {
        // multimodal_clusters decomposition: decode vs pairs vs CC+sink
        import graft.operators.MultimodalOps
        val payloads = docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val codes = MultimodalOps.perceptualCodes(spark, payloads)
        timeNoop("mmc:decode", codes)
        timeNoop("mmc:pairs", graft.operators.DedupOps.hammingPairsScored(codes))
        timeNoop("mmc:full", SparkEntry.queries("multimodal_clusters")(spark, sfDir))
      }),
      "sim" -> (() => {
        // dedup_clusters_simhash decomposition: sigs vs pairs vs CC+sink
        import graft.operators.DedupOps
        timeNoop("sim:pairs", DedupOps.simhashPairsScored(docs))
        timeNoop("sim:full", SparkEntry.queries("dedup_clusters_simhash")(spark, sfDir))
        timeNoop("sim:minhash-pairs", DedupOps.minhashPairsScored(docs))
        timeNoop("sim:minhash-full", SparkEntry.queries("dedup_clusters_minhash")(spark, sfDir))
      }),
      "emb" -> (() => {
        // embed cluster family decomposition
        import graft.operators.VectorOps
        timeNoop("emb:lsh-edges", VectorOps.embedClustersEdges(spark, sfDir))
        timeNoop("emb:lsh-full", SparkEntry.queries("embed_clusters_lsh")(spark, sfDir))
        timeNoop("emb:exact-full", SparkEntry.queries("embed_clusters")(spark, sfDir))
        timeNoop("emb:keepbest-minhash-full",
          SparkEntry.queries("dedup_keep_best_minhash")(spark, sfDir))
      }),
      "dec" -> (() => {
        val d = graft.operators.SpanOps.planted(docs)
        val train = d.filter(col("doc_id") % 10 =!= 7)
        val eval = d.filter(col("doc_id") % 10 === 7)
        val evalG = graft.operators.SpanOps.gramSites(eval)
          .groupBy("gram").agg(min(struct(col("doc_id").as("fd"), col("pos").as("fp"))).as("fe"))
          .select(col("gram"), col("fe.fd").as("first_eval"), col("fe.fp").as("first_eval_pos"))
        timeNoop("dec:eval-grams", evalG)
        timeNoop("dec:train-grams", graft.operators.SpanOps.gramSites(train))
        timeNoop("dec:marked", graft.operators.SpanOps.gramSites(train)
          .join(broadcast(evalG), Seq("gram"))
          .select("doc_id", "pos", "first_eval", "first_eval_pos"))
        timeNoop("dec:full", SparkEntry.queries("decontaminate_spans")(spark, sfDir))
      }))

    probes.foreach(p => registry(p)())
    spark.stop()
  }
}

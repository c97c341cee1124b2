package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

/** End-to-end streaming demo: chunks real documents (sf0.001) into frames,
  * feeds them through a MemoryStream in adversarial patterns, and verifies
  * the reassembled content against the source text.
  *
  *   - doc A: frames in order → RECEIVED* then DONE, content round-trips
  *   - doc B: duplicate first frame + premature final frame (REJECTed),
  *     then completes in a LATER RUN — state survives a checkpoint restart
  *   - doc C: last frame withheld → session stays pending (would EXPIRE
  *     after the 20 s TTL; the timeout path is unit-tested with
  *     TestGroupState since wall-clock waits don't belong in a demo)
  *   - event-time epilogue: doc C's frames replayed through the
  *     watermark + EventTimeTimeout wiring, then unrelated traffic
  *     advances the watermark past C's TTL → the engine emits EXPIRED
  *     without any wall-clock wait (expiry is data-driven)
  *
  * Each phase runs with Trigger.AvailableNow against a shared checkpoint:
  * with ProcessingTimeTimeout the engine schedules no-data batches on every
  * trigger forever (so `processAllAvailable` on an unbounded query never
  * settles); AvailableNow processes what exists and terminates cleanly.
  */
object StreamDemo {

  /** Runs one bounded pass of the reassembly stream over `input`,
    * collecting acks via foreachBatch (the memory sink cannot recover from
    * a checkpoint; foreachBatch is also the realistic production sink).
    */
  def runPhase(
      spark: SparkSession, input: MemoryStream[Frame], checkpoint: String,
      acc: java.util.concurrent.ConcurrentLinkedQueue[AckEvent]): Unit = {
    val q = Reassembly.stream(spark, input.toDS(), GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[AckEvent], _: Long) =>
        ds.collect().foreach(acc.add)
      }
      .start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the ingest-gate epilogue persists a bucketed signature index:
      // isolate the warehouse, and disable auto-bucketed-scan so the
      // gate's probes file-prune (the documented probe-session conf)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-stream-warehouse").toString)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 3)
      .select(col("doc_id").cast("string").as("uuid"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val C = 64
    def frames(uuid: String, text: String): Seq[Frame] =
      text.grouped(C).zipWithIndex.map { case (chunk, i) =>
        Frame(uuid, i + 1, chunk, text.length.toLong)
      }.toSeq

    val Seq((ua, ta), (ub, tb), (uc, tc)) = docs.toSeq
    val fa = frames(ua, ta)
    val fb = frames(ub, tb)
    val fc = frames(uc, tc)
    val checkpoint = Files.createTempDirectory("graft-stream-ckpt").toString

    val input = MemoryStream[Frame](implicitly[org.apache.spark.sql.Encoder[Frame]], spark.sqlContext)
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[AckEvent]()
    // Phase 1: doc A complete; doc B dup + premature final (REJECTs); C partial.
    input.addData(fa ++ Seq(fb.head, fb.head, fb.last) ++ fc.dropRight(1))
    runPhase(spark, input, checkpoint, acc)
    // Phase 2 (restarted query, state recovered from checkpoint): B completes.
    input.addData(fb.tail)
    runPhase(spark, input, checkpoint, acc)

    import scala.jdk.CollectionConverters._
    val acks = acc.asScala.toSeq.toDF()
    acks.orderBy("uuid", "next_seq", "kind").show(50, truncate = false)

    // sink-side reassembly: accepted chunks in seq order (state holds no
    // content — the byte flow rides the RECEIVED/DONE acks)
    val ackSeq = acc.asScala.toSeq
    def contentOf(u: String): String =
      ackSeq.filter(a => a.uuid == u && (a.kind == "RECEIVED" || a.kind == "DONE"))
        .sortBy(_.next_seq).map(_.chunk).mkString
    val doneSet = ackSeq.filter(_.kind == "DONE").map(_.uuid).toSet
    val rejects = acks.filter(col("kind") === "REJECT").count()
    val okA = doneSet.contains(ua) && contentOf(ua) == ta
    val okB = doneSet.contains(ub) && contentOf(ub) == tb
    val pendingC = !doneSet.contains(uc)

    // Event-time epilogue: C's partial session again, but expiry is driven
    // by the watermark (no wall-clock wait) — unrelated later traffic moves
    // the watermark past C's last-frame + TTL and the engine evicts it.
    val etInput = MemoryStream[TimedFrame](
      implicitly[org.apache.spark.sql.Encoder[TimedFrame]], spark.sqlContext)
    val etAcc = new java.util.concurrent.ConcurrentLinkedQueue[AckEvent]()
    val etCkpt = Files.createTempDirectory("graft-stream-et-ckpt").toString
    def runEtPhase(): Unit = {
      val q = Reassembly.streamEventTime(spark, etInput.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation", etCkpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[AckEvent], _: Long) =>
          ds.collect().foreach(etAcc.add)
        }
        .start()
      q.awaitTermination()
    }
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    etInput.addData(fc.dropRight(1).zipWithIndex.map { case (f, i) =>
      TimedFrame(f.uuid, f.seq, f.payload, f.filesize, at(10 + i))
    })
    runEtPhase()
    etInput.addData(Seq(TimedFrame("advancer", 1, "x", 1, at(200))))
    runEtPhase()
    etInput.addData(Seq(TimedFrame("advancer2", 1, "y", 1, at(210))))
    runEtPhase()
    val etExpired = etAcc.asScala.exists(a => a.uuid == uc && a.kind == "EXPIRED")

    // Ingest-gate epilogue: the streaming near-dup gate against a
    // persisted bucketed signature index. Batch 1 carries a near-dup of
    // an indexed doc (flagged) and a novel doc (passes, indexed); batch 2
    // re-sends the novel doc's text under a new id — flaggable only
    // through batch 1's append.
    val gateTable = "stream_demo_gate_idx"
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    DedupGate.writeSigIndex(spark, corpus.filter(col("doc_id") < 3), gateTable, nBuckets = 4)
    val novelText = corpus.filter(col("doc_id") === 5).select("text").head().getString(0)
    val seedText = corpus.filter(col("doc_id") === 0).select("text").head().getString(0)
    val gInput = MemoryStream[(Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String)]], spark.sqlContext)
    val gSeen = new scala.collection.concurrent.TrieMap[Long, (Boolean, Option[Long])]()
    val gCkpt = Files.createTempDirectory("graft-stream-gate-ckpt").toString
    def runGatePhase(batch: Seq[(Long, String)]): Unit = {
      gInput.addData(batch)
      val q = gInput.toDS().toDF("doc_id", "text").writeStream
        .option("checkpointLocation", gCkpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(DedupGate.gateBatch(gateTable, (df, _) =>
          df.collect().foreach { r =>
            gSeen.put(r.getAs[Long]("doc_id"), (r.getAs[Boolean]("is_dup"),
              Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue())))
          }) _)
        .start()
      q.awaitTermination()
    }
    runGatePhase(Seq(100L -> seedText, 101L -> novelText))
    runGatePhase(Seq(102L -> novelText))
    val gateSeedDup = gSeen.get(100L).contains((true, Some(0L)))
    val gateNovel = gSeen.get(101L).contains((false, None))
    val gateCrossBatch = gSeen.get(102L).contains((true, Some(101L)))

    // Gated-pipeline epilogue (round 12): the COMPLETE ingest chain in one
    // query — exact dedup → quality → merge → within-batch-aware near-dup
    // gate → PII scrub on final inserts. One batch carries two near-dup
    // siblings (one must index, one must flag) and a PII-bearing insert
    // (must arrive redacted with its counts).
    import spark.implicits._
    def wt(seed: String) = (1 to 30).map(i => s"${seed}_$i").mkString(" ")
    val gate2 = "stream_demo_gate2_idx"
    DedupGate.writeSigIndex(spark,
      Seq(0L -> wt("gseed")).toDF("doc_id", "text"), gate2, nBuckets = 4)
    val baseIdx = Seq((10L, wt("gknown"))).toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("existing_id"))
    val piiText = (1 to 18).map(i => s"gp$i").mkString(" ") +
      " mail bob@corp.io from 10.1.2.3"
    val pInput = MemoryStream[(Long, String, java.sql.Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, java.sql.Timestamp)]],
      spark.sqlContext)
    val pSeen = new scala.collection.concurrent.TrieMap[
      Long, (String, Option[Long], Option[String], Option[Long])]()
    val pCkpt = Files.createTempDirectory("graft-stream-gated-ckpt").toString
    pInput.addData(Seq(
      (200L, wt("gsib"), new java.sql.Timestamp(10000L)),
      (201L, wt("gsib").split(" ").init.mkString(" ") + " zz", new java.sql.Timestamp(11000L)),
      (202L, piiText, new java.sql.Timestamp(12000L))))
    val pq = StreamMerge.gatedIngestPipelineScrubbed(
      pInput.toDS().toDF("doc_id", "text", "ts"), baseIdx, gate2,
      (df, _) => df.collect().foreach { r =>
        pSeen.put(r.getAs[Long]("doc_id"), (r.getAs[String]("decision"),
          Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue()),
          Option(r.getAs[String]("redacted")),
          Option(r.getAs[java.lang.Long]("n_email")).map(_.longValue())))
      })
      .option("checkpointLocation", pCkpt)
      .trigger(Trigger.AvailableNow())
      .start()
    pq.awaitTermination()
    val gatedSibling = pSeen.get(200L).exists(_._1 == "insert") &&
      pSeen.get(201L).exists(t => t._1 == "near_dup" && t._2.contains(200L))
    val gatedScrub = pSeen.get(202L).exists(t => t._1 == "insert" &&
      t._4.contains(1L) && t._3.exists(s => s.contains("<EMAIL>") && s.contains("<IP>")))

    // Hygiene-pipeline epilogue (round 13): the chain with the URL
    // blocklist and the pre-trained-LM tail gates composed in — one
    // batch carries a blocked-domain doc and an out-of-distribution junk
    // doc; each must be attributed to ITS gate, and only the clean
    // insert may index.
    val hyTrain = (1L to 12L).map(i => i -> wt(s"hw$i")).toDF("doc_id", "text")
    val (hc, hx, hv) = graft.operators.HygieneOps.charlmModelOf(hyTrain)
    val (hmBg, hmA, hvv) = graft.operators.HygieneOps.collectCharLmModel(hc, hx, hv)
    val hyJunk = (1 to 30).map(i => s"zqxj${i}vkwq").mkString(" ")
    val hyBits = graft.operators.HygieneOps.withCharLmScore(
      Seq(1L -> wt("hw3"), 2L -> hyJunk).toDF("doc_id", "text"), hmBg, hmA, hvv)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bits")).toMap
    val hyMax = (hyBits(1L) + hyBits(2L)) / 2
    val gate3 = "stream_demo_gate3_idx"
    DedupGate.writeSigIndex(spark,
      Seq(0L -> wt("hseed")).toDF("doc_id", "text"), gate3, nBuckets = 4)
    val hInput = MemoryStream[(Long, String, java.sql.Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, java.sql.Timestamp)]],
      spark.sqlContext)
    val hSeen = new scala.collection.concurrent.TrieMap[Long, String]()
    val hCkpt = Files.createTempDirectory("graft-stream-hyg-ckpt").toString
    hInput.addData(Seq(
      (300L, wt("hw3"), new java.sql.Timestamp(10000L)),
      (301L, wt("hw4") + " via https://x.badsite.com/p", new java.sql.Timestamp(11000L)),
      (302L, hyJunk, new java.sql.Timestamp(12000L))))
    val hq = StreamMerge.gatedIngestPipelineHygiene(
      hInput.toDS().toDF("doc_id", "text", "ts"), baseIdx, gate3,
      (df, _) => df.collect().foreach { r =>
        hSeen.put(r.getAs[Long]("doc_id"), r.getAs[String]("decision"))
      },
      hmBg, hmA, hvv, hyMax, minQuality = 0.0)
      .option("checkpointLocation", hCkpt)
      .trigger(Trigger.AvailableNow())
      .start()
    hq.awaitTermination()
    val hygieneChain = hSeen.get(300L).contains("insert") &&
      hSeen.get(301L).contains("blocked_domain") &&
      hSeen.get(302L).contains("lm_tail")

    // Persisted-model LM gate (round 15): the same tail cut driven from
    // the train-once TABLE artifact through the per-batch broadcast-join
    // gate (the any-model-size path) instead of literal maps.
    graft.operators.HygieneOps.writeCharLmTableFrom(spark, hyTrain, "stream_demo_lm_model")
    val gate4 = "stream_demo_gate4_idx"
    DedupGate.writeSigIndex(spark,
      Seq(0L -> wt("lseed")).toDF("doc_id", "text"), gate4, nBuckets = 4)
    val lInput = MemoryStream[(Long, String, java.sql.Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, java.sql.Timestamp)]],
      spark.sqlContext)
    val lSeen = new scala.collection.concurrent.TrieMap[Long, String]()
    val lCkpt = Files.createTempDirectory("graft-stream-lm-ckpt").toString
    lInput.addData(Seq(
      (400L, wt("hw5"), new java.sql.Timestamp(10000L)),
      (401L, hyJunk, new java.sql.Timestamp(11000L))))
    val lq = StreamMerge.gatedIngestPipelineLm(
      lInput.toDS().toDF("doc_id", "text", "ts"), baseIdx, gate4,
      "stream_demo_lm_model", hyMax,
      (df, _) => df.collect().foreach { r =>
        lSeen.put(r.getAs[Long]("doc_id"), r.getAs[String]("decision"))
      },
      minQuality = 0.0)
      .option("checkpointLocation", lCkpt)
      .trigger(Trigger.AvailableNow())
      .start()
    lq.awaitTermination()
    val lmGate = lSeen.get(400L).contains("insert") && lSeen.get(401L).contains("lm_tail")

    // Span-scrub gate (round 15): a doc carrying a verbatim eval run is
    // kept with the run cut out (decision "scrubbed", surgery online);
    // a clean doc passes text-unchanged.
    val floor = graft.operators.SpanOps.GramK + graft.operators.SpanOps.WinnowW - 1
    val runS = (('A' to 'Z') ++ ('a' to 'r')).mkString
    require(runS.length == floor)
    SpanGate.writeEvalGramIndex(spark,
      Seq(9500L -> (wt("sevl") + " " + runS + " " + wt("sevr"))).toDF("doc_id", "text"),
      "stream_demo_eval_idx", nBuckets = 4)
    val gate5 = "stream_demo_gate5_idx"
    DedupGate.writeSigIndex(spark,
      Seq(0L -> wt("sseed")).toDF("doc_id", "text"), gate5, nBuckets = 4)
    val sInput = MemoryStream[(Long, String, java.sql.Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, java.sql.Timestamp)]],
      spark.sqlContext)
    val sSeen = new scala.collection.concurrent.TrieMap[Long, (String, String, Long)]()
    val sCkpt = Files.createTempDirectory("graft-stream-scrub-ckpt").toString
    val leakyText = wt("scla") + " " + runS + " " + wt("sclb")
    sInput.addData(Seq(
      (500L, wt("sclean"), new java.sql.Timestamp(10000L)),
      (501L, leakyText, new java.sql.Timestamp(11000L))))
    val sq = StreamMerge.gatedIngestPipelineDecontamScrub(
      sInput.toDS().toDF("doc_id", "text", "ts"), baseIdx, gate5, "stream_demo_eval_idx",
      (df, _) => df.collect().foreach { r =>
        sSeen.put(r.getAs[Long]("doc_id"), (r.getAs[String]("decision"),
          r.getAs[String]("text"), r.getAs[Long]("leak_chars")))
      })
      .option("checkpointLocation", sCkpt)
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    val scrubGate = sSeen.get(500L).exists(t => t._1 == "insert" && t._2 == wt("sclean")) &&
      sSeen.get(501L).exists(t => t._1 == "scrubbed" && !t._2.contains(runS) &&
        t._2.length.toLong == leakyText.length - t._3)

    // Perceptual gate (round 19): a near-identical raster of an indexed
    // image flags with its hamming witness; the inverted gradient (far
    // in dHash space) indexes as novel.
    def p5(rows: Array[Int]): Array[Byte] =
      s"P5\n4 ${rows.length}\n255\n".getBytes("US-ASCII") ++
        rows.flatMap(v => Array.fill(4)(v.toByte))
    val rising = Array.tabulate(64)(r => r * 4)
    val nearRaster = { val p = rising.clone(); p(31) = (p(31) + 20) % 256; p5(p) }
    val pTable = "stream_demo_percept_idx"
    PerceptGate.writeCodeIndex(spark,
      Seq(1L -> p5(rising)).toDF("doc_id", "payload"), pTable, nBuckets = 4)
    val pgSeen = new scala.collection.concurrent.TrieMap[Long, Boolean]()
    PerceptGate.gateBatchWithinAware(pTable, (df, _) =>
      df.collect().foreach(r =>
        pgSeen.put(r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_dup"))))(
      Seq(600L -> nearRaster, 601L -> p5(rising.reverse)).toDF("doc_id", "payload"), 0L)
    val perceptGate = pgSeen.get(600L).contains(true) && pgSeen.get(601L).contains(false)

    // Embedding gate (round 19): a scaled copy of an indexed vector
    // (cosine 1) flags against the ANN family's own persisted LSH index;
    // a novel direction passes and indexes.
    def axis(i: Int, s: Float): Array[Float] =
      Array.tabulate(64)(d => if (d == i) s else 0f)
    val eTable = "stream_demo_embed_idx"
    graft.operators.VectorOps.writeLshIndexFrom(spark,
      Seq(1L -> axis(0, 1f)).toDF("vec_id", "embedding"), eTable, nBuckets = 4)
    val eSeen = new scala.collection.concurrent.TrieMap[Long, Boolean]()
    EmbedGate.gateBatchWithinAware(eTable, (df, _) =>
      df.collect().foreach(r =>
        eSeen.put(r.getAs[Long]("vec_id"), r.getAs[Boolean]("is_dup"))))(
      Seq(700L -> axis(0, 2f), 701L -> axis(1, 1f)).toDF("vec_id", "embedding"), 0L)
    val embedGate = eSeen.get(700L).contains(true) && eSeen.get(701L).contains(false)

    // Embedding COMPOSITION (round 20): the full production chain with a
    // doc-keyed embed index — a doc arriving WITH a duplicate embedding
    // becomes embed_dup (attributed to the at-rest doc), an
    // embedding-less doc passes the stage untouched.
    val ecSig = "stream_demo_ec_sig"
    DedupGate.writeSigIndex(spark,
      Seq(0L -> wt("ecseed")).toDF("doc_id", "text"), ecSig, nBuckets = 4)
    val ecEmb = "stream_demo_ec_emb"
    graft.operators.VectorOps.writeLshIndexFrom(spark,
      Seq(10L -> axis(0, 1f)).toDF("vec_id", "embedding"), ecEmb, nBuckets = 4)
    val ecInput = MemoryStream[(Long, String, java.sql.Timestamp, Option[Array[Float]])](
      implicitly[org.apache.spark.sql.Encoder[
        (Long, String, java.sql.Timestamp, Option[Array[Float]])]],
      spark.sqlContext)
    val ecSeen = new scala.collection.concurrent.TrieMap[Long, (String, Option[Long])]()
    val ecCkpt = Files.createTempDirectory("graft-stream-ec-ckpt").toString
    ecInput.addData(Seq(
      (800L, wt("eca"), new java.sql.Timestamp(10000L), Some(axis(0, 3f))),
      (801L, wt("ecb"), new java.sql.Timestamp(11000L), None)))
    val ecq = StreamMerge.gatedIngestPipelineProduction(
      ecInput.toDS().toDF("doc_id", "text", "ts", "embedding"), baseIdx,
      ecSig, "stream_demo_eval_idx", "stream_demo_lm_model", Double.MaxValue,
      (df, _) => df.collect().foreach { r =>
        ecSeen.put(r.getAs[Long]("doc_id"), (r.getAs[String]("decision"),
          Option(r.getAs[java.lang.Long]("embed_of")).map(_.longValue())))
      },
      minTokens = 10, minQuality = 0.0,
      embedTable = Some(ecEmb))
      .option("checkpointLocation", ecCkpt)
      .trigger(Trigger.AvailableNow())
      .start()
    ecq.awaitTermination()
    val embedCompose = ecSeen.get(800L).contains(("embed_dup", Some(10L))) &&
      ecSeen.get(801L).exists(t => t._1 == "insert" && t._2.isEmpty)

    println(s"STREAM_DEMO okA=$okA okB=$okB pendingC=$pendingC rejects=$rejects " +
      s"eventTimeExpired=$etExpired gateSeedDup=$gateSeedDup gateNovel=$gateNovel " +
      s"gateCrossBatch=$gateCrossBatch gatedSibling=$gatedSibling gatedScrub=$gatedScrub " +
      s"hygieneChain=$hygieneChain lmGate=$lmGate scrubGate=$scrubGate " +
      s"perceptGate=$perceptGate embedGate=$embedGate embedCompose=$embedCompose")
    spark.stop()
    if (!(okA && okB && pendingC && rejects >= 2 && etExpired &&
        gateSeedDup && gateNovel && gateCrossBatch && gatedSibling && gatedScrub &&
        hygieneChain && lmGate && scrubGate && perceptGate && embedGate &&
        embedCompose)) sys.exit(1)
  }
}

package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Near-duplicate detection properties: the hot-bucket star-pair guard
  * (a skewed corpus must not explode quadratically on one reducer), the
  * connectivity invariant under the guard, and the candidate-quality probe
  * (LSH candidates must be far more similar than random pairs).
  */
class DedupSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toks(s: String): Set[String] = s.split(" ").toSet
  private def jaccard(a: String, b: String): Double = {
    val (x, y) = (toks(a), toks(b))
    x.intersect(y).size.toDouble / x.union(y).size
  }

  test("500 identical docs produce O(n) star pairs, not O(n^2) (hot-bucket cap)") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val d = (1L to 500L).map(i => (i, text)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(d).collect()
    // all 500 share every band bucket -> star: min id (1) linked to all others
    assert(pairs.length == 499, s"expected 499 star pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 1L), "star root must be the bucket minimum id")
    assert(pairs.map(_.getLong(1)).toSet == (2L to 500L).toSet)
  }

  test("near-dup pairs below the cap still get all-pairs candidates") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val variant = ((1 to 29).map(i => s"w$i") :+ "wX").mkString(" ")
    val fillers = (100L to 140L).map(i => i -> (1 to 30).map(j => s"f${i}_$j").mkString(" "))
    val d = (Seq(1L -> base, 2L -> variant) ++ fillers).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-identical pair (1,2) missing from $pairs")
    assert(!pairs.exists(p => p._1 >= 100L && p._2 >= 100L && p._1 != p._2 - 0),
      s"unrelated filler docs paired: ${pairs.filter(p => p._1 >= 100L)}")
  }

  test("simhash pairs: exact duplicates found at hamming 0, random docs not paired") {
    import spark.implicits._
    val dupText = (1 to 25).map(i => s"dup$i").mkString(" ")
    val rand = (10L to 60L).map(i => i -> (1 to 25).map(j => s"r${i}_$j").mkString(" "))
    val d = (Seq(1L -> dupText, 2L -> dupText, 3L -> dupText) ++ rand).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dupPairs = pairs.filter(p => p._1 <= 3 && p._2 <= 3)
    assert(dupPairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"identical docs must all pair: ${dupPairs.toSeq}")
    assert(dupPairs.forall(_._3 == 0))
    assert(!pairs.exists(p => p._1 >= 10L), s"random docs paired: ${pairs.toSeq}")
  }

  test("simhash pairs: 500 identical docs stay O(n) under the hot-bucket star guard") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val d = (1L to 500L).map(i => (i, text)).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(d).collect()
    assert(pairs.length == 499)
    assert(pairs.forall(r => r.getLong(0) == 1L && r.getInt(2) == 0))
  }

  test("flood bucket (3000 identical docs): membership aggregation is cap-guarded, connectivity kept") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val d = (1L to 3000L).map(i => (i, text)).toDF("doc_id", "text")
    val q = DedupOps.minhashPairs(d)
    // plan proof of bounded row width: the only collect_list in the plan
    // sits above the bucket_n <= cap filter, so a flood bucket can never
    // materialize as one O(b) aggregation row — it takes the streamed
    // star-pair branch instead
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("collect_list"), plan.takeWhile(_ != '\n'))
    assert(plan.contains("bucket_n"), "bucket annotation missing from plan")
    assert(plan.contains(s"<= ${DedupOps.HotBucketCap}"),
      s"no bucket-size cap filter guarding the membership aggregation")
    val pairs = q.collect()
    assert(pairs.length == 2999, s"star must keep every member connected, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 1L))
    assert(pairs.map(_.getLong(1)).toSet == (2L to 3000L).toSet)
    // the small/large branches both derive from the banded subtree; AQE
    // stage reuse must materialize the signature scan + band shuffle ONCE
    // (final adaptive plan replaces the second exchange with a reuse)
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") || finalPlan.contains("ReusedQueryStage"),
      s"band-key exchange not reused across union branches:\n${finalPlan.take(3000)}")
  }

  test("dedup_clusters_minhash: verified candidate pairs share labels, clusters keep min id as rep") {
    val out = SparkEntry.queries("dedup_clusters_minhash")(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs, "every document must receive a cluster label")
    val label = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = SparkEntry.queries("dedup_minhash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(scored.nonEmpty, "no minhash candidates at sf0.01 — composition test is vacuous")
    val verified = scored.filter(_._3 >= DedupOps.MinhashVerifySlots)
    assert(verified.nonEmpty, "no verified candidates at sf0.01 — composition test is vacuous")
    verified.foreach { case (a, b, _) =>
      assert(label(a) == label(b), s"verified pair ($a,$b) split across clusters")
    }
    label.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c not labeled by its minimum member")
    }
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) == r.getLong(1)), "is_rep must mark the label row")
    }
  }

  test("dedup_clusters_simhash: hamming-verified pairs share labels, min-id labeling holds") {
    val out = SparkEntry.queries("dedup_clusters_simhash")(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs, "every document must receive a cluster label")
    val label = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no simhash pairs at sf0.01 — composition test is vacuous")
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"hamming-verified pair ($a,$b) split across clusters")
    }
    label.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c not labeled by its minimum member")
    }
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) == r.getLong(1)), "is_rep must mark the label row")
    }
  }

  test("slot_match native expression is bit-identical to the interpreted HOF slot count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    import graft.functions.SlotMatch.slot_match
    val hof = expr("size(filter(zip_with(a, b, (p, q) -> p = q), m -> m))")
    val rows = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L)), // 3 equal
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L, 99L)),    // length mismatch: common prefix
      (Array.empty[Long], Array(1L, 2L)),             // empty side
      (Array(7L), Array(7L)),
      ((1L to 16L).toArray, (1L to 16L).toArray)
    ).toDF("a", "b")
    rows.select(slot_match(col("a"), col("b")).as("native"), hof.as("h")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"native ${r.getInt(0)} != HOF ${r.getInt(1)}"))
    // null ELEMENTS drop from the count in both forms
    val withNulls = spark.range(1).select(
      expr("array(1L, CAST(null AS BIGINT), 3L)").as("a"),
      expr("array(1L, CAST(null AS BIGINT), 3L)").as("b"))
    val g = withNulls.select(slot_match(col("a"), col("b")), hof).head()
    assert(g.getInt(0) == 2 && g.getInt(1) == 2, s"null-element semantics diverge: $g")
  }

  test("pair scoring counts equal signature slots inside the bucket") {
    import spark.implicits._
    // synthetic banded rows: docs 1,2 collide in a bucket but agree on only
    // 6/16 slots (a false band collision); docs 3,4 are true duplicates
    val sigA = (1L to 16L).toArray
    val sigB = (1L to 6L).toArray ++ Array.fill(10)(100L)
    val sigC = (21L to 36L).toArray
    val banded = Seq(
      (1L, 0, 111L, sigA), (2L, 0, 111L, sigB),
      (3L, 1, 222L, sigC), (4L, 1, 222L, sigC)
    ).toDF("doc_id", "band_id", "bh", "sig")
    val scored = DedupOps.pairsFromBuckets(banded).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(scored == Set((1L, 2L, 6), (3L, 4L, 16)),
      s"sig_match must count equal slots per co-bucketed pair: $scored")
  }

  test("a planted false band collision does NOT merge clusters; a verified pair does") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // (1,2): band collision whose signatures agree on 6/16 slots — below
    // MinhashVerifySlots, must stay unclustered. (3,4): verified duplicate.
    val scored = Seq(
      (1L, 2L, 6), (3L, 4L, 16)
    ).toDF("doc_a", "doc_b", "sig_match")
    val label = DedupOps.clustersFromScoredPairs(nodes, scored, "planted-false-collision")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(label(1L) != label(2L),
      "false collision (sig_match 6/16) must not chain docs into one cluster")
    assert(label(1L) == 1L && label(2L) == 2L && label(5L) == 5L)
    assert(label(3L) == 3L && label(4L) == 3L, "verified pair must share the min-id label")
  }

  test("embed_clusters_lsh: LSH candidate pairs share labels, clusters keep their min id as rep") {
    import graft.operators.VectorOps
    val out = SparkEntry.queries("embed_clusters_lsh")(spark, sfDir).collect()
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.length == nVecs, "every vector must receive a cluster label")
    val label = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("embed_neardup_lsh")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no LSH candidates at sf0.01 — composition test is vacuous")
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"candidate pair ($a,$b) split across clusters")
    }
    label.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c not labeled by its minimum member")
    }
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(0) == r.getLong(1)), "is_rep must mark the label row")
    }
  }

  test("connectedComponents releases superseded checkpoint generations") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    SparkEntry.queries("dedup_clusters_minhash")(spark, sfDir).collect()
    val leaked = (sc.getPersistentRDDs.keySet -- before).size
    assert(leaked <= 1,
      s"CC left $leaked persisted generations; only the final labels may survive")
  }

  test("embed_neardup_lsh: a planted dense cluster stays O(b) under the hot-bucket star guard") {
    import graft.operators.VectorOps
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val v0 = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val neg = v0.map(x => -x)
    // 600 identical members flood one bucket (> hotCap 256); the negated
    // 10-vector group lands in the complement bucket (every hyperplane
    // dot flips sign), so it stays below cap and must keep ALL pairs
    val rows = (1L to 600L).map(i => (i, v0)) ++ (2001L to 2010L).map(i => (i, neg))
    val d = rows.toDF("vec_id", "embedding")
    val pairs = VectorOps.embedNeardupLshFrame(d, nBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val flood = pairs.filter(p => p._1 <= 600L && p._2 <= 600L)
    assert(flood.length == 599, s"flood must emit star pairs, got ${flood.length}")
    assert(flood.forall(_._1 == 1L), "star root must be the bucket minimum id")
    assert(flood.map(_._2).toSet == (2L to 600L).toSet, "star must keep every member connected")
    val mini = pairs.filter(p => p._1 >= 2001L)
    assert(mini.length == 10 * 9 / 2, s"below-cap bucket must keep all pairs, got ${mini.length}")
    assert(!pairs.exists(p => p._1 <= 600L && p._2 >= 2001L),
      "opposite vectors (cosine -1) must never pair")
  }

  test("connectedComponents: reliable-checkpoint mode matches local mode; release frees storage + files") {
    import spark.implicits._
    val sc = spark.sparkContext
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-cc-reliable")
    sc.setCheckpointDir(ckptDir.toString)
    def rddDirs(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(ckptDir)
      try s.iterator().asScala.toSeq.filter(_.getFileName.toString.startsWith("rdd-"))
      finally s.close()
    }
    val nodes = (1L to 12L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L), (7L, 8L), (9L, 10L)).toDF("src", "dst")
    val local = DedupOps.connectedComponentsTracked(nodes, edges)
    val rel = DedupOps.connectedComponentsTracked(nodes, edges, reliable = true)
    val lm = local.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rm = rel.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm == rm, "reliable mode must produce identical components")
    assert(lm(1L) == 1L && lm(3L) == 1L && lm(5L) == 4L && lm(8L) == 6L && lm(11L) == 11L)
    // path-halving mode: identical fixpoint, fewer-or-equal rounds on a
    // chain-y graph (the 1-2-3 and 6-7-8 chains exercise the jump)
    val comp = DedupOps.connectedComponentsTracked(nodes, edges, compress = true)
    val cm = comp.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cm == lm, "compress mode must produce identical components")
    assert(comp.rounds <= local.rounds,
      s"path halving took MORE rounds (${comp.rounds} > ${local.rounds})")
    comp.release()
    assert(rddDirs().nonEmpty, "reliable mode must have written checkpoint files")
    val persistedBefore = sc.getPersistentRDDs.size
    local.release()
    rel.release()
    assert(sc.getPersistentRDDs.size <= persistedBefore - 2,
      "release() must drop both final-generation block sets")
    assert(rddDirs().isEmpty,
      s"release() must delete the reliable checkpoint files, left: ${rddDirs()}")
  }

  test("embed_neardup_lsh finds the high-sim brute-force pairs (recall measured)") {
    import graft.operators.VectorOps
    // brute-force pairs above threshold on the full sf0.01 corpus
    val brute = {
      import graft.functions.FloatDot.float_dot
      import org.apache.spark.sql.functions._
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"),
          sqrt(float_dot(col("embedding"), col("embedding"))).as("nrm"))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("sim", float_dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
        .filter(col("sim") > 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val lsh = VectorOps.embedNeardupLsh(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH must not produce false positives (true sim is recomputed)")
    val recall = if (brute.isEmpty) 1.0 else lsh.intersect(brute).size.toDouble / brute.size
    info(f"embed_neardup_lsh recall vs brute force at sf0.01: $recall%.2f (${lsh.size}/${brute.size} pairs)")
  }

  test("native SimHashSig is bit-identical to the interpreted HOF bit-vote form") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("native", graft.functions.SimHashSig.simhash_sig(col("toks")))
      .withColumn("hof", expr(
        """aggregate(sequence(0, 63), 0L, (acc, i) -> acc +
          |  if(aggregate(toks, 0L, (a, t) -> a + if((shiftright(xxhash64(t), i) & 1) = 1, 1L, -1L)) > 0,
          |     shiftleft(1L, i), 0L))""".stripMargin))
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("decontaminate: flags exactly the train docs sharing an 8-token shingle with the eval slice, train side exchange-free") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("decontaminate")(spark, sfDir)
    // r21: the eval shingle set rides a broadcast VARIABLE probed by the
    // ShingleProbe kernel — the train side contributes no join and no
    // exchange at all (the r7-r20 plan broadcast-joined it; at 100 TB the
    // corpus side must never shuffle for this op either way). The final
    // orderBy is the only exchange left in the plan.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("shingle_probe"),
      s"decontaminate must probe through the ShingleProbe kernel:\n$plan")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"decontaminate must not join the corpus side:\n$plan")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "sf0.01 contains planted near-dups spanning the eval slice")
    // no eval doc may flag itself as contaminated train data
    assert(rows.forall(_._1 % 10 != 7), "eval docs leaked into the train-side output")
    assert(rows.forall(_._2 >= 1), "a flagged doc must share at least one shingle")
    // ground-truth cross-check for one flagged doc: recompute its shared
    // shingles driver-side against the full eval slice
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(s: String): Set[String] = {
      val t = s.split(" "); (0 to t.length - 8).map(i => t.slice(i, i + 8).mkString(" ")).toSet
    }
    val evalShingles = texts.collect { case (id, tx) if id % 10 == 7 => shingles(tx) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val (docId, nShared, _) = rows.head
    assert(shingles(texts(docId)).count(evalShingles.contains) == nShared,
      s"doc $docId driver-side shared-shingle count disagrees with the query")
    // and an unflagged train doc truly has no overlap
    val flagged = rows.map(_._1).toSet
    val unflagged = texts.keys.filter(id => id % 10 != 7 && !flagged.contains(id)).take(25)
    unflagged.foreach { id =>
      assert(!shingles(texts(id)).exists(evalShingles.contains),
        s"doc $id overlaps eval but was not flagged")
    }
  }

  test("cluster-report sink honors spark.graft.cc.sinkRoot (warehouse deployment path)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cc-confroot").toString
    val before = SparkEntry.queries("dedup_clusters")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.cc.sinkRoot", root)
    try {
      val out = SparkEntry.queries("dedup_clusters")(spark, "/root/testdata/sf0.001")
      val rows = out.collect().map(_.toSeq).toSeq
      assert(rows == before, "configured root must not change the result")
      // the report parquet really landed under the configured root
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      val parquets =
        try walk.filter(_.toString.endsWith(".parquet")).count()
        finally walk.close()
      assert(parquets > 0, s"no parquet under configured sink root $root")
    } finally spark.conf.unset("spark.graft.cc.sinkRoot")
  }

  test("gcSinkRoot reaps other runs' aged subroots, never its own or young ones") {
    val root = java.nio.file.Files.createTempDirectory("graft-cc-gcroot")
    spark.conf.set("spark.graft.cc.sinkRoot", root.toString)
    try {
      // this JVM's own subroot comes into existence via a real run
      val own = SparkEntry.queries("dedup_clusters")(spark, "/root/testdata/sf0.001")
      assert(own.count() > 0)
      val ownDir = root.toFile.listFiles().filter(_.getName.startsWith("cc-")) match {
        case Array(d) => d
        case other => fail(s"expected exactly the run's own subroot, got ${other.toSeq}")
      }
      // fake prior runs: one aged out, one recent
      val old = root.resolve("cc-deadbeef")
      val young = root.resolve("cc-12345678")
      java.nio.file.Files.createDirectory(old)
      java.nio.file.Files.createDirectory(young)
      assert(old.toFile.setLastModified(System.currentTimeMillis() - 48 * 3600 * 1000L))
      // age the OWN subroot too: its survival below must come from the
      // name guard, not from a fresh mtime (a >24h-running job calling
      // the GC must never reap its own live label tables)
      assert(ownDir.setLastModified(System.currentTimeMillis() - 48 * 3600 * 1000L))
      val reaped = DedupOps.gcSinkRoot(spark, olderThanMs = 24 * 3600 * 1000L)
      assert(reaped == 1, s"exactly the aged foreign subroot, got $reaped")
      assert(!java.nio.file.Files.exists(old), "aged subroot must be gone")
      assert(java.nio.file.Files.exists(young), "young subroot must survive")
      // the run's own subroot survives regardless of age
      val ownDirs = root.toFile.listFiles().filter(_.getName.startsWith("cc-"))
      assert(ownDirs.length == 2, s"own + young remain: ${ownDirs.map(_.getName).toSeq}")
      assert(DedupOps.gcSinkRoot(spark, 24 * 3600 * 1000L) == 0, "gc is idempotent")
    } finally spark.conf.unset("spark.graft.cc.sinkRoot")
  }

  test("candidate quality: LSH candidates are far more similar than random pairs") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cands = SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.nonEmpty, "no minhash candidates at sf0.01")
    val candAvg = cands.map { case (a, b) => jaccard(texts(a), texts(b)) }.sum / cands.length
    val ids = texts.keys.toArray.sorted
    val randPairs = ids.indices.take(500).map(i => (ids(i), ids((i * 37 + 11) % ids.length)))
      .filter(p => p._1 != p._2)
    val randAvg = randPairs.map { case (a, b) => jaccard(texts(a), texts(b)) }.sum / randPairs.length
    info(f"avg Jaccard: candidates $candAvg%.3f vs random $randAvg%.3f (n=${cands.length})")
    assert(candAvg >= randAvg + 0.2,
      f"candidate quality margin collapsed: $candAvg%.3f vs random $randAvg%.3f")
  }

  test("near_dup_edit: log-length-bucket candidates cover every pair the naive product finds") {
    // the key's coverage proof (dist >= |la-lb| => ratio >= 0.8 => <= 1
    // bucket apart) checked empirically: the bucketed equi-join result
    // must EQUAL the exhaustive all-pairs result on the same range
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id < 400").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val prev = Array.ofDim[Int](b.length + 1)
      val cur = Array.ofDim[Int](b.length + 1)
      for (j <- 0 to b.length) prev(j) = j
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, b.length + 1)
      }
      prev(b.length)
    }
    val exhaustive = (for {
      (ia, ta) <- d; (ib, tb) <- d
      if ia < ib
      la = ta.length; lb = tb.length
      if 5 * math.abs(la - lb) <= math.max(la, lb) // dist >= |la-lb| shortcut
      dist = lev(ta, tb)
      if 5 * dist <= math.max(la, lb)
    } yield (ia, ib, la.toLong, lb.toLong, dist.toLong)).toSet
    val bucketed = SparkEntry.queries("near_dup_edit")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(exhaustive.nonEmpty, "fixture lost its near-dup pairs — test is vacuous")
    assert(bucketed == exhaustive,
      s"bucketed candidates diverge from the exhaustive product: " +
        s"missing=${(exhaustive -- bucketed).take(3)} extra=${(bucketed -- exhaustive).take(3)}")
  }

  test("near_dup_edit_minhash: emitted pairs pass the 20% rule and are a subset of the exact relation; planted near-dup recall floored (r18 task 3)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // (a) + subset: on the exact key's bounded range, the production
    // composition must emit only pairs the exact relation contains, with
    // identical distances (precision is exact — only recall can differ,
    // a pair must share >= 1 minhash band to become a candidate)
    val bounded = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 400).select("doc_id", "text")
    val prod = DedupOps.nearDupEditMinhashOf(bounded).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val exact = SparkEntry.queries("near_dup_edit")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(prod.nonEmpty, "production composition found nothing on the bounded range — vacuous")
    assert(prod.subsetOf(exact),
      s"emitted pairs must be a subset of the exact relation: extra=${(prod -- exact).take(3)}")
    assert(prod.forall { case (_, _, la, lb, dist) => 5 * dist <= math.max(la, lb) },
      "every emitted pair must pass the 20% rule with its exact distance")
    info(s"bounded-range recall vs exact: ${prod.size}/${exact.size}")
    // (b) planted near-dups: 12 pairs of 40-token docs differing in ONE
    // token (shingle Jaccard ~0.85 -> band-collision recall ~0.95/pair,
    // deterministic for this fixture). Every planted pair passes the 20%
    // edit rule by construction, so misses are BAND misses, the quantity
    // this floor pins.
    val planted = (1 to 12).flatMap { i =>
      val toks = (1 to 40).map(t => s"w${i}_$t")
      val edited = toks.updated(17, s"x${i}_edit")
      Seq((1000L + i, toks.mkString(" ")), (2000L + i, edited.mkString(" ")))
    }.toDF("doc_id", "text")
    val found = DedupOps.nearDupEditMinhashOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (1 to 12).count(i => found.contains((1000L + i, 2000L + i)))
    assert(hits >= 10, s"planted near-dup recall floor broken: $hits/12 found ($found)")
    assert(found.forall { case (a, b) => (a % 1000L) == (b % 1000L) },
      s"distinct planted groups must not cross-pair: $found")
    // determinism: the seeded minhash makes the candidate set a pure
    // function of the fixture
    val again = DedupOps.nearDupEditMinhashOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == found, "candidate generation must be deterministic")
  }

  test("dedup_keep_best: one keeper per cluster, the argmax-quality member, clusters match dedup_clusters") {
    val out = SparkEntry.queries("dedup_keep_best")(spark, sfDir).collect()
    assert(out.length == 300)
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same cluster structure as the min-id-policy key
    out.foreach(r => assert(r.getLong(1) == clusters(r.getLong(0)),
      s"doc ${r.getLong(0)}: cluster diverges from dedup_clusters"))
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rs) =>
      val keepers = rs.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length == 1, s"cluster $c must keep exactly one member")
      val k = keepers.head
      // the keeper is the argmax quality, ties to the lowest doc_id
      val best = rs.minBy(r => (-r.getAs[Double]("quality"), r.getLong(0)))
      assert(k.getLong(0) == best.getLong(0),
        s"cluster $c kept doc ${k.getLong(0)}, argmax is ${best.getLong(0)}")
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length))
    }
    // the policy must actually differ from min-id somewhere on this
    // corpus, or the key proves nothing beyond dedup_clusters
    val multi = byCluster.filter(_._2.length > 1)
    assert(multi.nonEmpty, "corpus must contain non-singleton clusters")
    assert(multi.exists { case (c, rs) =>
      rs.filter(_.getAs[Boolean]("keep")).head.getLong(0) != c
    } || multi.forall { case (c, rs) =>
      // degenerate-but-legal alternative: argmax always IS the min id;
      // then at least assert qualities genuinely vary within clusters
      rs.map(_.getAs[Double]("quality")).distinct.length > 1
    }, "keep-best is indistinguishable from min-id on this corpus")
  }

  test("dedup_keep_best_minhash: keep policy composed with the PRODUCTION clustering (r14 task 1)") {
    val out = SparkEntry.queries("dedup_keep_best_minhash")(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs, "every document must receive a keep verdict")
    // cluster agreement with the production relation, full corpus
    val prod = SparkEntry.queries("dedup_clusters_minhash")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(1) == prod(r.getLong(0)),
      s"doc ${r.getLong(0)}: cluster diverges from dedup_clusters_minhash"))
    // one keeper per cluster; the keeper is the quality argmax (ties to
    // lowest doc_id) under the shared text_quality formula
    val quality = SparkEntry.queries("text_quality")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rs) =>
      val keepers = rs.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length == 1, s"cluster $c must keep exactly one member")
      val best = rs.minBy(r => (-quality(r.getLong(0)), r.getLong(0)))
      assert(keepers.head.getLong(0) == best.getLong(0),
        s"cluster $c kept ${keepers.head.getLong(0)}, argmax is ${best.getLong(0)}")
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length))
    }
    // non-vacuous: the minhash relation must have real multi-doc
    // clusters at sf0.01, and somewhere the keep policy must pick a
    // NON-min-id member (else this proves nothing over is_rep)
    val multi = byCluster.filter(_._2.length > 1)
    assert(multi.nonEmpty, "no multi-doc minhash clusters at sf0.01 — test is vacuous")
    assert(multi.exists { case (c, rs) =>
      rs.filter(_.getAs[Boolean]("keep")).head.getLong(0) != c
    } || multi.forall { case (_, rs) =>
      rs.map(r => quality(r.getLong(0))).distinct.length > 1
    }, "keep-best indistinguishable from min-id on the minhash relation")
  }

  test("dedup_containment: containment dominates Jaccard and hits 1.0 on a planted sub-document") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // planted: doc 2 is a strict prefix (first 12 words) of doc 1 —
    // Jaccard ~12/40 stays under any dedup threshold; containment must be 1.0
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-containment").toString
    Seq((1L, long), (2L, short)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("dedup_containment")(spark, tmp).collect()
    assert(rows.length == 1, s"exactly the planted pair: ${rows.toSeq}")
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getDouble(5) == 1.0, s"strict sub-document must score containment 1.0, got $r")
    // the same pair under Jaccard: inter / (na + nb - inter) = 10/38 — the
    // formula difference IS the operator's reason to exist
    val na = r.getLong(2); val nb = r.getLong(3); val inter = r.getLong(4)
    assert(inter.toDouble / (na + nb - inter) < 0.5, "planted pair must be Jaccard-invisible")
  }

  test("threshold_levenshtein native is value-identical to the builtin levenshtein(a, b, k)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    import graft.functions.ThresholdLevenshtein.threshold_levenshtein
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcde ", "abcdefghij \u00e9\u00fc", "\u4e16\u754c\ud83d\ude00a")
    def randStr(maxLen: Int): String = {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val n = rnd.nextInt(maxLen + 1)
      (1 to n).map(_ => alpha.charAt(rnd.nextInt(alpha.length))).mkString
    }
    val cases = Seq(
      ("", "", 0), ("", "", 5), ("a", "", 0), ("", "abc", 3), ("", "abc", 2),
      ("abc", "abc", 0), ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("flaw", "lawn", 2), ("flaw", "lawn", 1)) ++
      (1 to 400).map(_ => (randStr(30), randStr(30), rnd.nextInt(12))) ++
      (1 to 50).map(_ => (randStr(200), randStr(200), rnd.nextInt(60)))
    val df = cases.toDF("a", "b", "k")
    val got = df.select(
      threshold_levenshtein(col("a"), col("b"), col("k")).as("native"),
      expr("levenshtein(a, b, k)").as("builtin")).collect()
    got.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1),
        s"native=${r.getInt(0)} builtin=${r.getInt(1)} for $c")
    }
    // the exact call shape near_dup_edit uses: threshold from the lengths
    val pairs = (1 to 200).map(_ => (randStr(120), randStr(120)))
    val pdf = pairs.toDF("ta", "tb")
      .selectExpr("ta", "tb", "CAST(greatest(length(ta), length(tb)) / 5 AS INT) AS k")
    val g2 = pdf.select(
      threshold_levenshtein(col("ta"), col("tb"), col("k")).as("native"),
      expr("levenshtein(ta, tb, k)").as("builtin")).collect()
    g2.foreach(r => assert(r.getInt(0) == r.getInt(1), s"mismatch: $r"))
  }

  test("shingle-probe kernel ≡ join form: full corpus + adversarial whitespace (r21)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val train = d.filter(col("doc_id") % 10 =!= 7)
    val eval = d.filter(col("doc_id") % 10 === 7)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val kernel = rows(DedupOps.decontaminateAgainst(train, eval))
    val join = rows(DedupOps.decontaminateAgainstJoinForm(train, eval))
    assert(kernel == join, s"kernel/join decontaminate outputs differ: " +
      s"only-kernel=${(kernel -- join).take(3)} only-join=${(join -- kernel).take(3)}")
    assert(kernel.nonEmpty, "pin is vacuous: no contamination on this corpus")
    // adversarial whitespace: empty tokens (double/leading/trailing
    // spaces) must tokenize exactly like split(text, ' ') with limit -1,
    // multi-byte text must slice on code points — mirror a shared window
    // across train/eval with varied space patterns
    val w8 = "one two  three four five six seven eight" // double space inside
    val tricky = Seq(
      1L -> s"  $w8 tail-a", 2L -> s"$w8   ", 3L -> s"prefix-b $w8",
      4L -> "日本 語 ち ょ う 文 字 列 extra 😀",
      5L -> ("lone " * 3).trim)
      .toDF("doc_id", "text")
    val evalT = Seq(107L -> s"x $w8 y", 117L -> "日本 語 ち ょ う 文 字 列 extra 😀 z")
      .toDF("doc_id", "text")
    val k2 = rows(DedupOps.decontaminateAgainst(tricky, evalT))
    val j2 = rows(DedupOps.decontaminateAgainstJoinForm(tricky, evalT))
    assert(k2 == j2, s"kernel/join differ on adversarial whitespace: kernel=$k2 join=$j2")
    assert(k2.nonEmpty, "adversarial fixture found no overlap — pin vacuous")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that make these
  * operators survive a 100 TB scale-up are checked against the actual
  * planned output, so a refactor that silently defeats pushdown, pruning,
  * broadcast selection, or top-k short-circuiting fails here rather than
  * in production. (Plan strings come from the pre-execution AQE plan —
  * broadcast hints, scan pushdown and TakeOrderedAndProject are all
  * decided by then.)
  */
class PlanSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sfDir).queryExecution.executedPlan.toString

  test("filter_project pushes predicates into the parquet scan") {
    val p = plan("filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan") || p.contains("LessThan"), s"no comparison pushed:\n$p")
  }

  test("ingest_scan prunes to the projected columns only") {
    val p = plan("ingest_scan")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"), read)
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"),
      s"scan reads columns the query never uses: $read")
  }

  test("join_broadcast and join_multi broadcast the small dimensions") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
    val multi = plan("join_multi")
    assert(multi.contains("BroadcastHashJoin"), multi)
  }

  test("sort_topk compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("sort_topk").contains("TakeOrderedAndProject"))
  }

  test("aggregations partial-aggregate map-side and run inside whole-stage codegen") {
    val df = SparkEntry.queries("agg_group")(spark, sfDir)
    assert(plan("agg_group").contains("partial_sum"), "no map-side partial aggregation")
    df.collect() // finalize THIS adaptive plan — codegen stages appear post-execution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the final-plan rendering
    assert(p.contains("*("), s"no whole-stage codegen span:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("no nested-loop or cartesian joins outside the declared baselines") {
    // embed_neardup/dedup_jaccard are bounded verification baselines and
    // color_nearest is a 16-row broadcast palette — everything else must
    // plan hash/sort-merge joins only
    val exempt = Set("embed_neardup", "dedup_jaccard", "color_nearest", "color_nearest_256")
    SparkEntry.queries.keys.filterNot(exempt).toSeq.sorted.foreach { k =>
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian product")
      // BroadcastNestedLoopJoin with a broadcast query side is fine for the
      // knn scan (non-equi != condition on a 10-row side); flag only
      // non-broadcast NLJ
      assert(!p.contains("NestedLoopJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$k plans a non-broadcast nested-loop join")
    }
  }

  test("pii_redact is a narrow scrub: pruned scan, no shuffle before the final sort") {
    val p = plan("pii_redact")
    assert(p.contains("struct<doc_id:bigint,text:string>"),
      s"scan must prune to (doc_id, text):\n$p")
    assert(!p.contains("Window") && !p.contains("Join"), s"scrub must stay narrow:\n$p")
    // the only exchange is the declared total ORDER BY
    val exchanges = p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"expected only the final sort exchange, got $exchanges:\n$p")
  }

  test("dedup_lines_global builds a partial-agg'd frequency table and never windows") {
    val p = plan("dedup_lines_global")
    assert(!p.contains("Window"), s"global line dedup must not window:\n$p")
    assert(p.contains("partial_count"), s"line frequency must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("dedup_lines_global production form broadcasts the boilerplate sliver") {
    val p = graft.operators.HygieneOps.dedupLinesGlobalBroadcast(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"sliver must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"line instances must not shuffle into the join:\n$p")
  }

  test("corpus_filter_rep stays window-free like its parent filter") {
    val p = plan("corpus_filter_rep")
    assert(!p.contains("Window"), s"corpus_filter_rep must not window:\n$p")
    assert(p.contains("partial_min"), "canonical-id groupBy must partial-aggregate")
    assert(p.contains("partial_max") || p.contains("partial_sum"),
      "repetition stats must partial-aggregate")
  }

  test("stratified samplers broadcast the thresholds and window only the pruned residue") {
    for (k <- Seq("sample_stratified", "sample_temperature")) {
      val p = plan(k)
      assert(p.contains("BroadcastHashJoin"), s"$k must broadcast thresholds onto the corpus:\n$p")
      // the rank window must sit ABOVE the threshold prune (i.e. over
      // the pruned residue, not the raw corpus). Catalyst folds the
      // `hv < thresh` prune into the broadcast join's non-equi
      // condition, so the prune line IS the join line mentioning
      // thresh; the plan prints top-down, so it must come after Window
      val lines = p.linesIterator.toSeq
      val wIdx = lines.indexWhere(_.contains("Window"))
      val fIdx = lines.indexWhere(l => l.contains("thresh") &&
        (l.contains("Filter") || l.contains("BroadcastHashJoin")))
      assert(wIdx >= 0 && fIdx > wIdx, s"$k: rank window must consume the pruned residue:\n$p")
    }
  }

  test("color_nearest argmin is a partial aggregation, not a window sort") {
    val p = plan("color_nearest")
    assert(!p.contains("Window"), s"argmin still plans a window over the 16x scored rows:\n$p")
    assert(p.contains("partial_min"), s"no map-side partial argmin:\n$p")
    val p256 = plan("color_nearest_256")
    assert(!p256.contains("Window") && p256.contains("partial_min"),
      s"256-entry scan must keep the partial-agg argmin shape:\n${p256.take(400)}")
  }

  test("color_nearest_256: computed palette matches the reference table; dark cutoff and scan agree with a direct evaluation (r18)") {
    import graft.operators.ScalarOps
    // spot-pin the COMPUTED palette against reference entries
    // (src/ansi.tpp:97-337): cube corners/interior and the gray ramp
    val pal = ScalarOps.ExtendedPalette.map(e => e._4 -> ((e._1, e._2, e._3))).toMap
    assert(pal(16) == ((0, 0, 0)) && pal(17) == ((0, 0, 95)) &&
      pal(21) == ((0, 0, 255)) && pal(22) == ((0, 95, 0)) &&
      pal(231) == ((255, 255, 255)) && pal(232) == ((8, 8, 8)) &&
      pal(239) == ((78, 78, 78)) && pal(255) == ((238, 238, 238)),
      s"computed MAP_256C drifted from the reference table")
    assert(ScalarOps.ExtendedPalette.size == 240)
    // direct reference-algorithm evaluation (driver-side, independent of
    // the Spark plan) over the key's own point synthesis
    def closest(r: Int, g: Int, b: Int): Int = {
      if (r < 20 && g < 15 && b < 15) return 16
      var bestC = -1; var bestD = Long.MaxValue
      ScalarOps.ExtendedPalette.foreach { case (cr, cg, cb, code) =>
        val d = (1024L + (r + cr)) * (r - cr) * (r - cr) +
          2048L * (g - cg) * (g - cg) +
          (1534L - (r + cr)) * (b - cb) * (b - cb)
        if (d < bestD) { bestD = d; bestC = code } // strict <: first wins
      }
      bestC
    }
    val rows = SparkEntry.queries("color_nearest_256")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val (k, r, g, b, code) = (row.getLong(0), row.getLong(1).toInt,
        row.getLong(2).toInt, row.getLong(3).toInt, row.getInt(4))
      assert(code == closest(r, g, b),
        s"part $k ($r,$g,$b): engine code $code != reference algorithm ${closest(r, g, b)}")
    }
    assert(rows.exists(_.getInt(4) >= 232), "gray ramp never chosen — scan not exercised")
    assert(rows.exists(r => r.getLong(1) < 20 && r.getLong(2) < 15 && r.getLong(3) < 15 &&
      r.getInt(4) == 16) || !rows.exists(r =>
      r.getLong(1) < 20 && r.getLong(2) < 15 && r.getLong(3) < 15),
      "dark rows (if any) must take the cutoff")
  }

  test("decontaminate_strip is one narrow pass: no join, no exchange but the output sort") {
    // r21: the cross-span kernel merges a doc's spans inside the row, so
    // the cut is probe → fold with NO join at all (the r7-r20 form
    // aggregated spans per doc and broadcast-joined them back; a
    // sort-merge join here would have shuffled full corpus text at
    // 100 TB). The final orderBy's range exchange is the declared
    // deterministic-output cost.
    val p = plan("decontaminate_strip")
    assert(p.contains("cross_span_probe"), s"no in-row span probe:\n$p")
    assert(!p.contains("Join"), s"strip must not join at all:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"expected at most the output-sort exchange, got $exchanges:\n$p")
    // the probe must be evaluated ONCE per row: the fold referencing it
    // lives in its own projection (clean_text), with n_removed derived
    // in a later one — a collapsed plan would inline the probe twice
    assert("cross_span_probe".r.findAllIn(p).length == 1,
      s"span probe duplicated in the plan:\n$p")
  }

  test("corpus_curate: canonical dedup partial-aggs and the strip runs in-row") {
    // the canonical groupBy(h).min(doc_id) must map-side combine (the
    // 100 TB dedup shape); the span cut is the r21 in-row kernel (probe
    // → fold, evaluated once — no span join at all), so kept text
    // shuffles only for the canonical equi-join, which is
    // hash-partitioned by design.
    val p = plan("corpus_curate")
    assert(p.contains("partial_min"), s"no map-side partial canonical argmin:\n$p")
    assert("cross_span_probe".r.findAllIn(p).length == 1,
      s"strip must probe in-row exactly once:\n$p")
  }

  test("dedup_keep_best_minhash: per-cluster argmax is a partial aggregation, not a window") {
    // the keep decoration must stay window-free on the PRODUCTION
    // relation too — a window over (cluster) would funnel mega-clusters
    // through single reducers at 100 TB
    val p = plan("dedup_keep_best_minhash")
    assert(!p.contains("Window"), s"keep policy plans a window:\n$p")
    assert(p.contains("partial_min"), s"no map-side partial argmax:\n$p")
  }

  test("corpus_filter composes with aggregation + join only — no window") {
    val p = plan("corpus_filter")
    assert(!p.contains("Window"), s"corpus_filter must not window:\n$p")
    assert(p.contains("partial_min"), "canonical-id groupBy must partial-aggregate")
  }

  test("vocab_topk phase-1 window partitions by (lang, salt), not lang alone") {
    val p = plan("vocab_topk")
    // the plan prints top-down, so the LAST window line is the deepest =
    // phase 1, the one that sorts the full vocabulary — it must fan out
    // over the salt; only the <=40-row survivor re-rank (the earlier,
    // upper line) may partition by lang alone
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.size == 2, s"expected exactly two windows:\n${windowLines.mkString("\n")}")
    assert(windowLines.last.contains("salt"),
      s"the vocab-sized phase-1 window is not salted:\n${windowLines.mkString("\n")}")
  }

  test("heavy_hitters: sketch partial-aggregates map-side, recount joins by broadcast only") {
    import org.apache.spark.sql.functions._
    import graft.functions.MisraGries.misra_gries
    // pass 1 (MG candidates — since r21 a separate metadata-scale collect
    // inside the key, so it no longer appears in the declared plan; pin
    // its shape directly): the bounded MG buffer must combine BEFORE the
    // exchange — partial_misra_gries is the whole point of a mergeable
    // sketch
    val cand = graft.sources.Tables(spark, sfDir, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("lang"),
        explode(graft.functions.CharGrams.char_grams(col("text"), 3)).as("gram"))
      .groupBy("lang").agg(misra_gries(col("gram"), 127).as("cands"))
    val cp = cand.queryExecution.executedPlan.toString
    assert(cp.contains("partial_misra_gries"), s"no map-side sketch partial agg:\n$cp")
    // pass 2 (r21 kernel recount): the collected candidates are probed
    // in-row by cand_gram_count, so the gram stream is never materialized
    // as join rows; the only join left is the per-lang totals broadcast
    val p = plan("heavy_hitters")
    assert(p.contains("cand_gram_count"), s"recount does not probe candidates in-row:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"per-lang totals join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"recount must not sort-merge the gram stream:\n$p")
  }

  test("quality_compress is a narrow native-expression map: no shuffle before the output sort") {
    val p = plan("quality_compress")
    assert(p.contains("deflate_size"), p)
    assert(!p.contains("HashAggregate") && !p.contains("Window"), s"unexpected wide op:\n$p")
    // exactly the one output-ordering exchange (rangepartitioning for orderBy)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"expected at most the output-sort exchange, got $exchanges:\n$p")
  }

  test("knn_topk broadcasts the query side and partial-aggregates the top-k") {
    val p = plan("knn_topk")
    assert(p.contains("Broadcast"), s"queries not broadcast:\n$p")
    assert(p.contains("partial_top_k") || p.contains("ObjectHashAggregate"),
      s"TopK must partial-aggregate map-side:\n$p")
  }

  test("join_skew routes hot keys through broadcast joins and stays union-of-two-branches") {
    val p = plan("join_skew")
    // hot-key detection join, hot-side anti join, and the hot fact⋈dim
    // join are all broadcasts — no shuffle ever receives a hot key's rows
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"hot path must plan broadcast joins:\n$p")
    assert(p.contains("Union"), s"hot/cold branches must union:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("saltedSkewJoin is semantically identical to the plain inner join") {
    import graft.operators.RelationalOps
    import org.apache.spark.sql.functions.col
    val ev = spark.read.parquet(s"$sfDir/events.parquet").select("user_id", "value")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val skew = RelationalOps.saltedSkewJoin(ev, cust, "user_id", "c_custkey", 80L)
    val plain = ev.join(cust, col("user_id") === col("c_custkey"))
      .select(skew.columns.map(col): _*)
    assert(skew.count() == plain.count(), "row cardinality diverged")
    assert(skew.exceptAll(plain).isEmpty && plain.exceptAll(skew).isEmpty,
      "salted skew join changed the join's multiset semantics")
    // the threshold genuinely splits this data: both branches non-empty
    val hotKeys = ev.groupBy("user_id").count().filter(col("count") > 80).count()
    assert(hotKeys > 0, "no hot keys at threshold 80 — hot branch untested")
    assert(hotKeys < ev.select("user_id").distinct().count(),
      "every key hot at threshold 80 — cold branch untested")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join (conf pinned)") {
    // At 100 TB a selective dim filter should reach the fact scan as a
    // bloom semi-filter BEFORE the shuffle — Spark injects it, but only
    // under confs whose defaults (10 GB application-side threshold) are
    // tuned for clusters, not this test box. This test pins the exact
    // conf set a deployment needs and that the injection still fires on
    // our join shape in this Spark version.
    import org.apache.spark.sql.functions.col
    val changed = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle-join shape
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = changed.map { case (k, _) => k -> spark.conf.getOption(k) }
    changed.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"runtime bloom filter was not injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("tfidf_topk ranks per-doc with a group-limited window, never a single-partition funnel") {
    val p = plan("tfidf_topk")
    // Spark's WindowGroupLimit pushes the rank<=3 cutoff below the
    // shuffle — each map task keeps 3 rows per doc before exchanging
    assert(p.contains("WindowGroupLimit"), s"rank-limit pushdown missing:\n$p")
    // the ranking window itself partitions by doc_id (the global
    // SinglePartition exchange in this plan is only the 1-row corpus
    // count — legitimate); a window without partition keys would funnel
    assert(p.contains("hashpartitioning(doc_id"),
      s"per-doc window must hash-partition on doc_id:\n$p")
  }

  test("bpe_encode is one pruned scan + narrow maps: no join, no window, one output-sort exchange") {
    val p = plan("bpe_encode")
    assert(p.contains("struct<doc_id:bigint,text:string>"),
      s"encode scan must prune to (doc_id, text):\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"encode must stay a narrow map:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"only the declared output ordering may exchange, found $exchanges:\n$p")
  }

  test("dedup_exact groups on the hash with map-side partial aggregation") {
    val p = plan("dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(p.linesIterator.count(_.trim.startsWith("+- Exchange")) <= 2,
      s"dedup_exact shuffles more than hash-agg + order:\n$p")
  }

  test("ack_verify joins without broadcasting the full sent side") {
    // both sides are the same scale — must be a shuffled equi-join
    val p = plan("ack_verify")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("dup_spans: pruned scan, equi-join marking, doc-partitioned merge window") {
    val p = plan("dup_spans")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") && !read.contains("lang"),
      s"scan must read only (doc_id, text): $read")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the span merge must partition by doc_id, never a global window
    assert(p.contains("windowspecdefinition(doc_id"), s"merge window not doc-partitioned:\n$p")
  }

  test("domain_filter broadcasts the blocklist; extraction is scan + generate, no text shuffle") {
    val p = plan("domain_filter")
    assert(p.contains("BroadcastHashJoin"), s"blocklist side must broadcast:\n$p")
    // the only non-broadcast joins are the id-keyed verdict joins — the
    // text column must never appear in an Exchange's output
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("domain_cap phase-1 window partitions by (domain, salt), not domain alone") {
    val p = plan("domain_cap")
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.size == 2, s"expected exactly two windows:\n${windowLines.mkString("\n")}")
    // deepest window = phase 1, the one that sees a domain's full
    // population — it must fan out over the salt
    assert(windowLines.last.contains("salt"),
      s"the domain-sized phase-1 window is not salted:\n${windowLines.mkString("\n")}")
  }

  test("url_registrable is scan + generate + narrow PSL chain: no text shuffle, no join") {
    val p = plan("url_registrable")
    assert(!p.contains("Join"), s"PSL literal form must not join:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("dup_spans_winnow mark join keys on (gh, gh2, salt), not the bare gram hash") {
    val docs = graft.operators.SpanOps.planted(
      graft.sources.Tables(spark, sfDir, "documents"))
    // at test SF the one-row-per-key dup side broadcasts (fine); the join
    // keys must still carry the salt so the same plan, under the
    // production shuffle regime, fans a mega-dup gram over the salts
    val p = graft.operators.SpanOps.dupSpansWinnowOf(docs)
      .queryExecution.executedPlan.toString
    val joinLines = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("gh")).toSeq
    assert(joinLines.nonEmpty, s"no mark join found:\n$p")
    joinLines.foreach(l =>
      assert(l.contains("salt"), s"mark join does not key on the salt:\n$l"))
    // production regime: with broadcast off, the site-side exchange must
    // hash-partition on (gh, gh2, salt) — the (gh, gh2)-only exchange
    // would be the one-reducer funnel for a universal-boilerplate gram
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ps = graft.operators.SpanOps.dupSpansWinnowOf(docs)
        .queryExecution.executedPlan.toString
      // the join itself must key on the salt...
      val joins = ps.linesIterator
        .filter(l => l.contains("Join") && l.contains("gh")).toSeq
      assert(joins.nonEmpty && joins.forall(_.contains("salt")),
        s"shuffle-regime mark join does not key on the salt:\n${joins.mkString("\n")}")
      // ...and its input exchanges partition on (gh, gh2, salt). (The
      // count groupBy's (gh, gh2)-only exchange is legitimate — partial
      // agg bounds its per-key volume to one row.)
      assert(ps.linesIterator.exists(l => l.contains("hashpartitioning") &&
        l.contains("gh") && l.contains("salt")),
        s"no salted gram-hash exchange under shuffle regime:\n$ps")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("charlm_quality scores in one narrow pass — no join at all (r16 task 3)") {
    val p = plan("charlm_quality")
    // r17: the charset-bounded model ships INSIDE the native CharLmBitSum
    // constant, so the corpus-facing plan is a pure map — stronger than
    // the r16 "broadcast the model, never the reverse" fact this test
    // used to pin (the broadcast-join form remains the unbounded-model
    // path: CharLmGate/charlmScoreAgainst, pinned bit-identical to this
    // one in CharLmSpec)
    assert(p.contains("charlm_bitsum"), s"native scorer missing:\n$p")
    assert(!p.contains("Join"), s"native scorer must not join:\n$p")
    assert("Exchange".r.findAllIn(p).length == 1,
      s"only the presentation sort may exchange:\n$p")
  }
}

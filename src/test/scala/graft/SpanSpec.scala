package graft

import graft.operators.SpanOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level dedup (dup_spans family) semantics:
  *  - a shared verbatim run of length L ≥ K is reported as EXACTLY the
  *    [start, start+L) span at each site (the Lee et al. ExactSubstr
  *    relation at threshold K);
  *  - within-document repetition is found (doc-level dedup's blind spot);
  *  - strip_dup_spans reconstructs precisely prefix+suffix and removes
  *    every occurrence of the duplicated run;
  *  - the winnowed production sibling is SOUND (every winnow span sits
  *    inside an exact span), detects the planted boilerplate, and — with
  *    true window-min winnowing — carries a DETERMINISTIC recall floor:
  *    every duplicated run of length ≥ K+w−1 is detected at every site;
  *  - the salted mark join ([[SpanOps.MarkSaltN]]) is row-identical to
  *    the unsalted plan, including under a planted mega-duplicated gram.
  */
class SpanSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val K = SpanOps.GramK

  /** Unique filler: no K-gram of it recurs anywhere (distinct char soup
    * per (tag, len) — tags chosen disjoint per doc).
    */
  private def filler(tag: Char, len: Int): String =
    (0 until len).map(i => ('a' + ((i * 7 + tag.toInt * 13) % 26)).toChar)
      .zipWithIndex.map { case (c, i) => if (i % 5 == 0) tag else c }.mkString

  test("a shared run of length L >= K yields exactly the [start, start+L) span at each site") {
    import spark.implicits._
    // the shared run must be aperiodic (a periodic run duplicates its own
    // interior grams and widens the expected span): 60 DISTINCT symbols
    val run = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '7')).mkString
    assert(run.length == 60 && run.sliding(K).toSeq.distinct.size == 60 - K + 1)
    val pa = filler('q', 80); val sa = filler('r', 50)
    val pb = filler('s', 33); val sb = filler('t', 95)
    val d = Seq(1L -> (pa + run + sa), 2L -> (pb + run + sb)).toDF("doc_id", "text")
    val spans = SpanOps.dupSpansOf(d).orderBy("doc_id").collect()
    assert(spans.length == 2, s"expected one span per doc, got ${spans.toSeq}")
    val bySite = spans.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySite(1L) == (81L, 141L), s"doc 1 span ${bySite(1L)}") // 1-based [81, 141)
    assert(bySite(2L) == (34L, 94L), s"doc 2 span ${bySite(2L)}")
    assert(spans.forall(_.getAs[Long]("span_len") == 60L))
  }

  test("within-document repetition is detected (doc-level dedup blind spot)") {
    import spark.implicits._
    val block = (('A' to 'Z') ++ ('0' to '9') ++ Seq('#', '$', '%', '&')).mkString
    assert(block.length == 40 && block.sliding(K).toSeq.distinct.size == 40 - K + 1)
    val d = Seq(7L -> (filler('u', 60) + block + filler('v', 70) + block + filler('w', 40)))
      .toDF("doc_id", "text")
    val spans = SpanOps.dupSpansOf(d).orderBy("span_start").collect()
    assert(spans.length == 2, s"expected both copies flagged, got ${spans.toSeq}")
    assert(spans(0).getLong(1) == 61L && spans(0).getLong(2) == 101L)
    assert(spans(1).getLong(1) == 171L && spans(1).getLong(2) == 211L)
  }

  test("strip_dup_spans reconstructs prefix+suffix exactly and removes every copy") {
    import spark.implicits._
    val run = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '7')).mkString
    val pa = filler('q', 80); val sa = filler('r', 50)
    val pb = filler('s', 33); val sb = filler('t', 95)
    val noDup = filler('z', 120)
    val d = Seq(1L -> (pa + run + sa), 2L -> (pb + run + sb), 3L -> noDup)
      .toDF("doc_id", "text")
    val out = SpanOps.stripSpansOf(d).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == pa + sa, "doc 1 must be prefix+suffix")
    assert(out(1).getString(1) == pb + sb, "doc 2 must be prefix+suffix")
    assert(out(2).getString(1) == noDup && out(2).getLong(2) == 0L, "span-free doc untouched")
    assert(out(0).getLong(2) == 60L && out(1).getLong(2) == 60L)
    assert(!out.exists(_.getString(1).contains(run)), "no copy of the run survives")
  }

  test("a fully-duplicated document strips to the empty string") {
    import spark.implicits._
    val t = filler('k', 90)
    val d = Seq(1L -> t, 2L -> t).toDF("doc_id", "text")
    val out = SpanOps.stripSpansOf(d).orderBy("doc_id").collect()
    assert(out.forall(_.getString(1) == ""), s"got ${out.toSeq}")
    assert(out.forall(_.getLong(2) == 90L))
  }

  test("declared keys: planted boilerplate found in every planted doc; spans well-formed") {
    val spans = SparkEntry.queries("dup_spans")(spark, sfDir)
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val joined = spans.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (s, e, l, n) = (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
        r.getAs[Long]("span_len"), r.getAs[Long]("n_grams"))
      assert(l == e - s && l >= K && n >= 1 && s >= 1)
      val plantedLen = r.getAs[Long]("len") +
        (if (r.getAs[Long]("doc_id") % 6 == 1) SpanOps.Boiler.length else 0)
      assert(e <= plantedLen + 1, s"span past text end: $r")
    }
    // every planted doc's boiler tail is covered by some span
    val planted = docs.filter(col("doc_id") % 6 === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val covered = joined.filter { r =>
      planted.get(r.getAs[Long]("doc_id")).exists { origLen =>
        r.getAs[Long]("span_start") <= origLen + 2 &&
          r.getAs[Long]("span_end") >= origLen + SpanOps.Boiler.length
      }
    }.map(_.getAs[Long]("doc_id")).toSet
    assert(covered == planted.keySet,
      s"boiler not covered for ${planted.keySet -- covered}")
  }

  test("strip key removes the boilerplate from every planted doc") {
    val out = SparkEntry.queries("strip_dup_spans")(spark, sfDir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(!r.getString(1).contains(SpanOps.Boiler.trim.take(40)),
        s"boiler survived in doc ${r.getLong(0)}")
    }
  }

  test("randomized corpora: engine spans equal an independent driver-side reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    (1 to 8).foreach { iter =>
      val nDocs = 20 + rnd.nextInt(30)
      val pool = Vector.fill(3)(
        (0 until (35 + rnd.nextInt(40))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val corpus = (1L to nDocs.toLong).map { id =>
        val base = (0 until (60 + rnd.nextInt(150)))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        val t = if (rnd.nextInt(3) == 0) {
          val sn = pool(rnd.nextInt(pool.size))
          val p = rnd.nextInt(base.length)
          base.take(p) + sn + base.drop(p)
        } else base
        id -> t
      }
      // independent reference: exact gram marking + island merge in plain Scala
      val sites = for {
        (id, t) <- corpus
        i <- 0 to t.length - K
      } yield (t.substring(i, i + K), id, (i + 1).toLong)
      val counts = sites.groupBy(_._1).view.mapValues(_.size).toMap
      val ref = sites.filter(s => counts(s._1) >= 2)
        .map(s => (s._2, s._3)).groupBy(_._1).toSeq.flatMap { case (id, ps) =>
          val positions = ps.map(_._2).sorted
          val islands = positions.foldLeft(List.empty[List[Long]]) {
            case (Nil, p) => List(List(p))
            case (cur :: done, p) =>
              if (p > cur.head + K) List(p) :: cur :: done
              else (p :: cur) :: done
          }.map(_.reverse).reverse
          islands.map(ps2 =>
            (id, ps2.head, ps2.last + K, ps2.last + K - ps2.head, ps2.length.toLong))
        }.sortBy(r => (r._1, r._2))
      val got = SpanOps.dupSpansOf(corpus.toDF("doc_id", "text"))
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got == ref, s"iter $iter: engine spans diverge from reference")
      // strip conservation on the same corpus: removed mass = span mass
      val stripped = SpanOps.stripSpansOf(corpus.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val refMass = ref.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
      corpus.foreach { case (id, _) =>
        assert(stripped(id) == refMass.getOrElse(id, 0L),
          s"iter $iter doc $id: removed ${stripped(id)} vs span mass ${refMass.getOrElse(id, 0L)}")
      }
      // winnow soundness against the REFERENCE spans (not just the
      // engine's own exact spans): every winnow span sits inside one
      val refByDoc = ref.groupBy(_._1)
      SpanOps.dupSpansWinnowOf(corpus.toDF("doc_id", "text")).collect().foreach { r =>
        val (id, s, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(refByDoc.getOrElse(id, Seq.empty).exists(t => t._2 <= s && e <= t._3),
          s"iter $iter: winnow span ($id, $s, $e) not inside any reference span")
      }
    }
  }

  test("dup_profile: zeros for span-free docs, mass conservation, threshold rule") {
    val spans = SparkEntry.queries("dup_spans")(spark, sfDir).collect()
    val prof = SparkEntry.queries("dup_profile")(spark, sfDir).collect()
    assert(prof.length == 500, "every doc must appear in the profile")
    val mass = spans.groupBy(_.getLong(0))
      .view.mapValues(rs => (rs.length.toLong, rs.map(_.getAs[Long]("span_len")).sum)).toMap
    prof.foreach { r =>
      val id = r.getLong(0)
      val (nSpans, dupChars) = mass.getOrElse(id, (0L, 0L))
      assert(r.getAs[Long]("n_spans") == nSpans && r.getAs[Long]("dup_chars") == dupChars,
        s"doc $id profile disagrees with dup_spans")
      assert(r.getAs[Boolean]("keep") ==
        (dupChars.toDouble / r.getAs[Long]("n_chars") <= 0.5))
    }
    assert(prof.exists(!_.getAs[Boolean]("keep")),
      "the corpus' full duplicates must trip the 50% rule")
  }

  test("decontaminate_spans: cross-set runs exactly reported; train-train runs invisible") {
    import spark.implicits._
    val run = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '7')).mkString // shared with eval
    val runTT = (('A' to 'Z') ++ ('0' to '9') ++ Seq('#', '$', '%', '&')).mkString // train-train only
    assert(!run.sliding(K).exists(g => runTT.contains(g)), "fixtures must not share grams")
    val train = Seq(
      1L -> (filler('a', 70) + run + filler('b', 40)),
      2L -> (filler('c', 55) + runTT + filler('d', 60)),
      3L -> (filler('e', 45) + runTT + filler('f', 80))).toDF("doc_id", "text")
    val eval = Seq(100L -> (filler('g', 30) + run + filler('h', 50))).toDF("doc_id", "text")
    val out = SpanOps.crossSpansOf(train, eval).collect()
    assert(out.length == 1, s"only the cross-set run may report: ${out.toSeq}")
    val r = out(0)
    assert(r.getLong(0) == 1L && r.getAs[Long]("span_start") == 71L &&
      r.getAs[Long]("span_end") == 131L && r.getAs[Long]("first_eval") == 100L,
      s"wrong cross span: $r")
    // eval-side coordinate: the run starts at position 31 in eval doc 100
    // (after its 30-char filler prefix)
    assert(r.getAs[Long]("first_eval_pos") == 31L,
      s"eval coordinate must pinpoint the run start in the eval doc: $r")
  }

  test("decontaminate_spans key: every planted train doc's boiler is flagged against eval") {
    val out = SparkEntry.queries("decontaminate_spans")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // planted TRAIN docs (boiler appended, not in the eval slice) must
    // all be flagged with a span reaching into the boiler tail, and the
    // implicated eval doc must be an eval-slice id
    val plantedTrain = docs.keySet.filter(id => id % 6 == 1 && id % 10 != 7)
    val flagged = out.groupBy(_.getLong(0))
    plantedTrain.foreach { id =>
      val spans = flagged.getOrElse(id, Array.empty)
      assert(spans.exists(_.getAs[Long]("span_end") > docs(id) + 1),
        s"planted train doc $id not flagged in its boiler tail")
    }
    out.foreach(r => assert(r.getAs[Long]("first_eval") % 10 == 7,
      s"first_eval must be an eval-slice doc: $r"))
    // eval-side coordinates: boiler spans implicate the LOWEST planted
    // eval doc (id 7: the only id <= 17 with id%10==7 and id%6==1), and
    // the position must land inside doc 7's planted text
    val doc7Len = docs(7L) + SpanOps.Boiler.length
    val boilerSpans = out.filter(_.getAs[Long]("first_eval") == 7L)
    assert(boilerSpans.nonEmpty, "no span implicates planted eval doc 7")
    boilerSpans.foreach { r =>
      val p = r.getAs[Long]("first_eval_pos")
      assert(p >= 1 && p + K - 1 <= doc7Len,
        s"first_eval_pos $p outside planted eval doc 7 (len $doc7Len): $r")
    }
    // at least one purely-boiler span pinpoints the boiler start in doc 7
    assert(boilerSpans.exists(_.getAs[Long]("first_eval_pos") == docs(7L) + 1),
      "no span pinpoints the boiler start position in eval doc 7")
  }

  test("decontaminate_strip: leak mass cut exactly, clean text re-detects ZERO spans (r15)") {
    val spans = SparkEntry.queries("decontaminate_spans")(spark, sfDir).collect()
    val stripped = SparkEntry.queries("decontaminate_strip")(spark, sfDir).collect()
    // mass conservation: each train doc loses exactly its merged span mass
    val massByDoc = spans.groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("span_len")).sum }
    stripped.foreach { r =>
      val want = massByDoc.getOrElse(r.getLong(0), 0L)
      assert(r.getAs[Long]("n_removed") == want,
        s"doc ${r.getLong(0)}: removed ${r.getAs[Long]("n_removed")}, span mass $want")
    }
    assert(massByDoc.nonEmpty && stripped.exists(_.getAs[Long]("n_removed") > 0),
      "corpus must contain real leaks or the test is vacuous")
    // the remediation post-condition: re-running detection on the CLEAN
    // text against the same eval slice finds nothing (no seam-minted
    // gram on this corpus — the documented caveat would show up here)
    import spark.implicits._
    val d = graft.sources.Tables(spark, sfDir, "documents")
    val evalDocs = SpanOps.planted(d.select(col("doc_id"), col("text")))
      .filter(col("doc_id") % 10 === 7)
    val cleanAsDocs = stripped.map(r => (r.getLong(0), r.getAs[String]("clean_text")))
      .toSeq.toDF("doc_id", "text")
    val re = SpanOps.crossSpansOf(cleanAsDocs, evalDocs).count()
    assert(re == 0, s"clean text still leaks $re spans against eval")
    // production sibling: the WINNOWED cut is sound — per doc it removes
    // a subset of the exact cut's mass (never clean text) — and still
    // cuts every planted train doc's boiler (≥ K+w−1 chars, the
    // deterministic floor)
    val train = SpanOps.planted(d.select(col("doc_id"), col("text")))
      .filter(col("doc_id") % 10 =!= 7)
    val winStrip = SpanOps.decontaminateStripWinnowOf(train, evalDocs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_removed")).toMap
    stripped.foreach { r =>
      assert(winStrip(r.getLong(0)) <= r.getAs[Long]("n_removed"),
        s"doc ${r.getLong(0)}: winnow cut ${winStrip(r.getLong(0))} exceeds exact " +
          s"cut ${r.getAs[Long]("n_removed")}")
    }
    val plantedTrain = stripped.map(_.getLong(0)).filter(id => id % 6 == 1)
    assert(plantedTrain.nonEmpty)
    plantedTrain.foreach { id =>
      assert(winStrip(id) > 0, s"planted train doc $id: winnow cut removed nothing")
    }
  }

  test("corpus_curate: per-doc cut mass matches decontaminate_strip, filters drop, redaction lands (r15)") {
    val out = SparkEntry.queries("corpus_curate")(spark, sfDir).collect()
    // since r16 corpus_curate runs over the URL-DECORATED corpus (the
    // blocklist gate must bite), so the strip reference must see the
    // SAME decorated text — the declared decontaminate_strip key runs
    // on the undecorated corpus and its cuts legitimately differ
    val dd = graft.operators.WebOps.decorated(SpanOps.planted(
      graft.sources.Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))))
    val strip = SpanOps.decontaminateStripOf(
      dd.filter(col("doc_id") % 10 =!= 7), dd.filter(col("doc_id") % 10 === 7)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_removed")).toMap
    // the filter stages must actually drop documents (quality/length/dup)
    assert(out.nonEmpty && out.length < strip.size,
      s"filter stages vacuous: kept ${out.length} of ${strip.size} train docs")
    // a doc's eval-leak spans depend only on (doc, eval) — not on which
    // other train docs survived the filters — so the composite's cut
    // mass must equal the standalone strip's on identical inputs, doc by doc
    out.foreach { r =>
      assert(strip(r.getLong(0)) == r.getAs[Long]("n_removed"),
        s"doc ${r.getLong(0)}: curate cut ${r.getAs[Long]("n_removed")}, " +
          s"standalone strip cut ${strip(r.getLong(0))}")
    }
    assert(out.exists(_.getAs[Long]("n_removed") > 0), "strip stage vacuous: no kept doc was cut")
    // the planted PII is redacted in the final payload
    val planted3 = out.filter(_.getLong(0) % 3 == 0)
    assert(planted3.nonEmpty)
    planted3.foreach { r =>
      assert(r.getAs[Long]("n_email") >= 1L
        && r.getAs[String]("final_text").contains("<EMAIL>")
        && !r.getAs[String]("final_text").contains("@example.com"),
        s"doc ${r.getLong(0)}: planted email not redacted: ${r.getAs[String]("final_text").takeRight(80)}")
    }
  }

  test("decontaminate_report aggregates the span relation exactly, per implicated eval doc") {
    val spans = SparkEntry.queries("decontaminate_spans")(spark, sfDir).collect()
    val report = SparkEntry.queries("decontaminate_report")(spark, sfDir).collect()
    val want = spans.groupBy(_.getAs[Long]("first_eval")).view.mapValues { rs =>
      (rs.map(_.getLong(0)).distinct.length.toLong, rs.length.toLong,
        rs.map(_.getAs[Long]("span_len")).sum, rs.map(_.getAs[Long]("span_len")).max)
    }.toMap
    assert(report.length == want.size && report.nonEmpty)
    report.foreach { r =>
      val k = r.getAs[Long]("eval_doc")
      assert((r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("leaked_chars"), r.getAs[Long]("max_span")) == want(k),
        s"eval doc $k: report disagrees with the span relation")
    }
  }

  test("winnowed cross-set spans: sound vs exact cross spans, deterministic on the boiler, train-train invisible") {
    import spark.implicits._
    // fixture: cross-set run at the recall floor + a train-train-only run
    val floor = K + SpanOps.WinnowW - 1
    val run = (('A' to 'Z') ++ ('a' to 'r')).mkString
    val runTT = (('0' to '9') ++ ('A' to 'Z') ++ "#$%&+=@^".toSeq).mkString
    val train = Seq(
      1L -> (filler('a', 70) + run + filler('b', 40)),
      2L -> (filler('c', 55) + runTT + filler('d', 60)),
      3L -> (filler('e', 45) + runTT + filler('f', 80))).toDF("doc_id", "text")
    val eval = Seq(100L -> (filler('g', 30) + run + filler('h', 50))).toDF("doc_id", "text")
    val out = SpanOps.crossSpansWinnowOf(train, eval).collect()
    // only doc 1 may report (train-train runs invisible), span inside the
    // exact cross span [71, 71+44), eval coordinate inside [31, 31+44)
    assert(out.nonEmpty && out.forall(_.getLong(0) == 1L), s"got ${out.toSeq}")
    out.foreach { r =>
      assert(r.getAs[Long]("span_start") >= 71 && r.getAs[Long]("span_end") <= 71 + floor)
      assert(r.getAs[Long]("first_eval") == 100L)
      val p = r.getAs[Long]("first_eval_pos")
      assert(p >= 31 && p + K <= 31 + floor + 1, s"eval pos $p")
    }
    // corpus: every winnow cross span sits inside an exact cross span,
    // and every planted train doc's boiler (>= floor chars) is flagged
    val exact = SparkEntry.queries("decontaminate_spans")(spark, sfDir)
      .select(col("doc_id"), col("span_start").as("es"), col("span_end").as("ee"))
    val win = SparkEntry.queries("decontaminate_spans_winnow")(spark, sfDir)
    val uncontained = win.join(exact,
      win("doc_id") === exact("doc_id") &&
        win("span_start") >= col("es") && win("span_end") <= col("ee"),
      "left_anti")
    assert(uncontained.count() == 0, "winnow cross span outside every exact cross span")
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plantedTrain = docs.keySet.filter(id => id % 6 == 1 && id % 10 != 7)
    val flagged = win.collect().groupBy(_.getLong(0))
    plantedTrain.foreach { id =>
      assert(flagged.getOrElse(id, Array.empty)
        .exists(_.getAs[Long]("span_end") > docs(id) + 1),
        s"planted train doc $id boiler not flagged by the winnowed cross pass")
    }
  }

  test("winnow strip removes a subset of the exact cut's mass, and cuts every planted doc") {
    val d = SpanOps.planted(graft.sources.Tables(spark, sfDir, "documents"))
    val exact = SpanOps.stripSpansOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val win = SpanOps.stripSpansWinnowOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(win.length == exact.size)
    win.foreach { case (id, removed) =>
      // soundness: a subset of the exact spans can only remove less
      assert(removed <= exact(id),
        s"doc $id: winnow removed $removed > exact ${exact(id)} — unsound")
      // recall on the planted docs: the boiler hosts >= 1 selected gram
      // (pinned by the span test), so SOME cut must land; full coverage
      // is not promised — winnow fragments may leave boiler edges
      if (id % 6 == 1)
        assert(removed > 0, s"planted doc $id saw no winnow cut at all")
    }
  }

  test("WinnowSelect equals a brute-force per-window argmin and decodes by code point") {
    import graft.functions.WinnowSelect
    import spark.implicits._
    val w = SpanOps.WinnowW
    val rnd = new scala.util.Random(77)
    (1 to 20).foreach { iter =>
      val len = 1 + rnd.nextInt(300)
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString // small alphabet → hash ties happen
      val got = WinnowSelect.selectPositions(s, K, w).toSeq
      val n = s.length - K + 1
      // structural: ascending, distinct, in range, nonempty iff n >= 1
      assert(got == got.sorted && got.distinct == got, s"iter $iter: not ascending/distinct")
      if (n >= 1) {
        assert(got.nonEmpty && got.head >= 1 && got.last <= n, s"iter $iter: out of range")
        // the winnowing invariant: every full window contains a selection
        // (this is exactly what the K+w-1 recall guarantee rests on)
        if (n >= w) (1 to n - w + 1).foreach { st =>
          assert(got.exists(p => p >= st && p < st + w),
            s"iter $iter: window [$st, ${st + w}) has no selection — winnowing broken")
        }
        assert(got.size <= math.max(1, n - w + 1))
      } else assert(got.isEmpty)
      // determinism + content-purity: same string → same positions;
      // a shifted copy selects the same RELATIVE positions in the interior
      assert(WinnowSelect.selectPositions(s, K, w).toSeq == got)
    }
    // content-purity across copies: interior selections align modulo offset
    val core = (0 until 120).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
    val a = "XXXXX" + core + "YYYYY"
    val b = "Z" + core + "WWWWWWWWW"
    val pa = WinnowSelect.selectPositions(a, K, w).filter(p => p > 5 + w && p + K - 1 <= 5 + core.length - w)
    val pb = WinnowSelect.selectPositions(b, K, w).filter(p => p > 1 + w && p + K - 1 <= 1 + core.length - w)
    assert(pa.map(_ - 5).toSeq.intersect(pb.map(_ - 1).toSeq).nonEmpty,
      "copies of a shared run select no common relative gram — sync broken")
    // code-point decode: positions index Spark's substring unit even with
    // non-BMP chars (each emoji is ONE code point, TWO UTF-16 units)
    val emoji = new String(Character.toChars(0x1F600))
    val text = (emoji * 3) + ('a' to 'z').mkString + ('A' to 'Z').mkString + (emoji * 3)
    val d2 = Seq(1L -> (text + "pad-to-host-a-second-copy " + text)).toDF("doc_id", "text")
    val sites = SpanOps.winnowSites(d2).collect()
    assert(sites.nonEmpty)
    // every (pos, gram) row must satisfy gram == code-point substring at pos
    val full = text + "pad-to-host-a-second-copy " + text
    val cps = full.codePoints().toArray
    sites.foreach { r =>
      val pos = r.getLong(1).toInt
      val gh = r.getLong(2)
      val gram = new String(cps, pos - 1, K)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(gram)
      val expected = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      assert(expected == gh,
        s"pos $pos decodes to a different gram than the engine hashed")
    }
  }

  test("winnow recall floor is deterministic: every shared run of length >= K+w-1 is found") {
    import spark.implicits._
    val floor = K + SpanOps.WinnowW - 1 // 44 at current constants
    // aperiodic runs at exactly the floor and just above it, each planted
    // at two sites with disjoint unique filler — the Schleimer guarantee
    // says ALL of these must be detected at EVERY site, no probability
    val runA = (('A' to 'Z') ++ ('a' to 'r')).mkString // 44 distinct chars
    val runB = (('0' to '9') ++ ('A' to 'Z') ++ Seq('#', '$', '%', '&', '+', '=', '@', '^',
      '~', '!')).mkString // 46 distinct chars
    assert(runA.length == floor && runA.distinct.length == floor)
    assert(runB.length == floor + 2 && runB.distinct.length == floor + 2)
    val d = Seq(
      1L -> (filler('a', 61) + runA + filler('b', 57)),
      2L -> (filler('c', 38) + runA + filler('d', 90)),
      3L -> (filler('e', 83) + runB + filler('f', 41)),
      4L -> (filler('g', 29) + runB + filler('h', 66))).toDF("doc_id", "text")
    val spans = SpanOps.dupSpansWinnowOf(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r => (r.getLong(1), r.getLong(2)))).toMap
    val expect = Map(1L -> (62L, 62L + runA.length), 2L -> (39L, 39L + runA.length),
      3L -> (84L, 84L + runB.length), 4L -> (30L, 30L + runB.length))
    expect.foreach { case (id, (rs, re)) =>
      assert(spans.getOrElse(id, Array.empty[(Long, Long)])
        .exists { case (s, e) => s >= rs && e <= re && e > s },
        s"doc $id: guaranteed run [$rs, $re) not detected — winnow recall floor broken")
    }
  }

  test("salted mark join is row-identical to the unsalted plan, incl. a mega-dup gram") {
    import spark.implicits._
    // planted corpus: salted (default MarkSaltN) vs unsalted (saltN = 1)
    val docs = SpanOps.planted(graft.sources.Tables(spark, sfDir, "documents"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows(SpanOps.dupSpansWinnowOf(docs)) == rows(SpanOps.dupSpansWinnowOf(docs, saltN = 1)),
      "salting changed the winnow span relation on the planted corpus")
    // mega-duplicated gram: one run shared by 2000 docs — the 100 TB
    // universal-boilerplate shape the salt exists for; identity must hold
    // and every site must be detected (run length >= K+w-1)
    val boiler = (('A' to 'Z') ++ ('a' to 'r')).mkString
    val mega = (1L to 2000L).map(id =>
      id -> (filler(('a' + (id % 26)).toChar, 40 + (id % 37).toInt) + boiler)).toDF("doc_id", "text")
    val salted = rows(SpanOps.dupSpansWinnowOf(mega))
    assert(salted == rows(SpanOps.dupSpansWinnowOf(mega, saltN = 1)),
      "salting changed the winnow span relation under a mega-dup gram")
    assert(salted.map(_._1).distinct.size == 2000,
      s"mega-dup run must be detected at every one of 2000 sites, got ${salted.map(_._1).distinct.size}")
  }

  test("winnow sibling is sound (every winnow span inside an exact span) and hits the boiler") {
    val docs = SpanOps.planted(graft.sources.Tables(spark, sfDir, "documents"))
    val exact = SpanOps.dupSpansOf(docs)
      .select(col("doc_id"), col("span_start").as("es"), col("span_end").as("ee"))
    val win = SpanOps.dupSpansWinnowOf(docs)
    // soundness: LEFT ANTI of winnow spans vs containing exact spans is empty
    val uncontained = win.join(exact,
      win("doc_id") === exact("doc_id") &&
        win("span_start") >= col("es") && win("span_end") <= col("ee"),
      "left_anti")
    assert(uncontained.count() == 0, "winnow span not contained in any exact span")
    // recall on the planted boiler: every planted doc has a winnow span in the tail
    val lens = graft.sources.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 6 === 1)
      .select(col("doc_id"), length(col("text")).cast("long").as("origLen"))
    val hit = win.join(lens, "doc_id")
      .filter(col("span_end") > col("origLen") + 1)
      .select("doc_id").distinct().count()
    assert(hit == lens.count(), s"winnow missed the boiler in ${lens.count() - hit} docs")
  }

  test("cross-span kernel ≡ join form: full planted corpus (r21 CrossSpanProbe pin)") {
    val d = SpanOps.planted(graft.sources.Tables(spark, sfDir, "documents"))
    val train = d.filter(col("doc_id") % 10 =!= 7)
    val eval = d.filter(col("doc_id") % 10 === 7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val kernel = rows(SpanOps.crossSpansOf(train, eval))
    val join = rows(SpanOps.crossSpansJoinFormOf(train, eval))
    assert(kernel == join,
      s"kernel/join cross-span relations differ: only-kernel=${(kernel -- join).take(3)} " +
        s"only-join=${(join -- kernel).take(3)}")
    assert(kernel.nonEmpty, "pin is vacuous: no cross spans on the planted corpus")
  }

  test("cross-span kernel ≡ join form: randomized multi-script fixtures (r21)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    // alphabets spanning 1-4 byte UTF-8 (incl. supplementary-plane emoji)
    val scripts = Seq("abcdef ", "äöüßéñ ", "日本語中文 ", "😀😁😂🤖🎉 ")
    def doc(len: Int): String = {
      val a = scripts(rnd.nextInt(scripts.length))
      val nCp = a.codePointCount(0, a.length)
      (0 until len).map(_ => a.codePointAt(
        a.offsetByCodePoints(0, rnd.nextInt(nCp)))).flatMap(
        Character.toChars(_).toSeq).mkString
    }
    // plant shared runs so the relation is non-empty across scripts
    val shared = scripts.map(a => doc(K + 20))
    val train = (1L to 40L).map(i =>
      i -> (doc(rnd.nextInt(120)) + shared((i % 4).toInt) + doc(rnd.nextInt(80)))).toDF("doc_id", "text")
    val eval = (100L to 108L).map(i =>
      i -> (doc(rnd.nextInt(50)) + shared((i % 4).toInt) + doc(rnd.nextInt(60)))).toDF("doc_id", "text")
    val kernel = SpanOps.crossSpansOf(train, eval).collect().map(_.toSeq).toSet
    val join = SpanOps.crossSpansJoinFormOf(train, eval).collect().map(_.toSeq).toSet
    assert(kernel == join,
      s"kernel/join differ on multi-script input: only-kernel=${(kernel -- join).take(3)} " +
        s"only-join=${(join -- kernel).take(3)}")
    assert(kernel.nonEmpty, "pin is vacuous: planted shared runs not detected")
    // the in-row strip (probe → fold, no join) must cut exactly what the
    // aggregate-and-join-back form cuts — same fixture, full row identity
    val sIn = SpanOps.decontaminateStripOf(train, eval).collect().map(_.toSeq).toSet
    val sJn = SpanOps.decontaminateStripJoinFormOf(train, eval).collect().map(_.toSeq).toSet
    assert(sIn == sJn,
      s"in-row/join strips differ on multi-script input: only-inrow=${(sIn -- sJn).take(3)} " +
        s"only-join=${(sJn -- sIn).take(3)}")
  }

  test("in-row strip ≡ aggregate-and-join-back strip: full planted corpus (r21)") {
    val d = SpanOps.planted(graft.sources.Tables(spark, sfDir, "documents"))
    val train = d.filter(col("doc_id") % 10 =!= 7)
    val eval = d.filter(col("doc_id") % 10 === 7)
    val inRow = SpanOps.decontaminateStripOf(train, eval).collect().map(_.toSeq).toSet
    val joinF = SpanOps.decontaminateStripJoinFormOf(train, eval).collect().map(_.toSeq).toSet
    assert(inRow == joinF,
      s"strips differ: only-inrow=${(inRow -- joinF).take(3)} only-join=${(joinF -- inRow).take(3)}")
    assert(inRow.exists(r => r(2).asInstanceOf[Long] > 0L),
      "pin is vacuous: nothing was stripped on the planted corpus")
  }
}

package graft

import graft.operators.HygieneOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** charlm_quality (CCNet-style model-based quality score) vs an
  * independent driver-side reference implementation of the same
  * add-one-smoothed char-bigram model, plus the ordering property the
  * score exists for: predictable text scores fewer bits than junk.
  */
class CharLmSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference model: plain Scala maps over the collected corpus. Mirrors
    * the engine's decimal(18,6) per-term rounding (Num.dsum) so the two
    * disagree only if the ENGINE's math is wrong, not on summation order.
    */
  private def referenceBits(corpus: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val cBg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cA = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val chars = scala.collection.mutable.Set.empty[Char]
    corpus.foreach { case (_, t) =>
      t.foreach(chars += _)
      t.sliding(2).filter(_.length == 2).foreach { bg =>
        cBg(bg) += 1; cA(bg.take(1)) += 1
      }
    }
    val v = chars.size
    corpus.filter(_._2.length >= 2).map { case (id, t) =>
      val terms = t.sliding(2).filter(_.length == 2).map { bg =>
        val p = (cBg(bg) + 1).toDouble / (cA(bg.take(1)) + v)
        BigDecimal(StrictMath.log(p) / StrictMath.log(2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      val n = terms.size
      id -> (n.toLong, -(terms.sum.toDouble) / n)
    }.toMap
  }

  test("engine bits match the independent reference on the real corpus") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val ref = referenceBits(docs)
    val got = SparkEntry.queries("charlm_quality")(spark, sfDir).collect()
    assert(got.length == ref.size, s"rows ${got.length} vs reference ${ref.size}")
    got.foreach { r =>
      val (id, n, bits) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (rn, rbits) = ref(id)
      assert(n == rn, s"doc $id n_bigrams $n vs $rn")
      assert(math.abs(bits - rbits) < 1e-7, s"doc $id bits $bits vs $rbits")
    }
  }

  test("predictable text scores fewer bits than character junk") {
    import spark.implicits._
    val natural = Seq.fill(20)("the quick brown fox jumps over the lazy dog and runs on").mkString(" ")
    val junk = (0 until 1000).map(i => ('a' + (i * 31 + i * i * 17) % 26).toChar).mkString
    val d = ((1L to 8L).map(i => i -> natural) :+ (9L -> junk)).toDF("doc_id", "text")
    val bits = HygieneOps.charlmScoreOf(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bits(1L) < bits(9L),
      s"natural ${bits(1L)} must beat junk ${bits(9L)}")
  }

  test("a foreign corpus with unseen bigrams scores finitely via smoothing, no dropped docs") {
    import spark.implicits._
    // chars far outside the training charset: unseen bigrams AND contexts
    val foreign = Seq(100L -> "üßéüßé", 101L -> "normal words here")
      .toDF("doc_id", "text")
    val (c, x, v) = HygieneOps.charlmModelOf(
      graft.sources.Tables(spark, sfDir, "documents").select("doc_id", "text"))
    val out = HygieneOps.charlmScoreAgainst(foreign, c, x, v)
      .orderBy("doc_id").collect()
    assert(out.length == 2, "unseen bigrams must not drop documents")
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    // every bigram of doc 100 has unseen context AND unseen pair, so each
    // term is exactly -log2((0+1)/(0+V)) = log2(V): the smoothing floor
    val vv = v.collect()(0).getLong(0)
    val expected = BigDecimal(StrictMath.log(1.0 / vv) / StrictMath.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0).getDouble(2) - (-expected)) < 1e-9,
      s"unseen-everything doc must score exactly log2(V): ${out(0).getDouble(2)} vs ${-expected}")
  }

  test("quality_buckets: bounds hold by construction, tertiles roughly balanced") {
    val out = SparkEntry.queries("quality_buckets")(spark, sfDir).collect()
    assert(out.length == 500)
    val byBucket = out.groupBy(_.getString(3)).view.mapValues(_.map(_.getDouble(2))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min,
      "head must score at most middle")
    assert(byBucket("middle").max <= byBucket("tail").min,
      "middle must score at most tail")
    byBucket.foreach { case (b, xs) =>
      assert(xs.length > 100 && xs.length < 235, s"bucket $b size ${xs.length} not ~tertile")
    }
  }

  test("narrow literal-map scoring form agrees bit-for-bit with the join form") {
    val d = graft.sources.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val (c, x, v) = HygieneOps.charlmModelOf(d)
    val (mBg, mA, vv) = HygieneOps.collectCharLmModel(c, x, v)
    val narrow = HygieneOps.withCharLmScore(d, mBg, mA, vv)
      .select("doc_id", "n_bigrams", "bits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val joined = HygieneOps.charlmScoreAgainst(d, c, x, v).collect()
    assert(joined.nonEmpty && narrow.size == joined.length)
    joined.foreach { r =>
      assert(narrow(r.getLong(0)) == (r.getLong(1), r.getDouble(2)),
        s"doc ${r.getLong(0)}: narrow ${narrow(r.getLong(0))} vs join " +
          s"(${r.getLong(1)}, ${r.getDouble(2)})")
    }
  }

  test("one-scan driver trainer ≡ the collected charlmModelOf frames (bigram, ctx, vocab)") {
    import spark.implicits._
    // corpus with the edge the vocab derivation must keep: a single-char
    // doc whose char appears in NO bigram, plus a supplementary-plane
    // code point (surrogate-pair first-char grouping)
    val base = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
      .unionByName(Seq((900001L, "Ø"), (900002L, "😀ab"), (900003L, ""))
        .toDF("doc_id", "text"))
    val (c, x, v) = HygieneOps.charlmModelOf(base)
    val slow = HygieneOps.collectCharLmModel(c, x, v)
    val fast = HygieneOps.trainCharLmDriver(base)
    assert(fast.contains(slow),
      s"driver trainer diverged: vocab ${fast.map(_._3)} vs ${slow._3}; " +
        s"ctx diff ${fast.map(_._2.toSet.diff(slow._2.toSet))}")
    // and over-cap reports None (the join-form fallback signal)
    val chars = (0 until 105).map(i => (0x4E00 + i).toChar)
    val big = chars.zipWithIndex.map { case (ch, i) =>
      (i.toLong, chars.map(cj => s"$ch$cj").mkString)
    }.toDF("doc_id", "text")
    assert(HygieneOps.trainCharLmDriver(big).isEmpty)
    // ...as does blowing the aggregate's own domain bound (buffer
    // overflow path: >65536 distinct bigrams → counters stop admitting
    // keys and the flag, not a wrong model, comes back)
    val chars300 = (0 until 300).map(i => (0x4E00 + i).toChar)
    val huge = chars300.zipWithIndex.map { case (ch, i) =>
      (i.toLong, chars300.map(cj => s"$ch$cj").mkString)
    }.toDF("doc_id", "text")
    assert(HygieneOps.trainCharLmDriver(huge).isEmpty)
  }

  test("a model above the literal cap scores through the join path; the literal collect refuses") {
    import spark.implicits._
    // 105 distinct CJK chars → >10k distinct bigrams: a stand-in for a
    // word-level / KenLM-scale table, far over CharLmLiteralMax
    val chars = (0 until 105).map(i => (0x4E00 + i).toChar)
    val corpus = chars.zipWithIndex.map { case (c, i) =>
      (i.toLong, chars.map(cj => s"$c$cj").mkString)
    }.toDF("doc_id", "text")
    val (c, x, v) = HygieneOps.charlmModelOf(corpus)
    assert(c.count() > HygieneOps.CharLmLiteralMax,
      "fixture must exceed the literal cap")
    // the DEFAULT (join) path scores it fine...
    val scored = HygieneOps.charlmScoreAgainst(
      Seq(1000L -> "some ordinary text to score", 1001L -> chars.take(40).mkString)
        .toDF("doc_id", "text"), c, x, v).orderBy("doc_id").collect()
    assert(scored.length == 2 &&
      scored.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    // ...and the literal-map collect fails LOUDLY instead of silently
    // materializing the model into every plan
    val e = intercept[IllegalArgumentException] {
      HygieneOps.collectCharLmModel(c, x, v)
    }
    assert(e.getMessage.contains("CharLmLiteralMax") &&
      e.getMessage.contains("charlmScoreAgainst"),
      s"guard must name the cap and the join-path escape: ${e.getMessage}")
    // r17: an over-cap-but-exact one-scan collect is NOT thrown away —
    // the trainer surfaces the rows and charlmScoreOf builds the
    // join-form model frames from them driver-side, scoring identically
    // to the corpus-rescanning charlmModelOf frames
    HygieneOps.trainCharLm(corpus) match {
      case HygieneOps.CharLmTrain.OverCap(rows, vv) =>
        assert(rows.size > HygieneOps.CharLmLiteralMax && vv == 105L,
          s"over-cap collect wrong: ${rows.size} rows, v=$vv")
      case o => fail(s"expected OverCap from the 105-char fixture, got $o")
    }
    val viaOverCap = HygieneOps.charlmScoreOf(corpus).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaRescan = HygieneOps.charlmScoreAgainst(corpus, c, x, v)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaOverCap == viaRescan,
      "over-cap frames must score bit-identically to the rescanned model")
  }

  test("score is invariant to corpus partitioning (decimal-sum discipline)") {
    val one = SparkEntry.queries("charlm_quality")(spark, sfDir).collect()
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").repartition(13)
    val re = HygieneOps.charlmScoreOf(docs).orderBy("doc_id").collect()
    assert(one.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      re.map(r => (r.getLong(0), r.getDouble(2))).toSeq,
      "bits must be bit-identical under repartitioning")
  }
}

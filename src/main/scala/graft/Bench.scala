package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with warm per-query seconds.
  *
  * Burst-robust methodology (round 13): host CPU bursts have twice
  * fabricated multi-× "regressions" in round records (r10, r12) because
  * reps ran as N consecutive runs per key — a burst sweeping the host for
  * a minute polluted ALL reps of whichever alphabetically-contiguous keys
  * it overlapped, so even the median lied. Three countermeasures:
  *
  *  1. Reps are INTERLEAVED round-robin across keys (rep 1 of every key,
  *     then rep 2, ...): a burst now pollutes at most one rep of many
  *     keys instead of all reps of a few, and the per-key median (still
  *     the reported number, matching BASELINE.md §2) recovers it.
  *  2. Each rep is wall-clock TIMESTAMPED (seconds from bench start) in
  *     BENCH_DETAIL.json — a burst shows up as a time-localized band of
  *     slow reps across unrelated keys, adjudicable after the fact.
  *  3. Three cheap SENTINEL keys are re-timed before, between, and after
  *     the rep passes; their drift (max/min of checkpoint medians) is a
  *     host-load signal recorded in the primary line. Drift > 1.5×
  *     flags the record as burst-suspect — the record defends itself.
  *
  * Failures are never swallowed: a query that throws (warmup or timed
  * run) is recorded in the `errors` map with a null timing, and the
  * process exits nonzero — a regression can only make the bench fail
  * loudly, not "improve" it.
  */
object Bench {

  /** Timed repetitions per query (median reported). 5 because the host
    * occasionally suffers multi-second external CPU bursts; with
    * interleaved reps a burst pollutes at most 1-2 of the 5, and the
    * median still lands on a clean run.
    */
  val Reps = 5

  /** Cheap, plan-stable keys re-timed at start/middle/end as a host-load
    * probe. Chosen scan-bound and sub-200ms so the probe costs ~1 s total
    * and reflects machine state, not engine state.
    */
  val SentinelKeys: Seq[String] = Seq("filter_project", "fmt_size", "strip_ansi")

  /** Checkpoint drift above this ratio marks the record burst-suspect. */
  val SentinelDriftFlag = 1.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val benchStart = System.nanoTime()
    def now(): Double = (System.nanoTime() - benchStart) / 1e9

    // every persisted artifact a declared key builds on first use lives
    // under the graft_ prefix (graft_*_index_* probes + sidecars,
    // graft_curate_* model/sig tables); a pre-existing one means that
    // key's cold_sec is a WARM re-run wall, not the build wall — stamped
    // into BENCH_DETAIL so cold_over_median ~1.0 on a re-run warehouse
    // cannot masquerade as "no build-cost regression" (r18 ADVICE)
    val preexistingArtifacts = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_")).sorted.toSeq

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def guarded(name: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable if !errors.contains(name) =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }

    // warmup pass (codegen/caches) — also the error triage: a key that
    // throws here is excluded from the timed passes entirely. Its wall
    // is RECORDED per key (cold_sec in BENCH_DETAIL): for artifact keys
    // (corpus_curate_full, the *_indexed probes) the first-ever run pays
    // the build (LM/index training) that the timed reps then reuse, so
    // cold-vs-median is the build-vs-probe split — regression triage
    // must not chase training cost as probe cost (r17 verdict task 5).
    val coldSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    names.foreach(n => guarded(n) { coldSec(n) = run(n) })
    val timedKeys = names.filterNot(errors.contains)

    // per-key rep times and their bench-relative timestamps, in rep order
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    val stamps = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)

    // sentinel probe: median of 3 quick runs per sentinel key
    def probeSentinels(): Map[String, Double] =
      SentinelKeys.filter(timedKeys.contains).map { n =>
        val ts = Seq.fill(3)(run(n)).sorted
        n -> ts(1)
      }.toMap

    val sentStart = probeSentinels()
    var sentMid = Map.empty[String, Double]
    for (rep <- 1 to Reps) {
      timedKeys.foreach { n =>
        if (!errors.contains(n)) guarded(n) {
          val at = now()
          val t = run(n)
          times(n) :+= t
          stamps(n) :+= at
        }
      }
      if (rep == (Reps + 1) / 2) sentMid = probeSentinels()
    }
    val sentEnd = probeSentinels()

    final case class Res(name: String, median: Double, min: Double, max: Double)
    val results = timedKeys.filterNot(errors.contains).flatMap { n =>
      val ts = times(n).sorted
      if (ts.isEmpty) None
      else Some(Res(n, ts(ts.size / 2), ts.head, ts.last))
    }

    // drift per sentinel = worst SLOWDOWN of a later checkpoint vs the
    // fastest earlier one (obs(i) / min(obs(0..i-1))). Direction-aware on
    // purpose: JIT/page-cache ramp makes checkpoints monotonically FASTER
    // on a clean run (measured 1.5× start→end at sf0.01), which a
    // symmetric max/min would misflag; external host load makes a later
    // checkpoint SLOWER, which is the only signal worth flagging. A
    // burst confined to the very start hurts only rep-1 times, which the
    // median discards — and still shows in rep_ts bands for adjudication.
    val sentinelDrift = SentinelKeys.flatMap { n =>
      val obs = Seq(sentStart.get(n), sentMid.get(n), sentEnd.get(n)).flatten.filter(_ > 0)
      if (obs.size < 2) None
      else Some((1 until obs.size).map(i => obs(i) / obs.take(i).min).max)
    }
    val maxDrift = if (sentinelDrift.isEmpty) 1.0 else math.max(1.0, sentinelDrift.max)
    val burstSuspect = maxDrift > SentinelDriftFlag

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      } + "\""
    // the driver captures only the TAIL of the build output, so the primary
    // line must stay small: 4-decimal medians, no per-query spread (r03's
    // full-precision line overflowed the capture window and parsed as null).
    // Full-precision medians + min/max spread + rep timestamps go to
    // BENCH_DETAIL.json. Locale.ROOT: a comma-decimal default locale would
    // otherwise format "1,2345" and break the JSON.
    def f4(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    def fmap(m: Map[String, Double]): String =
      SentinelKeys.flatMap(n => m.get(n).map(v => jstr(n) + ":" + f4(v))).mkString("{", ",", "}")
    val qs = results.map(r => jstr(r.name) + ":" + f4(r.median)).mkString("{", ",", "}")
    val qsFull = results.map(r => jstr(r.name) + ":" + r.median).mkString("{", ",", "}")
    val spread = results.map(r => jstr(r.name) + s""":[${r.min},${r.max}]""").mkString("{", ",", "}")
    val repsSec = results.map(r =>
      jstr(r.name) + ":" + times(r.name).map(f4).mkString("[", ",", "]")).mkString("{", ",", "}")
    val repTs = results.map(r =>
      jstr(r.name) + ":" + stamps(r.name).map(t => "%.2f".formatLocal(java.util.Locale.ROOT, t))
        .mkString("[", ",", "]")).mkString("{", ",", "}")
    val errs = errors.map { case (n, e) => jstr(n) + ":" + jstr(e) }.mkString("{", ",", "}")
    val sentinel =
      s"""{"keys":${SentinelKeys.map(jstr).mkString("[", ",", "]")},"start":${fmap(sentStart)},""" +
        s""""mid":${fmap(sentMid)},"end":${fmap(sentEnd)},"max_drift":${f4(maxDrift)},""" +
        s""""burst_suspect":$burstSuspect}"""
    val total = results.map(_.median).sum
    // host-elevation control (r19 verdict task 3): the r19 burst story
    // needed a by-hand A/B (rebuild the old commit, re-run, compare) to
    // prove an 80→93 s move was the HOST, not the code. Stamp that
    // control into the record itself: THIS run's sentinel medians and
    // total vs the committed BENCH_PRIMARY.json at HEAD. Sentinels are
    // code-stable scan-bound probes, so when src/ is clean against HEAD
    // a sentinel_ratio ≈ total_ratio says the whole delta is
    // environmental; sentinel_ratio ≪ total_ratio says chase the code.
    val elevationControl: Option[String] = try {
      import scala.sys.process._
      val devNull = ProcessLogger(_ => ())
      val commit = Seq("git", "rev-parse", "--short", "HEAD").!!(devNull).trim
      val committed = Seq("git", "show", "HEAD:BENCH_PRIMARY.json").!!(devNull)
      val srcDirty = Seq("git", "status", "--porcelain", "--", "src/main").!!(devNull).trim.nonEmpty
      def keyVal(json: String, key: String): Option[Double] =
        ("\"" + java.util.regex.Pattern.quote(key) + "\":([0-9.]+)").r
          .findFirstMatchIn(json).map(_.group(1).toDouble)
      val prevSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(committed).map(_.group(1))
      val prevTotal = keyVal(committed, "value")
      val sentRatios = SentinelKeys.sorted.flatMap { k =>
        for {
          prev <- keyVal(committed, k) if prev > 0
          cur <- results.find(_.name == k).map(_.median)
        } yield cur / prev
      }
      for {
        // only comparable against a committed record at the SAME sf
        pt <- prevTotal if pt > 0 && sentRatios.nonEmpty && prevSf.contains(sfDir)
      } yield {
        val sentMed = sentRatios.sorted.apply(sentRatios.size / 2)
        s"""{"commit":${jstr(commit)},"src_dirty_vs_commit":$srcDirty,""" +
          s""""committed_total":${f4(pt)},"rerun_total":${f4(total)},""" +
          s""""total_ratio":${f4(total / pt)},"sentinel_ratio_median":${f4(sentMed)},""" +
          s""""read":"same-host A/B vs the committed record: sentinels are """ +
          """code-stable, so (src clean) sentinel_ratio ~ total_ratio means the """ +
          """delta vs the committed number is host-environmental, not a code """ +
          """regression; sentinel_ratio well under total_ratio means chase the code"}"""
      }
    } catch { case _: Throwable => None }
    val elevationJson = elevationControl.getOrElse("null")
    // primary line carries the numbers only (it must stay small — the
    // driver tail-scrapes it); the self-explaining "read" sentence
    // lives in BENCH_DETAIL
    val elevationJsonCompact = elevationControl
      .map(_.replaceAll(""","read":"[^"]*"""", "")).getOrElse("null")
    // cold (first-ever, artifact-building) wall vs the warm median: the
    // build-vs-probe split for artifact keys; ~1.0 ratio everywhere else
    val cold = results.flatMap(r => coldSec.get(r.name).map(c =>
      jstr(r.name) + ":" + f4(c))).mkString("{", ",", "}")
    val buildPremium = results.flatMap(r => coldSec.get(r.name).collect {
      case c if r.median > 0 => jstr(r.name) + ":" + f4(c / r.median)
    }).mkString("{", ",", "}")
    val detail =
      s"""{"reps":$Reps,"interleaved":true,"total":$total,"queries":$qsFull,"spread":$spread,""" +
        s""""reps_sec":$repsSec,"rep_ts":$repTs,"cold_sec":$cold,""" +
        s""""cold_over_median":$buildPremium,""" +
        s""""preexisting_artifact_tables":${preexistingArtifacts.map(jstr).mkString("[", ",", "]")},""" +
        s""""cold_read":"cold_sec is the warmup (first-ever) wall per key; for artifact keys (corpus_curate_full, *_indexed) it includes LM/index training the timed reps reuse — compare cold_over_median to split build from probe. VALID AS A BUILD WALL ONLY when preexisting_artifact_tables is empty: a bench re-run against a warehouse already holding graft_* artifacts records a warm wall as cold_sec",""" +
        s""""sentinel":$sentinel,"host_elevation_control":$elevationJson,""" +
        s""""errors":$errs,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val primary =
      s"""{"metric":"total","value":${f4(total)},"unit":"sec","queries":$qs,"reps":$Reps,""" +
        s""""interleaved":true,"sentinel_drift":${f4(maxDrift)},"burst_suspect":$burstSuspect,""" +
        s""""host_elevation_control":$elevationJsonCompact,""" +
        s""""errors":$errs,"sf":"$sfDir"}"""
    // the driver tail-scrapes stdout for this line and has parsed it as
    // null for five rounds running (capture-window truncation) — persist
    // the identical object to a flat file so the totals are always
    // machine-readable regardless of log capture
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_PRIMARY.json"),
      (primary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(primary)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

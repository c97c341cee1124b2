package graft

import graft.operators.WebOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL/domain hygiene semantics: extraction shape, per-domain stats
  * consistency, and the blocklist gate's keep/drop contract.
  */
class WebSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extraction finds exactly the planted URLs with correct host/domain split") {
    import spark.implicits._
    val d = Seq(
      1L -> "plain text with no links at all",
      2L -> "before https://a.b.example.org/x/y after http://cdn.mirror.io/z end",
      3L -> "trailing https://one.two.net"
    ).toDF("doc_id", "text")
    val rows = WebOps.urlsOf(d).orderBy("doc_id", "url").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq(
        (2L, "http://cdn.mirror.io/z", "cdn.mirror.io", "mirror.io"),
        (2L, "https://a.b.example.org/x/y", "a.b.example.org", "example.org"),
        (3L, "https://one.two.net", "one.two.net", "two.net")))
  }

  test("blocklist gate: any blocked URL drops the doc; URL-free docs keep") {
    import spark.implicits._
    val d = Seq(
      1L -> "no links here",
      2L -> "fine https://ok.example.org/a",
      3L -> "bad https://x.badsite.com/p and fine https://ok.example.org/b",
      4L -> "bare https://badsite.com"
    ).toDF("doc_id", "text")
    val out = WebOps.domainFilterOf(spark, d).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == (0L, 0L, true), s"url-free doc: ${out(1L)}")
    assert(out(2L) == (1L, 0L, true))
    assert(out(3L) == (2L, 1L, false), "one bad link must drop a multi-url doc")
    assert(out(4L) == (1L, 1L, false), "apex-domain link must match the blocklist")
  }

  test("narrow gate form equals the broadcast-join filter row for row") {
    import spark.implicits._
    val d = Seq(
      1L -> "no links in this document at all",
      2L -> "one good https://ok.example.org/a and one bad https://x.badsite.com/p",
      3L -> "tracker http://a.tracker.net plus https://fine.example.org",
      4L -> "bare apex https://badsite.com end"
    ).toDF("doc_id", "text")
    val joinForm = WebOps.domainFilterOf(spark, d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val narrowForm = WebOps.withDomainGate(d)
      .select(col("doc_id"), col("n_urls"), col("n_blocked"),
        (col("n_blocked") === 0).as("keep"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(joinForm.toSeq == narrowForm.toSeq,
      s"forms disagree: ${joinForm.toSeq} vs ${narrowForm.toSeq}")
  }

  test("domain_cap: lowest-N ids keep per domain, url-free docs unconstrained, salt-invariant") {
    import spark.implicits._
    // 60 docs on one domain + 3 on another + 2 url-free
    val d = ((1L to 60L).map(i => i -> s"doc $i https://h$i.big.org/p") ++
      Seq(100L -> "a https://x.small.net/q", 101L -> "b https://y.small.net/q",
        102L -> "c https://z.small.net/q", 200L -> "no urls here", 201L -> "none either"))
      .toDF("doc_id", "text")
    val out = WebOps.domainCapOf(d).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)), r.getBoolean(3))).toMap
    val bigKept = (1L to 60L).filter(id => out(id)._3)
    assert(bigKept == (1L to WebOps.DomainCapN.toLong), s"big.org must keep ids 1..25: $bigKept")
    assert((100L to 102L).forall(out(_)._3), "under-cap domain keeps all")
    assert(Seq(200L, 201L).forall(id => out(id) == ((None, None, true))),
      "url-free docs unconstrained")
    // the salted two-phase result must equal a plain single-phase rank
    val ranks = out.collect { case (id, (Some("big.org"), Some(rk), true)) => id -> rk }
    assert(ranks.toSeq.sortBy(_._1).map(_._2) == (1L to 25L),
      s"ranks must be the dense 1..N by doc_id: $ranks")
  }

  test("domain_heavy_hitters: eviction genuinely fires and the recount equals the exact head (r16 task 7)") {
    import graft.functions.MisraGries.misra_gries
    import graft.operators.{Psl, WebOps}
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val doms = WebOps.urlsOf(WebOps.decorated(docs))
      .filter(col("domain").isNotNull)
    // the fixture the key's honesty rests on: more distinct domains than
    // sketch slots, so Misra-Gries eviction actually engages
    val k = WebOps.DomainHeavyK
    val distinctDomains = doms.select("domain").distinct().count()
    assert(distinctDomains > k,
      s"fixture must overflow the $k-slot sketch, got $distinctDomains domains")
    // pass-1 candidates: ≤ k, and a SUPERSET of the true heavy set
    val cands = doms.agg(misra_gries(col("domain"), k).as("c"))
      .selectExpr("transform(c, s -> s.item) AS items")
      .head().getSeq[String](0).toSet
    assert(cands.size <= k)
    assert(Set("mirror.io", "badsite.com").subsetOf(cands),
      s"true heavy domains must survive the sketch: $cands")
    // end-to-end: exactly the ≥ 1/(k+1)-share head, ranked
    val got = SparkEntry.queries("domain_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "mirror.io", 2L -> "badsite.com"),
      s"heavy head wrong: $got")
    // content domains sit ~11% < 1/6 — present in the corpus, not heavy
    assert(doms.filter(col("domain").startsWith("example")).count() > 0)
  }

  test("raw-text hygiene: trailing sentence punctuation never rides into the host") {
    import spark.implicits._
    // the advice-r13 evasion scenario: a blocked domain followed by a
    // sentence period must still resolve and still drop the doc
    val d = Seq(
      1L -> "see https://x.badsite.com. Next sentence.",
      2L -> "list https://ok.example.org, https://cdn.mirror.io; done",
      3L -> "dots https://a.b.example.org... trailing"
    ).toDF("doc_id", "text")
    val rows = WebOps.urlsOf(d).orderBy("doc_id", "url").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, "x.badsite.com", "badsite.com"),
      (2L, "cdn.mirror.io", "mirror.io"),
      (2L, "ok.example.org", "example.org"),
      (3L, "a.b.example.org", "example.org")), s"got ${rows.toSeq}")
    val verdict = WebOps.domainFilterOf(spark, d).orderBy("doc_id").collect()
    assert(!verdict(0).getBoolean(3), "punctuation-trailed blocked domain must still drop")
    // the narrow streaming gate agrees
    val narrow = WebOps.withDomainGate(d).orderBy("doc_id").collect()
    assert(narrow(0).getAs[Long]("n_blocked") == 1L)
  }

  test("domain_cap: a failed domain extraction is unconstrained, not a '' pseudo-domain") {
    import spark.implicits._
    // single-label hosts extract no registrable domain; such docs must
    // behave like URL-free docs (keep, null domain), not pool into one
    // capped "" class
    val d = ((1L to 30L).map(i => i -> s"doc $i http://localhost/p$i") ++
      Seq(100L -> "real https://a.example.org/x", 200L -> "no urls")).toDF("doc_id", "text")
    val out = WebOps.domainCapOf(d).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getBoolean(3))).toMap
    (1L to 30L).foreach { id =>
      assert(out(id) == ((None, true)), s"doc $id: ${out(id)} — '' must map to null/keep")
    }
    assert(out(100L) == ((Some("example.org"), true)) && out(200L) == ((None, true)))
  }

  test("PSL registrable domains: 2-label suffixes, wildcard, exception, implicit *") {
    import graft.operators.Psl
    import spark.implicits._
    val cases = Seq(
      // (host, expected registrable domain or null)
      ("a.b.example.co.uk", "example.co.uk"), // 2-label public suffix
      ("example.co.uk", "example.co.uk"),
      ("co.uk", null), // host IS a public suffix
      ("uk", null),
      ("m2.shop1.com.au", "shop1.com.au"),
      ("deep.sub.host.ac.jp", "host.ac.jp"),
      ("a.b.example.org", "example.org"), // 1-label suffix unchanged
      ("cdn.mirror.io", "mirror.io"),
      ("shop.anything.ck", "shop.anything.ck"), // wildcard *.ck: suffix = anything.ck
      ("anything.ck", null), // the wildcard suffix itself
      ("sub.www.ck", "www.ck"), // exception !www.ck
      ("www.ck", "www.ck"), // the exception host itself is registrable
      ("x.y.unlisted", "y.unlisted"), // implicit * rule
      ("unlisted", null),
      ("localhost", null), // single label: no registrable domain
      ("", null))
    val df = cases.zipWithIndex.map { case ((h, _), i) => (i.toLong, h) }.toDF("id", "host")
    val got = df.select(col("id"), Psl.registrableDomain(col("host")).as("d"))
      .orderBy("id").collect().map(r => Option(r.getString(1)).orNull)
    cases.zip(got).foreach { case ((h, want), g) =>
      assert(g == want, s"host '$h': got '$g', want '$want'")
    }
    // the broadcast-join form is row-identical on the same battery
    val joined = Psl.withRegistrableDomainJoin(df, "host", Psl.rulesDf(spark), "d")
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d")).orNull)
    cases.zip(joined).foreach { case ((h, want), g) =>
      assert(g == want, s"join form, host '$h': got '$g', want '$want'")
    }
  }

  test("PSL deep chains: 4- and 5-label suffixes and punycode TLD resolve through both forms (r14 task 5)") {
    import graft.operators.Psl
    import spark.implicits._
    val cases = Seq(
      // 4-label normal rule s3.eu-west-2.amazonaws.com
      ("bucket.s3.eu-west-2.amazonaws.com", "bucket.s3.eu-west-2.amazonaws.com"),
      ("a.bucket.s3.eu-west-2.amazonaws.com", "bucket.s3.eu-west-2.amazonaws.com"),
      ("s3.eu-west-2.amazonaws.com", null), // the suffix itself
      // the 4-label rule must BEAT the 1-label 'com' rule (longest match),
      // but an unlisted region falls through to 'com'
      ("s3.eu-west-9.amazonaws.com", "amazonaws.com"),
      // 5-label normal rule s3.dualstack.eu-west-2.amazonaws.com
      ("b.s3.dualstack.eu-west-2.amazonaws.com", "b.s3.dualstack.eu-west-2.amazonaws.com"),
      ("x.b.s3.dualstack.eu-west-2.amazonaws.com", "b.s3.dualstack.eu-west-2.amazonaws.com"),
      ("s3.dualstack.eu-west-2.amazonaws.com", null),
      // 4-label wildcard rule *.compute.amazonaws.com
      ("vm1.uswest.compute.amazonaws.com", "vm1.uswest.compute.amazonaws.com"),
      ("a.vm1.uswest.compute.amazonaws.com", "vm1.uswest.compute.amazonaws.com"),
      ("uswest.compute.amazonaws.com", null), // matched by the wildcard
      ("compute.amazonaws.com", "amazonaws.com"), // too short for *: falls to 'com'
      // 4-label normal rule cdn.prod.atlassian-dev.net
      ("app1.cdn.prod.atlassian-dev.net", "app1.cdn.prod.atlassian-dev.net"),
      ("cdn.prod.atlassian-dev.net", null),
      ("other.prod.atlassian-dev.net", "atlassian-dev.net"), // falls to 'net'
      // punycode TLD
      ("site.xn--p1ai", "site.xn--p1ai"),
      ("xn--p1ai", null))
    val df = cases.zipWithIndex.map { case ((h, _), i) => (i.toLong, h) }.toDF("id", "host")
    val got = df.select(col("id"), Psl.registrableDomain(col("host")).as("d"))
      .orderBy("id").collect().map(r => Option(r.getString(1)).orNull)
    cases.zip(got).foreach { case ((h, want), g) =>
      assert(g == want, s"literal form, host '$h': got '$g', want '$want'")
    }
    val joined = Psl.withRegistrableDomainJoin(df, "host", Psl.rulesDf(spark), "d")
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d")).orNull)
    cases.zip(joined).foreach { case ((h, want), g) =>
      assert(g == want, s"join form, host '$h': got '$g', want '$want'")
    }
  }

  test("PSL shipped x + *.x pair (platformsh.site): rule kinds stay distinct through both forms (r16 verdict task 1)") {
    import graft.operators.Psl
    import spark.implicits._
    val cases = Seq(
      // host EQUAL to the normal rule: public suffix by the NORMAL kind
      // — the row a kind-collapse (wild-over-normal) would mis-derive
      // to 'platformsh.site' via the implicit-* fallback
      ("platformsh.site", null),
      // one label deep: public suffix by the WILDCARD kind
      ("proj.platformsh.site", null),
      // two labels deep: registrable under the wildcard
      ("www.proj.platformsh.site", "www.proj.platformsh.site"),
      ("a.www.proj.platformsh.site", "www.proj.platformsh.site"),
      // the plain 'site' TLD rule still decides unrelated hosts
      ("other.site", "other.site"),
      ("x.other.site", "other.site"))
    val df = cases.zipWithIndex.map { case ((h, _), i) => (i.toLong, h) }.toDF("id", "host")
    val lit0 = df.select(col("id"), Psl.registrableDomain(col("host")).as("d"))
      .orderBy("id").collect().map(r => Option(r.getString(1)).orNull)
    cases.zip(lit0).foreach { case ((h, want), g) =>
      assert(g == want, s"literal form, host '$h': got '$g', want '$want'")
    }
    val joined = Psl.withRegistrableDomainJoin(df, "host", Psl.rulesDf(spark), "d")
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d")).orNull)
    assert(joined.length == cases.length, "join form must not fan out on the dual-kind rule")
    cases.zip(joined).foreach { case ((h, want), g) =>
      assert(g == want, s"join form, host '$h': got '$g', want '$want'")
    }
    // the rule table carries BOTH kinds as separate rows (the fix shape)
    val kinds = Psl.rulesDf(spark).filter(col("rule") === "platformsh.site")
      .select("kind").collect().map(_.getString(0)).sorted.toSeq
    assert(kinds == Seq("normal", "wild"),
      s"expected normal+wild rows for platformsh.site, got $kinds")
    // third form: the generated oracle SQL carries the pair too — the
    // driver's DuckDB run executes it; here we assert the FRAGMENT
    // evaluates both kinds (normal at len 2 in the l=2 case, wildcard
    // base at len 2 in the l=3 case)
    val sql = Psl.sqlRegistrableDomain("host")
    assert(sql.contains("'platformsh.site'"),
      "generated SQL must carry the pair's rule string")
  }

  test("PSL loader: the shipped .dat slice round-trips to Psl.Rules; rulesDfFrom guards depth") {
    import graft.operators.Psl
    // wire-format parse (comments, section markers, first-whitespace
    // truncation, U-label -> A-label punycode) reproduces the compiled
    // slice EXACTLY, order included
    assert(Psl.loadSliceFile() == Psl.Rules,
      "psl_slice.dat must parse to the exact compiled rule slice")
    // parser details pinned independently of the file
    val parsed = Psl.parseList(Iterator(
      "// comment", "", "  ", "com", "  co.uk   trailing junk",
      "*.ck", "!www.ck", "РФ", "example.укр"))
    assert(parsed == Seq("com", "co.uk", "*.ck", "!www.ck", "xn--p1ai", "example.xn--j1amh"),
      s"got $parsed")
    // a rule deeper than the evaluation chains fails loudly, not silently
    val boom = intercept[IllegalArgumentException] {
      Psl.rulesDfFrom(spark, Seq("a.b.c.d.e.f"))
    }
    assert(boom.getMessage.contains("MaxRuleLabels"), boom.getMessage)
    // a parsed-list-backed rules frame drives the join form identically
    // to the compiled slice's frame (list-as-data contract)
    import spark.implicits._
    val df = Seq((1L, "a.bucket.s3.eu-west-2.amazonaws.com"), (2L, "x.y.co.uk"))
      .toDF("id", "host")
    val fromFile = Psl.withRegistrableDomainJoin(
      df, "host", Psl.rulesDfFrom(spark, Psl.loadSliceFile()), "d")
      .orderBy("id").collect().map(_.getAs[String]("d")).toSeq
    assert(fromFile == Seq("bucket.s3.eu-west-2.amazonaws.com", "y.co.uk"), s"got $fromFile")
  }

  test("PSL at realistic width: a generated few-hundred-rule slice evaluates identically in both forms, x + *.x pairs included (r15 task 7)") {
    import graft.operators.Psl
    import spark.implicits._
    // a generated wide slice exercising every rule class the full list
    // carries, INCLUDING same-string normal + wildcard pairs (the real
    // platformsh.site + *.platformsh.site shape whose kind-collapse the
    // r15 ADVICE flagged) and depth-5 private-section chains
    val wide: Seq[String] =
      (0 until 80).map(i => s"t$i") ++
        (0 until 60).map(i => s"co.t${i % 30}") ++
        (0 until 40).map(i => s"org.co.t${i % 20}") ++
        (0 until 30).flatMap(i => Seq(s"p$i.host", s"*.p$i.host")) ++   // x + *.x
        (0 until 20).map(i => s"*.w$i") ++
        (0 until 20).map(i => s"!ex.w$i") ++
        (0 until 10).map(i => s"cdn.prod.vendor$i.net") ++
        (0 until 10).map(i => s"s3.dual.r$i.cloud.com")
    val rules = wide.distinct
    assert(rules.length >= 250, s"fixture: ${rules.length} distinct rules")
    // hosts hitting every class at every depth, plus misses
    val hosts: Seq[String] =
      (0 until 30).flatMap(i => Seq(
        s"p$i.host",                 // EQUALS the normal rule -> null (the ADVICE case)
        s"a$i.p$i.host",             // one deeper: public suffix via *.x -> null
        s"b$i.a$i.p$i.host")) ++     // two deeper: registrable under the wildcard
        (0 until 20).flatMap(i => Seq(s"w$i", s"q$i.w$i", s"r$i.q$i.w$i",
          s"ex.w$i", s"deep$i.ex.w$i")) ++
        (0 until 30).flatMap(i => Seq(s"t$i", s"site$i.t$i", s"sub$i.site$i.t$i",
          s"shop$i.co.t${i % 30}", s"x$i.org.co.t${i % 20}")) ++
        (0 until 10).flatMap(i => Seq(s"cdn.prod.vendor$i.net", s"acct$i.cdn.prod.vendor$i.net",
          s"b.acct$i.cdn.prod.vendor$i.net", s"s3.dual.r$i.cloud.com", s"buck$i.s3.dual.r$i.cloud.com")) ++
        Seq("unlisted.zz", "a.unlisted.zz", "zz", "", "single")
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
    val literal = df.withColumn("d", Psl.registrableDomainFrom(col("host"), rules))
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d"))).toSeq
    val joined = Psl.withRegistrableDomainJoin(df, "host", Psl.rulesDfFrom(spark, rules), "d")
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d"))).toSeq
    assert(joined.length == hosts.length,
      "the join form must not fan any host row out (one row in, one row out)")
    hosts.zip(literal.zip(joined)).zipWithIndex.foreach { case ((h, (l, j)), i) =>
      assert(l == j, s"host '$h' (#$i): literal=$l join=$j")
    }
    // the ADVICE regression, pinned point-blank: a host equal to the
    // normal rule of an x + *.x pair has NO registrable domain in
    // either form (the normal rule decides; the wildcard needs a label)
    val adviceIdx = hosts.indexOf("p0.host")
    assert(literal(adviceIdx).isEmpty && joined(adviceIdx).isEmpty,
      s"x + *.x pair: host equal to x must be a public suffix, got ${literal(adviceIdx)}")
    // and one label under the wildcard base is a public suffix too,
    // while two labels under yields the wildcard-sized registrable
    assert(literal(hosts.indexOf("a0.p0.host")).isEmpty)
    assert(literal(hosts.indexOf("b0.a0.p0.host")).contains("b0.a0.p0.host"))
  }

  test("PSL at production cardinality: ~9k rules through the join form agree with the Column form on a 100-host sample (r18 task 7)") {
    import graft.operators.Psl
    import spark.implicits._
    // the real public_suffix_list.dat is ~9.5k rules; the full file does
    // not ship in this environment (no egress), so this generates a list
    // with its SHAPE (every rule class, every depth the list uses, x +
    // *.x pairs included) at its CARDINALITY — the r15 realistic-width
    // test was ~290 rules, which exercises semantics but not the join
    // form at the rule volume the production path is declared for
    val rules: Seq[String] = (
      (0 until 1500).map(i => s"t$i") ++
        (0 until 4000).map(i => s"co$i.t${i % 1500}") ++
        (0 until 2000).map(i => s"org$i.co${i % 400}.t${i % 300}") ++
        (0 until 600).flatMap(i =>
          Seq(s"pp$i.host${i % 97}.t${i % 100}", s"*.pp$i.host${i % 97}.t${i % 100}")) ++
        (0 until 400).map(i => s"*.w$i.t${i % 50}") ++
        (0 until 400).map(i => s"!ex.w$i.t${i % 50}") ++
        (0 until 200).map(i => s"cdn$i.prod.vendor$i.net")
      ).distinct
    assert(rules.length >= 9000, s"fixture must reach production cardinality: ${rules.length}")
    // a 100-host sample hitting every class: apex TLD hosts, 2/3-label
    // suffixes, the x + *.x pair at all three depths, wildcard +
    // exception, deep private chains, and misses (implicit *)
    val hosts: Seq[String] =
      (0 until 10).flatMap(i => Seq(
        s"site$i.t${i * 7}", s"shop$i.co${i * 11}.t${i * 11 % 1500}",
        s"x$i.org${i * 13}.co${i * 13 % 400}.t${i * 13 % 300}")) ++
        (0 until 10).flatMap(i => Seq(
          s"pp$i.host${i % 97}.t${i % 100}",          // = normal rule -> null
          s"a$i.pp$i.host${i % 97}.t${i % 100}",      // under *.x -> null
          s"b$i.a$i.pp$i.host${i % 97}.t${i % 100}")) ++ // registrable via wildcard
        (0 until 10).flatMap(i => Seq(
          s"q$i.w$i.t${i % 50}", s"ex.w$i.t${i % 50}", s"d$i.ex.w$i.t${i % 50}")) ++
        (0 until 5).flatMap(i => Seq(
          s"cdn$i.prod.vendor$i.net", s"acct$i.cdn$i.prod.vendor$i.net")) ++
        Seq("unlisted.zz", "a.b.unlisted.zz", "t0", "", "lone")
    assert(hosts.length >= 100, s"sample size: ${hosts.length}")
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
      .repartition(4) // off the LocalRelation fast path: the join must really join
    val literal = df.withColumn("d", Psl.registrableDomainFrom(col("host"), rules))
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d"))).toSeq
    val joined = Psl.withRegistrableDomainJoin(df, "host", Psl.rulesDfFrom(spark, rules), "d")
      .orderBy("id").collect().map(r => Option(r.getAs[String]("d"))).toSeq
    assert(joined.length == hosts.length, "join form fanned rows out")
    hosts.zip(literal.zip(joined)).zipWithIndex.foreach { case ((h, (l, j)), i) =>
      assert(l == j, s"host '$h' (#$i) diverges at 9k rules: literal=$l join=$j")
    }
    // spot-pin the depth classes so the sample can't silently go shallow
    assert(literal(hosts.indexOf("pp0.host0.t0")).isEmpty, "x + *.x apex must be a suffix")
    assert(literal(hosts.indexOf("b0.a0.pp0.host0.t0")).contains("b0.a0.pp0.host0.t0"))
    assert(literal(hosts.indexOf("ex.w0.t0")).contains("ex.w0.t0"),
      "exception rule must yield the rule itself as registrable")
  }

  test("PSL property: engine matches an independent reference on random hosts, both forms") {
    import graft.operators.Psl
    import spark.implicits._
    // independent driver-side implementation straight from the published
    // PSL algorithm: collect ALL matching rules, exception prevails
    // (public suffix = rule minus leftmost label), else longest rule
    // (wildcard * matches exactly one extra label), else implicit '*'
    val normal = Psl.Rules.filterNot(r => r.startsWith("*.") || r.startsWith("!"))
      .map(_.split('.').toList).toSet
    val wild = Psl.Rules.filter(_.startsWith("*.")).map(_.drop(2).split('.').toList).toSet
    val exc = Psl.Rules.filter(_.startsWith("!")).map(_.drop(1).split('.').toList).toSet
    def refPsLen(labels: List[String]): Int = {
      def ends(suffix: List[String]) = labels.endsWith(suffix)
      // exception prevails: its public suffix is the rule minus the
      // leftmost label (longest matching exception wins, were there several)
      val excHits = exc.filter(ends).map(_.length - 1)
      if (excHits.nonEmpty) excHits.max
      else {
        val nHits = normal.filter(ends).map(_.length)
        val wHits = wild.filter(b => labels.length >= b.length + 1 && ends(b)).map(_.length + 1)
        (nHits.toSeq ++ wHits.toSeq ++ Seq(1)).max // the 1: the implicit '*' rule
      }
    }
    def refDomain(host: String): Option[String] = {
      if (host.isEmpty) return None
      val labels = host.split('.').toList
      val ps = refPsLen(labels)
      if (labels.length > ps) Some(labels.takeRight(ps + 1).mkString(".")) else None
    }
    val rnd = new scala.util.Random(4242)
    val bodies = Vector("a", "bb", "shop", "x1", "deep", "sub")
    val tails = Vector("com", "org", "co.uk", "ac.uk", "com.au", "ck", "www.ck",
      "anything.ck", "np", "co.jp", "unlisted", "xx.unlisted", "io", "uk", "au", "in", "co.in",
      // deep private-section chains (round 15: MaxRuleLabels = 5)
      "s3.eu-west-2.amazonaws.com", "s3.dualstack.eu-west-2.amazonaws.com",
      "compute.amazonaws.com", "west.compute.amazonaws.com", "amazonaws.com",
      "cdn.prod.atlassian-dev.net", "prod.atlassian-dev.net", "xn--p1ai")
    val hosts = (1 to 400).map { _ =>
      val nBody = rnd.nextInt(3)
      ((1 to nBody).map(_ => bodies(rnd.nextInt(bodies.size))) :+
        tails(rnd.nextInt(tails.size))).mkString(".")
    }.distinct
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
    val lit = df.select(col("id"), col("host"), Psl.registrableDomain(col("host")).as("d"))
      .orderBy("id").collect()
    val join = Psl.withRegistrableDomainJoin(df, "host", Psl.rulesDf(spark), "d")
      .orderBy("id").collect()
    hosts.indices.foreach { i =>
      val want = refDomain(hosts(i)).orNull
      val gl = Option(lit(i).getAs[String]("d")).orNull
      val gj = Option(join(i).getAs[String]("d")).orNull
      assert(gl == want, s"literal form, host '${hosts(i)}': got '$gl', want '$want'")
      assert(gj == want, s"join form, host '${hosts(i)}': got '$gj', want '$want'")
    }
  }

  test("url_registrable key: PSL classes resolve correctly on the decorated corpus") {
    val rows = SparkEntry.queries("url_registrable")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def forSuffix(s: String) = rows.filter(r => r.getString(2).endsWith(s))
    // co.uk hosts: registrable = brand.co.uk (3 labels), never bare co.uk
    val uk = forSuffix(".co.uk")
    assert(uk.nonEmpty && uk.forall { r =>
      val d = r.getString(3); d != null && d.count(_ == '.') == 2 && d.endsWith(".co.uk")
    }, "co.uk hosts must resolve to 3-label registrable domains")
    // wildcard *.ck: host sN.islandM.ck → registrable is the full 3-label host
    val ck = rows.filter(r => r.getString(2).matches("s\\d+\\.island\\d+\\.ck"))
    assert(ck.nonEmpty && ck.forall(r => r.getString(3) == r.getString(2)),
      "wildcard-suffix hosts must be registrable at 3 labels")
    // exception !www.ck: subN.www.ck → www.ck
    val exc = forSuffix(".www.ck")
    assert(exc.nonEmpty && exc.forall(_.getString(3) == "www.ck"))
    // apex public suffix: null domain
    val apex = rows.filter(_.getString(2) == "co.uk")
    assert(apex.nonEmpty && apex.forall(_.isNullAt(3)),
      "a bare public-suffix host has no registrable domain")
  }

  test("canonicalUrl: RFC-3986 normalization + tracking-param scrub classes") {
    import spark.implicits._
    val cases = Seq(
      // case-fold scheme+host (path stays), default port, param sort, utm, fragment
      "HTTP://WWW.Example.COM:80/Shop/?b=2&utm_source=f&a=1#top" ->
        "http://www.example.com/Shop?a=1&b=2",
      "https://CDN.Mirror.IO:443/x/" -> "https://cdn.mirror.io/x",
      // a NON-default port must survive
      "http://api.example.org:8080/q?z=9&y=8&fbclid=abc" ->
        "http://api.example.org:8080/q?y=8&z=9",
      // two raw spellings of one resource → one canonical form
      "HTTPS://Dup.Example.COM/a/?utm_campaign=x1" -> "https://dup.example.com/a",
      "https://dup.example.com/a" -> "https://dup.example.com/a",
      // empty path → '/', fragment dropped, trailing host dot dropped
      "https://plain.net#frag" -> "https://plain.net/",
      "http://host.org./p" -> "http://host.org/p",
      "https://x.net/?gclid=1&utm_medium=m" -> "https://x.net/"
    )
    val out = cases.map(_._1).toDF("url")
      .withColumn("canon", WebOps.canonicalUrl(col("url"))).collect()
    cases.zip(out).foreach { case ((raw, want), r) =>
      assert(r.getString(1) == want, s"canon of '$raw': got '${r.getString(1)}'")
    }
  }

  test("url_canonical key: spelling variants collapse, no raw artifacts survive") {
    val rows = SparkEntry.queries("url_canonical")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dup = rows.filter(_.getString(2).startsWith("https://dup.example.com/a"))
    assert(dup.map(_.getString(2)).distinct.toSeq == Seq("https://dup.example.com/a"),
      "both planted spellings must canonicalize identically")
    assert(dup.map(_.getString(1)).distinct.length >= 2,
      "the collapse must come from DISTINCT raw spellings")
    rows.foreach { r =>
      val c = r.getString(2)
      assert(c.startsWith("http://") || c.startsWith("https://"), c)
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("fbclid"), c)
      assert(!c.contains(":80/") && !c.contains(":443/"), c)
      val host = c.split("://")(1).split("[/:?]")(0)
      assert(host == host.toLowerCase && !host.endsWith("."), c)
    }
  }

  test("declared keys are mutually consistent on the real corpus") {
    val urls = SparkEntry.queries("url_extract")(spark, sfDir)
    val stats = SparkEntry.queries("domain_stats")(spark, sfDir).collect()
    val filt = SparkEntry.queries("domain_filter")(spark, sfDir).collect()
    // stats totals must equal the extraction row count
    assert(stats.map(_.getAs[Long]("n_urls")).sum == urls.count())
    // every doc with a badsite.com URL is dropped, all others kept
    val blockedDocs = urls.filter(col("domain") === "badsite.com")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    filt.foreach { r =>
      val (id, keep) = (r.getLong(0), r.getBoolean(3))
      assert(keep == !blockedDocs.contains(id), s"doc $id keep=$keep")
    }
    // planted classes present: %9 docs blocked, stats carry the planted domains
    assert(blockedDocs.nonEmpty && stats.exists(_.getString(0) == "badsite.com"))
    assert(stats.exists(_.getString(0) == "mirror.io"))
  }
}

package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL / domain hygiene — the web-corpus filtering passes (C4's bad-URL
  * blocklist, RefinedWeb §3.1 URL filtering): extract URLs from text,
  * aggregate per-domain corpus statistics, and gate documents on a
  * domain blocklist.
  *
  * The synthetic corpus carries no URLs, so they are PLANTED in-plan from
  * doc ids (the `pii_redact` idiom — identical deterministic decoration in
  * both engines, so the oracle verifies the extraction/aggregation/gate
  * transform, not a lucky no-op). On real data the same operators run on
  * the raw text unchanged.
  *
  * "Registrable domain" is resolved by the real public-suffix algorithm
  * ([[Psl]], round 14): longest-match against a PSL rule slice with
  * wildcard and exception rules, so `a.b.example.co.uk` gates on
  * `example.co.uk`, not on `co.uk`. On this synthetic corpus (whose
  * planted hosts all sit under 1-label suffixes) the result is
  * label-for-label identical to the r13 two-label extraction, which is
  * why the DuckDB oracles of the four original keys keep the simpler
  * regex; the PSL-distinguishing cases have their own oracle-verified
  * key (`url_registrable`) whose DuckDB side is GENERATED from the same
  * rule slice ([[Psl.sqlRegistrableDomain]]) — the engines cannot drift
  * on rule content.
  *
  * Scale notes (100 TB): extraction is a narrow codegen'd
  * `regexp_extract_all` map — no shuffle; `domain_stats` is one
  * partial-agg'd groupBy keyed by domain (bounded cardinality — domains,
  * not documents); the blocklist gate BROADCASTs the blocklist (KBs even
  * for production lists) and equi-joins on the registrable domain, so the
  * corpus never shuffles — the per-doc verdict is a map-side broadcast
  * semi-join + one partial-agg'd per-doc aggregation.
  */
object WebOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")

  /** URL shape: scheme + host + optional path. Valid under both Java
    * regex and DuckDB's RE2 (no lookaround, no backrefs). The host is
    * anchored to END on an alphanumeric so trailing sentence punctuation
    * never rides into it ('see https://x.badsite.com. Next' must yield
    * host `x.badsite.com`, not `x.badsite.com.` — a trailing dot would
    * defeat domain extraction and let a blocked domain evade the gate
    * on raw real text).
    */
  val UrlRe = "https?://[a-z0-9.-]*[a-z0-9](?:/[a-z0-9_./-]*)?"

  /** Registrable-domain blocklist — the gate's small side. */
  val Blocklist: Seq[String] = Seq("badsite.com", "tracker.net")

  /** In-plan URL decoration (deterministic from doc_id; ~1/3 of docs get
    * a content URL, ~1/7 a CDN mirror, ~1/9 a BLOCKLISTED link — the
    * overlap classes exercise keep/drop on multi-URL docs). Shared with
    * [[SpanOps]]' `corpus_curate`, whose blocklist stage needs a corpus
    * that actually carries blocked links.
    */
  private[graft] def decorated(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat(col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" see https://w"), pmod(col("doc_id"), lit(20)).cast("string"),
          lit(".example"), pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" mirror http://cdn"), pmod(col("doc_id"), lit(11)).cast("string"),
          lit(".mirror.io/x"), pmod(col("doc_id"), lit(13)).cast("string")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(9)) === 0,
        concat(lit(" via https://s"), pmod(col("doc_id"), lit(4)).cast("string"),
          lit(".badsite.com/z"))).otherwise(lit("")),
      // multi-label-suffix witnesses (r17 verdict item 2): a co.uk-class
      // host (PSL depth 2 — the 2-label regex the oracle used to carry
      // would resolve these to 'co.uk') and a wildcard-class host
      // (*.ck — registrable is THREE labels), rare enough (~1.7%/1.4% of
      // docs) that the domain_heavy_hitters share structure is unmoved
      when(pmod(col("doc_id"), lit(57)) === 0,
        concat(lit(" shop https://v"), pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".outlet"), pmod(col("doc_id"), lit(2)).cast("string"),
          lit(".co.uk/s"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(74)) === 0,
        concat(lit(" isle https://t"), pmod(col("doc_id"), lit(3)).cast("string"),
          lit(".lagoon.ck/w"))).otherwise(lit(""))).as("text"))

  /** Shared DuckDB fragment mirroring [[decorated]] over an arbitrary
    * source relation. No continuation line may START with `||`: this
    * fragment is embedded in an outer `stripMargin` string, which would
    * strip the first pipe again.
    */
  private[graft] def decoratedSqlFrom(src: String): String =
    s"""SELECT doc_id, text ||
       |  CASE WHEN doc_id % 3 = 0
       |       THEN ' see https://w' || CAST(doc_id % 20 AS VARCHAR) ||
       |            '.example' || CAST(doc_id % 5 AS VARCHAR) ||
       |            '.org/p/' || CAST(doc_id AS VARCHAR)
       |       ELSE '' END ||
       |  CASE WHEN doc_id % 7 = 0
       |       THEN ' mirror http://cdn' || CAST(doc_id % 11 AS VARCHAR) ||
       |            '.mirror.io/x' || CAST(doc_id % 13 AS VARCHAR)
       |       ELSE '' END ||
       |  CASE WHEN doc_id % 9 = 0
       |       THEN ' via https://s' || CAST(doc_id % 4 AS VARCHAR) ||
       |            '.badsite.com/z'
       |       ELSE '' END ||
       |  CASE WHEN doc_id % 57 = 0
       |       THEN ' shop https://v' || CAST(doc_id % 5 AS VARCHAR) ||
       |            '.outlet' || CAST(doc_id % 2 AS VARCHAR) || '.co.uk/s'
       |       ELSE '' END ||
       |  CASE WHEN doc_id % 74 = 0
       |       THEN ' isle https://t' || CAST(doc_id % 3 AS VARCHAR) ||
       |            '.lagoon.ck/w'
       |       ELSE '' END AS text
       |FROM $src""".stripMargin

  private val DecoratedSql: String = decoratedSqlFrom("documents")

  /** DuckDB VALUES rows generated from the SAME [[Blocklist]] value the
    * Column forms use, so the engines cannot drift on the list.
    */
  private[graft] def blocklistValuesSql: String =
    Blocklist.map(d => s"('$d')").mkString(", ")

  /** `(doc_id, url, host, domain)` — one row per URL occurrence. Spark's
    * `regexp_extract_all` needs the explicit group-0 literal (SURVEY
    * §7.5); DuckDB's defaults to the whole match.
    */
  private[graft] def urlsOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).as("url"))
      .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)", 1))
      .withColumn("domain", Psl.registrableDomain(col("host")))

  private def urlExtract(spark: SparkSession, sfDir: String): DataFrame =
    urlsOf(decorated(docs(spark, sfDir))).orderBy("doc_id", "url")

  private def domainStats(spark: SparkSession, sfDir: String): DataFrame =
    urlsOf(decorated(docs(spark, sfDir)))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("host").as("n_hosts"))
      .orderBy("domain")

  /** Per-doc blocklist verdict: a doc is dropped iff ANY of its URLs
    * resolves to a blocklisted registrable domain; URL-free docs keep.
    * The blocklist side is a broadcast equi-join on `domain` — the
    * production shape for a real (still KB-sized) blocklist.
    */
  private[graft] def domainFilterOf(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    val block = Blocklist.toDF("domain")
    val verdict = urlsOf(d)
      .join(broadcast(block.withColumn("blocked", lit(1L))), Seq("domain"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_urls"),
        sum(coalesce(col("blocked"), lit(0L))).as("n_blocked"))
    d.select("doc_id").join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_urls"), lit(0L)).as("n_urls"),
        coalesce(col("n_blocked"), lit(0L)).as("n_blocked"),
        (coalesce(col("n_blocked"), lit(0L)) === 0).as("keep"))
  }

  private def domainFilter(spark: SparkSession, sfDir: String): DataFrame =
    domainFilterOf(spark, decorated(docs(spark, sfDir))).orderBy("doc_id")

  /** The NARROW (per-row) gate form: URL extraction, domain resolution
    * and the blocklist check as pure Column algebra over the in-row URL
    * array — no explode, no join, no shuffle, so it composes with a
    * STREAMING frame per micro-batch unchanged (the `withPiiScrub`
    * composition contract). Equivalent to [[domainFilterOf]] row for row
    * (pinned in WebSpec); the literal blocklist stands where a broadcast
    * table would for a list too big to inline — for real KB-sized lists
    * either shape works, and the join form is the one that scales past
    * that.
    */
  private[graft] def withDomainGate(d: DataFrame): DataFrame = {
    val urls = regexp_extract_all(col("text"), lit(UrlRe), lit(0))
    val domains = transform(urls, u =>
      Psl.registrableDomain(regexp_extract(u, "https?://([^/]+)", 1)))
    d.withColumn("n_urls", size(urls).cast("long"))
      .withColumn("n_blocked",
        size(filter(domains, dm => dm.isInCollection(Blocklist))).cast("long"))
  }

  /** In-plan decoration for the PSL-distinguishing key: hosts under
    * 2-label suffixes (`co.uk`, `com.au`), the wildcard (`*.ck`), its
    * exception (`!www.ck`), an unlisted TLD (implicit `*` rule), and a
    * bare public suffix (no registrable domain → null). The classes the
    * r13 two-label extraction mis-grouped.
    */
  private def decoratedPsl(d: DataFrame): DataFrame = {
    def m(n: Int) = pmod(col("doc_id"), lit(n)).cast("string")
    d.select(col("doc_id"), concat(col("text"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" see https://shop"), m(7), lit(".brand"), m(4),
          lit(".co.uk/p/"), col("doc_id").cast("string"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(8)) === 0,
        concat(lit(" mirror http://m"), m(6), lit(".shop"), m(3),
          lit(".com.au/q"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(9)) === 0,
        concat(lit(" via https://s"), m(5), lit(".island"), m(3),
          lit(".ck/z"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 0,
        concat(lit(" exc http://sub"), m(2), lit(".www.ck/e"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(lit(" unk https://x"), m(3), lit(".y"), m(2),
          lit(".unlisted/u"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(17)) === 0,
        concat(lit(" apex https://co.uk/x"))).otherwise(lit("")),
      // the x + *.x rule-kind pair (platformsh.site + *.platformsh.site):
      // host EQUAL to the normal rule (no registrable domain), one label
      // under the wildcard (public suffix, null), and two labels under
      // (registrable = the whole 4-label host) — the r15-ADVICE shape,
      // oracle-witnessed on every correctness run
      when(pmod(col("doc_id"), lit(19)) === 0,
        lit(" pair https://platformsh.site/apex")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(23)) === 0,
        concat(lit(" one https://a"), m(3), lit(".platformsh.site/w"),
          lit(" two https://b"), m(2), lit(".a"), m(3),
          lit(".platformsh.site/z"))).otherwise(lit(""))).as("text"))
  }

  /** Shared DuckDB fragment mirroring [[decoratedPsl]]. */
  private val DecoratedPslSql: String =
    """SELECT doc_id, text ||
      |  CASE WHEN doc_id % 5 = 0
      |       THEN ' see https://shop' || CAST(doc_id % 7 AS VARCHAR) ||
      |            '.brand' || CAST(doc_id % 4 AS VARCHAR) ||
      |            '.co.uk/p/' || CAST(doc_id AS VARCHAR)
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 8 = 0
      |       THEN ' mirror http://m' || CAST(doc_id % 6 AS VARCHAR) ||
      |            '.shop' || CAST(doc_id % 3 AS VARCHAR) || '.com.au/q'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 9 = 0
      |       THEN ' via https://s' || CAST(doc_id % 5 AS VARCHAR) ||
      |            '.island' || CAST(doc_id % 3 AS VARCHAR) || '.ck/z'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0
      |       THEN ' exc http://sub' || CAST(doc_id % 2 AS VARCHAR) || '.www.ck/e'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0
      |       THEN ' unk https://x' || CAST(doc_id % 3 AS VARCHAR) ||
      |            '.y' || CAST(doc_id % 2 AS VARCHAR) || '.unlisted/u'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 17 = 0 THEN ' apex https://co.uk/x'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 19 = 0 THEN ' pair https://platformsh.site/apex'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 23 = 0
      |       THEN ' one https://a' || CAST(doc_id % 3 AS VARCHAR) ||
      |            '.platformsh.site/w' ||
      |            ' two https://b' || CAST(doc_id % 2 AS VARCHAR) ||
      |            '.a' || CAST(doc_id % 3 AS VARCHAR) || '.platformsh.site/z'
      |       ELSE '' END AS text
      |FROM documents""".stripMargin

  private def urlRegistrable(spark: SparkSession, sfDir: String): DataFrame =
    urlsOf(decoratedPsl(docs(spark, sfDir))).orderBy("doc_id", "url")

  /** URL shape for the CANONICALIZATION key — deliberately permissive
    * (uppercase scheme/host, explicit ports, query strings, fragments)
    * because its job is to exercise the normalizer on messy real-web
    * spellings that [[UrlRe]]'s hygiene-anchored form never admits.
    * Boundary trimming is [[UrlRe]]'s concern (`url_extract`); this key
    * tests the canonical transform itself, which is boundary-agnostic.
    */
  val UrlCanonRe: String =
    "(?i)https?://[a-z0-9.-]+(?::[0-9]+)?[a-z0-9_./?&=#%-]*"

  /** RFC 3986 §6 syntax-based normalization + the tracking-param scrub
    * every web-corpus pipeline applies before URL-keyed dedup (two raw
    * spellings of one resource must collide): lowercase scheme and host
    * (path stays case-sensitive), strip the fragment, drop default ports
    * (http:80 / https:443 — other ports keep), strip trailing slashes
    * (empty path → "/"), drop `utm_*`/`fbclid`/`gclid` params, and sort
    * the survivors so param order cannot split a dedup key. Pure
    * stateless Column algebra — narrow, codegen'd, no shuffle — so it
    * composes with streaming frames and the domain gates unchanged.
    */
  private[graft] def canonicalUrl(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scheme = lower(regexp_extract(u, "(?i)^(https?)", 1))
    val host = regexp_replace(lower(regexp_extract(u, "(?i)^https?://([^/:?#]+)", 1)), "\\.+$", "")
    val port = regexp_extract(u, "(?i)^https?://[^/:?#]+:([0-9]+)", 1)
    val path1 = regexp_replace(regexp_extract(u, "(?i)^https?://[^/?#]+([^?#]*)", 1), "/+$", "")
    val q = regexp_extract(u, "[?]([^#]*)", 1)
    val keptParams = filter(split(q, "&"), p =>
      p =!= "" && substring(p, 1, 4) =!= "utm_" &&
        substring(p, 1, 7) =!= "fbclid=" && substring(p, 1, 6) =!= "gclid=")
    val qc = array_join(array_sort(keptParams), "&")
    val portC = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    concat(scheme, lit("://"), host, portC,
      when(path1 === "", lit("/")).otherwise(path1),
      when(qc === "", lit("")).otherwise(concat(lit("?"), qc)))
  }

  /** In-plan decoration for the canonicalization key: the messy spelling
    * classes a crawl actually yields — uppercase scheme+host, default and
    * non-default explicit ports, tracking params interleaved with real
    * ones, fragments, trailing slashes, and two spellings of ONE resource
    * (`Dup.Example.COM/a/?utm_…` vs `dup.example.com/a`) that must
    * collapse to the same canonical form.
    */
  private def decoratedCanon(d: DataFrame): DataFrame = {
    def m(n: Int) = pmod(col("doc_id"), lit(n)).cast("string")
    d.select(col("doc_id"), concat(col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" buy HTTP://WWW.Shop"), m(5), lit(".Example.COM:80/Cat"), m(7),
          lit("/?b=2&utm_source=feed&a=1#top"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" img https://CDN"), m(11), lit(".Mirror.IO:443/x"), m(13),
          lit("/"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(9)) === 0,
        concat(lit(" api http://api"), m(4),
          lit(".example.org:8080/q?z=9&y=8&fbclid=abc123"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(10)) === 0,
        concat(lit(" ref HTTPS://Dup.Example.COM/a/?utm_campaign=x"), m(2)))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(15)) === 0,
        lit(" ref2 https://dup.example.com/a")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(lit(" root https://plain"), m(2), lit(".net#frag"))).otherwise(lit(""))
    ).as("text"))
  }

  /** Shared DuckDB fragment mirroring [[decoratedCanon]]. */
  private val DecoratedCanonSql: String =
    """SELECT doc_id, text ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN ' buy HTTP://WWW.Shop' || CAST(doc_id % 5 AS VARCHAR) ||
      |            '.Example.COM:80/Cat' || CAST(doc_id % 7 AS VARCHAR) ||
      |            '/?b=2&utm_source=feed&a=1#top'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0
      |       THEN ' img https://CDN' || CAST(doc_id % 11 AS VARCHAR) ||
      |            '.Mirror.IO:443/x' || CAST(doc_id % 13 AS VARCHAR) || '/'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 9 = 0
      |       THEN ' api http://api' || CAST(doc_id % 4 AS VARCHAR) ||
      |            '.example.org:8080/q?z=9&y=8&fbclid=abc123'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 10 = 0
      |       THEN ' ref HTTPS://Dup.Example.COM/a/?utm_campaign=x' ||
      |            CAST(doc_id % 2 AS VARCHAR)
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 15 = 0 THEN ' ref2 https://dup.example.com/a'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0
      |       THEN ' root https://plain' || CAST(doc_id % 2 AS VARCHAR) || '.net#frag'
      |       ELSE '' END AS text
      |FROM documents""".stripMargin

  private def urlCanonical(spark: SparkSession, sfDir: String): DataFrame =
    decoratedCanon(docs(spark, sfDir))
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(UrlCanonRe), lit(0))).as("url"))
      .withColumn("canon", canonicalUrl(col("url")))
      .orderBy("doc_id", "url")

  /** Per-domain document cap. */
  val DomainCapN = 25

  /** Anti-domain-dominance capping (the C4/RefinedWeb counterpart of
    * per-source mixture weights): each URL-bearing doc is attributed to
    * its FIRST URL's registrable domain, and only the [[DomainCapN]]
    * lowest doc_ids per domain keep — a mega-domain (SEO farm, mirror
    * network) cannot dominate the corpus. URL-free docs are
    * unconstrained (keep, null domain/rank).
    *
    * Scale shape: the rank is the `vocab_topk` SALTED TWO-PHASE top-k —
    * phase 1 ranks within (domain, salt) so a mega-domain's rows spread
    * over 8 reducers and at most 8·N survive it; phase 2 ranks the ≤8·N
    * survivors per domain. No single reducer ever sees more than
    * (domain rows)/8 in phase 1 or 8·N in phase 2.
    */
  private[graft] def domainCapOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a failed domain resolution (e.g. a single-label host, or a host
    // that IS a public suffix, on raw real text) is null, NOT a domain
    // key: such docs fall into the unconstrained URL-free class instead
    // of pooling into one pseudo-domain that the cap then starves
    // corpus-wide (r13 advice; Psl yields null for these directly)
    val prim = d.select(col("doc_id"),
      get(transform(regexp_extract_all(col("text"), lit(UrlRe), lit(0)), u =>
        Psl.registrableDomain(regexp_extract(u, "https?://([^/]+)", 1))),
        lit(0)).as("domain"))
    val withUrl = prim.filter(col("domain").isNotNull)
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(8)))
    val w1 = Window.partitionBy("domain", "salt").orderBy("doc_id")
    val w2 = Window.partitionBy("domain").orderBy("doc_id")
    val ranked = withUrl
      .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= DomainCapN)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= DomainCapN)
      .select(col("doc_id"), col("rank"))
    prim.join(ranked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("domain"), col("rank"),
        (col("domain").isNull || col("rank").isNotNull).as("keep"))
  }

  private def domainCap(spark: SparkSession, sfDir: String): DataFrame =
    domainCapOf(decorated(docs(spark, sfDir))).orderBy("doc_id")

  /** How many counters the domain heavy-hitter sketch carries — 5, so the
    * share threshold is 1/6 ≈ 16.7 %: on the decorated corpus the CDN
    * domain (~23 %) and the blocklisted domain (~18 %) are heavy while
    * each content domain (~11 %) is not, and 12 distinct domains (the
    * r18 co.uk/wildcard witnesses added five sub-2% ones:
    * outlet{0,1}.co.uk and t{0,1,2}.lagoon.ck) over 5 slots means
    * eviction genuinely fires.
    */
  private[graft] val DomainHeavyK = 5

  /** Dominant registrable domains of the corpus' URLs — the crawl-ops
    * question ("which domains dominate this snapshot?") behind per-domain
    * budget decisions like [[domainCapOf]], computed as the same TWO-PASS
    * heavy-hitters composition as `heavy_hitters` at its second grain
    * (r16 verdict task 7): pass 1 runs `misra_gries(domain, k)` — one
    * GLOBAL group, but every partial buffer is ≤ k counters, so the
    * all-to-one merge moves |tasks|·k rows, never the domain domain;
    * pass 2 recounts ONLY the ≤ k candidates exactly (broadcast map-side
    * filter + a bounded-cardinality partial-agg groupBy) and keeps
    * domains with cnt·(k+1) > n. The Misra-Gries superset guarantee
    * makes the restriction lossless, so the output equals the exact
    * full-domain answer — the DuckDB oracle computes exactly that, and
    * an oracle pass IS the guarantee witness at this grain too.
    *
    * Scale shape (100 TB): URL extraction and domain resolution are
    * narrow codegen'd maps; nothing domain-cardinality-sized ever
    * shuffles (the exact `domain_stats` groupBy moves the whole distinct
    * domain set — fine for stats, wasteful when only the ≥ 1/(k+1) head
    * is wanted).
    */
  private def domainHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.MisraGries.misra_gries
    import org.apache.spark.sql.expressions.Window
    val k = DomainHeavyK
    val doms = urlsOf(decorated(docs(spark, sfDir)))
      .filter(col("domain").isNotNull).select("domain")
    val cand = doms
      .agg(misra_gries(col("domain"), k).as("cands"), count(lit(1)).as("n"))
      .select(col("n"), explode(col("cands")).as("c"))
      .select(col("n"), col("c.item").as("domain"))
    // the survivor set is ≤ k rows — the global rank window is bounded
    val w = Window.orderBy(col("cnt").desc, col("domain"))
    doms.join(broadcast(cand), Seq("domain"))
      .groupBy("domain", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("share_ppm", expr("cnt * 1000000 DIV n"))
      .select("rank", "domain", "cnt", "n", "share_ppm")
      .orderBy("rank")
  }

  // ---- declarations ------------------------------------------------------

  /** Shared oracle CTE for the URL/domain family. `domain` is GENERATED
    * from the SAME PSL slice the Column form evaluates
    * ([[Psl.sqlRegistrableDomain]] — the `url_registrable` discipline,
    * r17 verdict item 2): the 2-label regex this replaces passed only
    * because every decorated host happened to be 2-label-registrable;
    * with the co.uk/wildcard witnesses now planted in [[decorated]],
    * PSL depth is oracle-witnessed on every domain key, every run.
    */
  private val UrlsSqlCte: String =
    s"""WITH d AS ($DecoratedSql),
       |u AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '$UrlRe')) AS url
       |  FROM d),
       |uh AS (
       |  SELECT doc_id, url,
       |         regexp_extract(url, 'https?://([^/]+)', 1) AS host
       |  FROM u),
       |uu AS (
       |  SELECT doc_id, url, host,
       |         ${Psl.sqlRegistrableDomain("host")} AS domain
       |  FROM uh)""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "url_extract" -> QueryDef(urlExtract,
      Some(s"""$UrlsSqlCte
              |SELECT doc_id, url, host, domain FROM uu
              |ORDER BY doc_id, url""".stripMargin)),

    "domain_stats" -> QueryDef(domainStats,
      Some(s"""$UrlsSqlCte
              |SELECT domain, count(*) AS n_urls,
              |       count(DISTINCT doc_id) AS n_docs,
              |       count(DISTINCT host) AS n_hosts
              |FROM uu GROUP BY domain ORDER BY domain""".stripMargin)),

    "domain_cap" -> QueryDef(domainCap,
      Some(s"""WITH d AS ($DecoratedSql),
              |p0 AS (
              |  SELECT doc_id,
              |         regexp_extract(regexp_extract_all(text, '$UrlRe')[1],
              |                        'https?://([^/]+)', 1) AS h
              |  FROM d),
              |p AS (
              |  SELECT doc_id, ${Psl.sqlRegistrableDomain("h")} AS domain
              |  FROM p0),
              |r AS (
              |  SELECT doc_id, domain,
              |         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rank
              |  FROM p WHERE domain IS NOT NULL)
              |SELECT p.doc_id, p.domain,
              |       CASE WHEN r.rank <= $DomainCapN THEN r.rank END AS rank,
              |       (p.domain IS NULL OR r.rank <= $DomainCapN) AS keep
              |FROM p LEFT JOIN r USING (doc_id)
              |ORDER BY p.doc_id""".stripMargin)),

    "domain_heavy_hitters" -> QueryDef(domainHeavyHitters,
      // the oracle computes the EXACT full-domain answer; equality with
      // the sketch-restricted two-pass form witnesses the Misra-Gries
      // superset guarantee on this corpus (the heavy_hitters stance)
      Some(s"""WITH d AS ($DecoratedSql),
              |u AS (
              |  SELECT unnest(regexp_extract_all(text, '$UrlRe')) AS url
              |  FROM d),
              |h AS (
              |  SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host
              |  FROM u),
              |dm AS (
              |  SELECT domain FROM (
              |    SELECT ${Psl.sqlRegistrableDomain("host")} AS domain FROM h)
              |  WHERE domain IS NOT NULL),
              |t AS (SELECT count(*) AS n FROM dm),
              |c AS (SELECT domain, count(*) AS cnt FROM dm GROUP BY 1)
              |SELECT row_number() OVER (ORDER BY cnt DESC, domain) AS rank,
              |       domain, cnt, n, cnt * 1000000 // n AS share_ppm
              |FROM c, t WHERE cnt * ${DomainHeavyK + 1} > n
              |ORDER BY rank""".stripMargin)),

    "url_registrable" -> QueryDef(urlRegistrable,
      Some(s"""WITH d AS ($DecoratedPslSql),
              |u AS (
              |  SELECT doc_id, unnest(regexp_extract_all(text, '$UrlRe')) AS url
              |  FROM d),
              |uu AS (
              |  SELECT doc_id, url,
              |         regexp_extract(url, 'https?://([^/]+)', 1) AS host
              |  FROM u)
              |SELECT doc_id, url, host,
              |       ${Psl.sqlRegistrableDomain("host")} AS domain
              |FROM uu ORDER BY doc_id, url""".stripMargin)),

    "url_canonical" -> QueryDef(urlCanonical,
      Some(s"""WITH d AS ($DecoratedCanonSql),
              |u AS (
              |  SELECT doc_id, unnest(regexp_extract_all(text, '$UrlCanonRe')) AS url
              |  FROM d),
              |c AS (
              |  -- DuckDB regexp_extract is NULL on no match (Spark: '') — coalesce
              |  SELECT doc_id, url,
              |         lower(regexp_extract(url, '(?i)^(https?)', 1)) AS scheme,
              |         regexp_replace(lower(regexp_extract(url,
              |           '(?i)^https?://([^/:?#]+)', 1)), '\\.+$$', '') AS host,
              |         coalesce(regexp_extract(url,
              |           '(?i)^https?://[^/:?#]+:([0-9]+)', 1), '') AS port,
              |         coalesce(regexp_replace(regexp_extract(url,
              |           '(?i)^https?://[^/?#]+([^?#]*)', 1), '/+$$', ''), '') AS path1,
              |         coalesce(regexp_extract(url, '[?]([^#]*)', 1), '') AS q
              |  FROM u),
              |c2 AS (
              |  SELECT doc_id, url, scheme, host,
              |         CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
              |                OR (scheme = 'https' AND port = '443')
              |              THEN '' ELSE ':' || port END AS portc,
              |         CASE WHEN path1 = '' THEN '/' ELSE path1 END AS pathc,
              |         coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
              |           p -> p <> '' AND substr(p, 1, 4) <> 'utm_'
              |                AND substr(p, 1, 7) <> 'fbclid='
              |                AND substr(p, 1, 6) <> 'gclid=')), '&'), '') AS qc
              |  FROM c)
              |SELECT doc_id, url,
              |       scheme || '://' || host || portc || pathc ||
              |       CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS canon
              |FROM c2 ORDER BY doc_id, url""".stripMargin)),

    "domain_filter" -> QueryDef(domainFilter,
      Some(s"""$UrlsSqlCte,
              |b AS (SELECT * FROM (VALUES $blocklistValuesSql) AS t(domain)),
              |v AS (
              |  SELECT uu.doc_id, count(*) AS n_urls,
              |         CAST(sum(CASE WHEN b.domain IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
              |           AS n_blocked
              |  FROM uu LEFT JOIN b USING (domain) GROUP BY uu.doc_id)
              |SELECT d.doc_id, coalesce(v.n_urls, 0) AS n_urls,
              |       coalesce(v.n_blocked, 0) AS n_blocked,
              |       coalesce(v.n_blocked, 0) = 0 AS keep
              |FROM d LEFT JOIN v USING (doc_id) ORDER BY d.doc_id""".stripMargin))
  )
}

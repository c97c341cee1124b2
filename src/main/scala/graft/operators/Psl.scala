package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-Suffix-List registrable-domain extraction — the real thing the
  * r13 two-label simplification stood in for. A registrable domain is
  * one label more than the longest matching PUBLIC SUFFIX, under the
  * published PSL algorithm (publicsuffix.org/list/): among matching
  * rules an exception rule prevails (its public suffix is the rule minus
  * its leftmost label), otherwise the longest rule wins, a wildcard
  * `*.x` matching exactly one extra label, and an unlisted TLD falls to
  * the implicit `*` rule (public suffix = the last label). So
  * `a.b.example.co.uk → example.co.uk` (rule `co.uk`),
  * `shop.anything.ck → shop.anything.ck` (wildcard `*.ck`),
  * `sub.www.ck → www.ck` (exception `!www.ck`), and a host that IS a
  * public suffix has no registrable domain (null).
  *
  * The rule set here is a SMALL STATIC SLICE of the list (the list is
  * data, not logic — production swaps in the full ~9k-rule file without
  * touching either evaluation form below). One Scala value feeds all
  * three consumers — the literal Column form, the broadcast-join form,
  * and the DuckDB oracle fragment — so the engines can never drift on
  * rule content.
  *
  * Two evaluation forms, the charlm literal-vs-join pattern:
  *  - [[registrableDomain]]: pure Column algebra over literal IN-lists —
  *    NARROW (no join, no shuffle), composes into streaming micro-batch
  *    plans unchanged ([[WebOps.withDomainGate]]). Right for a shipped
  *    slice (≤ a few hundred rules in the plan).
  *  - [[withRegistrableDomainJoin]]: the same algorithm driven by three
  *    BROADCAST left equi-joins against a rule table — the shape for the
  *    full PSL, where thousands of literals in every plan would bloat
  *    codegen. Row-identical to the literal form on the shipped slice
  *    (pinned in WebSpec).
  *
  * Scale notes (100 TB): both forms are per-row; the join form's rule
  * table is KBs even for the full list (broadcast), and candidate
  * suffixes are computed in-row (no explode) — the corpus never
  * shuffles for domain resolution.
  */
object Psl {

  /** The shipped rule slice, raw PSL syntax: plain rules, `*.` wildcard
    * rules, `!` exception rules. Includes 4- and 5-label private-section
    * entries and a punycode TLD, so every chain depth the full list
    * needs ([[MaxRuleLabels]] = 5) is exercised; the same slice is
    * shipped in `.dat` wire format at `resources/graft/psl_slice.dat`
    * and [[loadSliceFile]] must round-trip it (WebSpec).
    */
  val Rules: Seq[String] = Seq(
    // generic TLDs
    "com", "org", "net", "io", "edu", "gov", "mil", "int", "info", "biz",
    "dev", "app", "ai", "co", "me", "tv", "cc", "xyz", "site", "online",
    // country TLDs (those with registrations at the apex)
    "de", "fr", "it", "nl", "se", "no", "es", "pl", "ru", "ch", "at",
    "be", "dk", "fi", "ie", "il", "kr", "tw", "sg", "hk", "us", "ca",
    "eu", "cz", "gr", "pt", "ro", "hu", "tr", "cl", "ar", "mx", "jp",
    "uk", "au", "br", "cn", "in", "nz", "za",
    // second-level public suffixes
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    // wildcard + exception (the canonical PSL pair)
    "*.ck", "!www.ck", "*.np",
    // punycode TLD (the IDN form the list actually stores: рф)
    "xn--p1ai",
    // deep private-section suffixes (the 4-5-label chains the full list
    // needs; real entries from publicsuffix.org)
    "cdn.prod.atlassian-dev.net",
    "s3.eu-west-2.amazonaws.com",
    "s3.dualstack.eu-west-2.amazonaws.com",
    "*.compute.amazonaws.com",
    // same-string normal + wildcard pair (real Platform.sh entries): the
    // rule-kind shape whose collapse the r15 ADVICE flagged — a host
    // EQUAL to the normal rule is a public suffix by the normal rule
    // (the wildcard only fires one label deeper). Shipped so the
    // DuckDB-oracled url_registrable key witnesses all three evaluation
    // forms (Column, broadcast-join, generated SQL) on the pair every
    // correctness run, not just in WebSpec's generated slice.
    "platformsh.site", "*.platformsh.site")

  /** Longest rule length the evaluation chains check (labels, wildcard
    * star included) — 5, the full list's maximum (round 15; was 3).
    */
  val MaxRuleLabels = 5

  private def labelCount(r: String): Int = r.count(_ == '.') + 1

  require(Rules.forall(labelCount(_) <= MaxRuleLabels),
    s"shipped rule slice exceeds MaxRuleLabels=$MaxRuleLabels — the evaluation " +
      "chains would silently never match the longer rules")

  // ---- public_suffix_list.dat loader (round 15) --------------------------

  /** Parses the real `public_suffix_list.dat` wire format into the rule
    * syntax [[Rules]] uses (`*.`-wildcards and `!`-exceptions preserved):
    * per publicsuffix.org/list/ — `//` comment lines and blank lines are
    * ignored, each other line is read up to the first whitespace, and
    * Unicode labels are stored lowercased in their IDN punycode (A-label)
    * form via `java.net.IDN.toASCII` (the list file itself carries
    * U-labels like `рф`; hosts are matched in A-label space). Section
    * markers (`===BEGIN ICANN DOMAINS===` etc.) are comments and fall out
    * naturally. The output feeds [[rulesDfFrom]] +
    * [[withRegistrableDomainJoin]] — the full ~9k-rule list is DATA on
    * the broadcast-join path, no recompilation.
    */
  def parseList(lines: Iterator[String]): Seq[String] = {
    def asciiLabel(l: String): String =
      if (l == "*" || l.forall(_ < 0x80)) l.toLowerCase(java.util.Locale.ROOT)
      else java.net.IDN.toASCII(l).toLowerCase(java.util.Locale.ROOT)
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.takeWhile(!_.isWhitespace))
      .filter(_.nonEmpty)
      .map { raw =>
        val (bang, rest) = if (raw.startsWith("!")) ("!", raw.drop(1)) else ("", raw)
        bang + rest.split('.').map(asciiLabel).mkString(".")
      }
      .toSeq
  }

  /** Parses a `.dat`-format stream (UTF-8). Caller owns the stream. */
  def parseList(in: java.io.InputStream): Seq[String] =
    parseList(scala.io.Source.fromInputStream(in, "UTF-8").getLines())

  /** The shipped slice serialized as a real `.dat` file
    * (`src/main/resources/graft/psl_slice.dat`, comments + section
    * markers + the U-label form of the punycode rule) — loading it must
    * reproduce [[Rules]] exactly (round-tripped in WebSpec), proving the
    * parser handles the wire format the full list arrives in.
    */
  def loadSliceFile(): Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/psl_slice.dat")
    require(in != null, "resource /graft/psl_slice.dat missing from the build")
    try parseList(in) finally in.close()
  }

  /** (normal rules, wildcard bases, exception rules) by label count —
    * the shape every consumer evaluates against, derivable from ANY rule
    * list (the shipped slice at compile time; a [[parseList]]-loaded
    * full list at run time for the join form).
    */
  private[graft] def splitRules(rules: Seq[String])
      : (Map[Int, Seq[String]], Map[Int, Seq[String]], Map[Int, Seq[String]]) = (
    rules.filterNot(r => r.startsWith("*.") || r.startsWith("!")).groupBy(labelCount),
    rules.filter(_.startsWith("*.")).map(_.drop(2)).groupBy(labelCount),
    rules.filter(_.startsWith("!")).map(_.drop(1)).groupBy(labelCount))

  /** Normal rules by label count (1-based index). */
  private[graft] val normalByLen: Map[Int, Seq[String]] = splitRules(Rules)._1
  /** Wildcard BASES (the part after `*.`) by base label count. */
  private[graft] val wildBaseByLen: Map[Int, Seq[String]] = splitRules(Rules)._2
  /** Exception rules (without `!`) by label count. */
  private[graft] val excByLen: Map[Int, Seq[String]] = splitRules(Rules)._3

  /** The last `k` dot-labels of the (already-split) host as one string;
    * when the host has fewer than k labels this yields the whole host,
    * which can never equal a k-label rule (label counts differ) — so no
    * explicit size guard is needed.
    */
  private def lastK(labels: Column, k: Int): Column =
    concat_ws(".", slice(labels, -k, k))

  private def inList(c: Column, vs: Seq[String]): Column =
    if (vs.isEmpty) lit(false) else c.isInCollection(vs)

  /** Public-suffix length (in labels) of a host, by the PSL algorithm:
    * exceptions first (their suffix is the rule minus its leftmost
    * label), then rules longest-first — a wildcard base of length b is a
    * rule of length b+1 — then the implicit `*`.
    */
  private[graft] def publicSuffixLen(labels: Column): Column =
    publicSuffixLenWith(labels, normalByLen, wildBaseByLen, excByLen)

  /** [[publicSuffixLen]] over an ARBITRARY rule list — the literal form
    * as a function of the list, so WebSpec can drive BOTH evaluation
    * forms over the same generated wide slice and assert row identity
    * (r15 verdict task 7). Production still prefers the join form past
    * a few hundred rules (plan-literal bloat), but the semantics must
    * agree wherever both run.
    */
  private[graft] def publicSuffixLenFrom(labels: Column, rules: Seq[String]): Column = {
    val (n, w, e) = splitRules(rules)
    publicSuffixLenWith(labels, n, w, e)
  }

  /** [[registrableDomain]] over an arbitrary rule list (literal form). */
  private[graft] def registrableDomainFrom(host: Column, rules: Seq[String]): Column = {
    val labels = split(host, "\\.")
    val psLen = publicSuffixLenFrom(labels, rules)
    when(size(labels) > psLen && length(host) > 0,
      concat_ws(".", slice(labels, -(psLen + lit(1)), psLen + lit(1))))
  }

  private def publicSuffixLenWith(labels: Column,
      normalByLen: Map[Int, Seq[String]], wildBaseByLen: Map[Int, Seq[String]],
      excByLen: Map[Int, Seq[String]]): Column = {
    // ascending folds wrap the LONGEST rule outermost, so it is checked
    // first — the PSL longest-match precedence
    val excChain = (1 to MaxRuleLabels).foldLeft(lit(null).cast("int")) {
      case (acc, k) => when(inList(lastK(labels, k), excByLen.getOrElse(k, Nil)),
        lit(k - 1)).otherwise(acc)
    }
    // rules of length L: normal rules with L labels, wildcard bases with
    // L-1 labels (the star matches one real label, so the host needs ≥ L)
    val ruleChain = (1 to MaxRuleLabels).foldLeft(lit(1)) { case (acc, l) =>
      val normalHit = inList(lastK(labels, l), normalByLen.getOrElse(l, Nil))
      val wildHit = inList(lastK(labels, l - 1), wildBaseByLen.getOrElse(l - 1, Nil)) &&
        size(labels) >= l
      when(normalHit || wildHit, lit(l)).otherwise(acc)
    }
    coalesce(excChain, ruleChain)
  }

  /** Registrable domain of a host Column (null when the host IS a public
    * suffix, is null, or is empty). Pure Column algebra — composes into
    * lambda positions (`transform`) and streaming plans unchanged.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val psLen = publicSuffixLen(labels)
    when(size(labels) > psLen && length(host) > 0,
      concat_ws(".", slice(labels, -(psLen + lit(1)), psLen + lit(1))))
  }

  /** The rule table for the broadcast-join form: `(rule, labels, kind)`
    * with kind ∈ normal | wild | exc; wildcard rows carry the BASE (the
    * part the host suffix must equal) and `labels` = base length.
    */
  def rulesDf(spark: SparkSession): DataFrame = rulesDfFrom(spark, Rules)

  /** [[rulesDf]] over an ARBITRARY rule list (e.g. the full
    * [[parseList]]-loaded `public_suffix_list.dat`) — the production
    * swap-in point: the join form + generated SQL treat the list as
    * data. Rules longer than [[MaxRuleLabels]] labels fail loudly here
    * (the evaluation chains would silently never match them).
    */
  def rulesDfFrom(spark: SparkSession, rules: Seq[String]): DataFrame = {
    import spark.implicits._
    val over = rules.filter(r => labelCount(r.stripPrefix("!")) > MaxRuleLabels)
    require(over.isEmpty,
      s"rules exceed MaxRuleLabels=$MaxRuleLabels label(s): ${over.take(5).mkString(", ")} — " +
        "the suffix chains stop there and would silently never match these")
    val (normal, wild, exc) = splitRules(rules)
    val rows =
      normal.toSeq.flatMap { case (k, rs) => rs.map(r => (r, k, "normal")) } ++
        wild.toSeq.flatMap { case (k, rs) => rs.map(r => (r, k, "wild")) } ++
        exc.toSeq.flatMap { case (k, rs) => rs.map(r => (r, k, "exc")) }
    // one row per (rule, labels, KIND): a real list can carry both `x`
    // and `*.x` (e.g. platformsh.site + *.platformsh.site), and both
    // kinds are load-bearing — the normal rule decides hosts EQUAL to x
    // (wild only fires one label deeper), so collapsing kinds diverges
    // from the literal publicSuffixLen form. Fan-out safety is the join
    // side's job: [[withRegistrableDomainJoin]] aggregates kinds into
    // per-(rule, labels) flags before joining.
    rows.distinct.toDF("rule", "labels", "kind")
  }

  /** Broadcast-join form: appends `out` (the registrable domain) to `d`
    * by LEFT-joining the host's last-k suffixes (k = 1..[[MaxRuleLabels]],
    * computed in-row, no explode) against a broadcast rule table, then
    * applying the same prevailing-rule chain as [[registrableDomain]].
    * Use when the rule table is the FULL PSL — thousands of literals
    * would bloat every plan, one broadcast table serves all queries.
    */
  def withRegistrableDomainJoin(d: DataFrame, hostCol: String,
      rules: DataFrame, out: String): DataFrame = {
    val labels = split(col(hostCol), "\\.")
    val withSufs = (1 to MaxRuleLabels).foldLeft(d.withColumn("__labels", labels)) {
      case (df, k) => df.withColumn(s"__suf$k", lastK(col("__labels"), k))
    }
    // one broadcast left join per suffix length; each may hit a normal
    // rule (labels = k), a wildcard base (labels = k), or an exception.
    // Kinds are aggregated into per-(rule, labels) FLAGS first: the rule
    // table may legitimately carry the same string as both a normal rule
    // and a wildcard base (x + *.x), and a host row must see both facts
    // without fanning out on the join.
    val flat = rules.groupBy("rule", "labels").agg(
      max(when(col("kind") === "normal", 1).otherwise(0)).as("kn"),
      max(when(col("kind") === "wild", 1).otherwise(0)).as("kw"),
      max(when(col("kind") === "exc", 1).otherwise(0)).as("ke"))
    val joined = (1 to MaxRuleLabels).foldLeft(withSufs) { case (df, k) =>
      val r = flat.filter(col("labels") === k)
        .select(col("rule").as(s"__r$k"), col("kn").as(s"__n$k"),
          col("kw").as(s"__w$k"), col("ke").as(s"__e$k"))
      df.join(broadcast(r), df(s"__suf$k") === col(s"__r$k"), "left")
    }
    def kindAt(k: Int, kind: String): Column = kind match {
      case "normal" => col(s"__n$k") === 1
      case "wild" => col(s"__w$k") === 1
      case _ => col(s"__e$k") === 1
    }
    // ascending folds wrap the longest rule outermost (checked first)
    val excChain = (1 to MaxRuleLabels).foldLeft(lit(null).cast("int")) {
      case (acc, k) => when(kindAt(k, "exc"), lit(k - 1)).otherwise(acc)
    }
    val ruleChain = (1 to MaxRuleLabels).foldLeft(lit(1)) { case (acc, l) =>
      val normalHit = kindAt(l, "normal")
      val wildHit = if (l >= 2) kindAt(l - 1, "wild") && size(col("__labels")) >= l
      else lit(false)
      when(normalHit || wildHit, lit(l)).otherwise(acc)
    }
    val psLen = coalesce(excChain, ruleChain)
    val dom = when(size(col("__labels")) > psLen && length(col(hostCol)) > 0,
      concat_ws(".", slice(col("__labels"), -(psLen + lit(1)), psLen + lit(1))))
    val cleanup = Seq("__labels") ++ (1 to MaxRuleLabels).flatMap(k =>
      Seq(s"__suf$k", s"__r$k", s"__n$k", s"__w$k", s"__e$k"))
    joined.withColumn(out, dom).drop(cleanup: _*)
  }

  /** DuckDB CASE expression computing the same registrable domain from a
    * host SQL expression — generated from the SAME rule slice, for
    * oracle SQL. `hostE` must be a simple column reference (it is
    * repeated several times).
    */
  def sqlRegistrableDomain(hostE: String): String = {
    val ls = s"string_split($hostE, '.')"
    val n = s"len($ls)"
    def lastK(k: Int) = s"array_to_string($ls[greatest($n - ${k - 1}, 1):$n], '.')"
    def inL(e: String, vs: Seq[String]) =
      if (vs.isEmpty) "FALSE" else s"$e IN (${vs.map(v => s"'$v'").mkString(", ")})"
    val excCases = (MaxRuleLabels to 1 by -1).flatMap { k =>
      excByLen.get(k).map(vs => s"WHEN ${inL(lastK(k), vs)} THEN ${k - 1}")
    }
    val ruleCases = (MaxRuleLabels to 1 by -1).flatMap { l =>
      val n1 = normalByLen.get(l).map(vs => inL(lastK(l), vs))
      val w1 = wildBaseByLen.get(l - 1).map(vs => s"(${inL(lastK(l - 1), vs)} AND $n >= $l)")
      val conds = (n1.toSeq ++ w1.toSeq)
      if (conds.isEmpty) None else Some(s"WHEN ${conds.mkString(" OR ")} THEN $l")
    }
    val psLen = s"CASE ${(excCases ++ ruleCases).mkString(" ")} ELSE 1 END"
    s"""CASE WHEN $n > ($psLen) AND length($hostE) > 0
       |     THEN array_to_string($ls[$n - ($psLen):$n], '.') END""".stripMargin
  }
}

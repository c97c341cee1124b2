package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY §2 Table B X-ops): scans, filters, hash and
  * broadcast joins, multi-joins, semi/anti joins, window functions, top-k,
  * set operations, rollup, distinct counting, tumbling buckets, JSON
  * extraction.
  *
  * Scale notes (100 TB): every query is declarative Column algebra, so
  * Catalyst gets predicate pushdown + column pruning into the parquet scans
  * for free. Small dimensions (`nation`, `region`) are explicitly
  * `broadcast()` so the big fact-side joins never shuffle the fact table on
  * the dimension key. Aggregations are hash aggs with map-side partial
  * aggregation; `sort_topk` compiles to TakeOrderedAndProject (no global
  * sort). Floating-point aggregates use exact decimal accumulation ([[Num]])
  * so results are bit-stable across engines and summation orders.
  */
object RelationalOps {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables(spark, sfDir, name)

  /** Oracle-side normalization of events.ts (TIMESTAMP_NS -> µs). */
  private val evCte =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  // ---- scans / filters ---------------------------------------------------

  /** A2: parquet scan + derived-column projection. */
  private def ingestScan(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  /** A5/A7: predicate filter + projection; predicates push to the scan. */
  private def filterProject(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_discount") > 0.05 && col("l_quantity") < 25)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- aggregation -------------------------------------------------------

  /** TPC-H Q1-style multi-aggregate (hash agg, partial + final). */
  private def aggGroup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base"),
        Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact + HLL cardinality per key. The exact `countDistinct` is the
    * oracle-checked column; the HLL sketch value itself is not
    * cross-engine-comparable (Spark HLL++ vs DuckDB HLL produce different
    * estimates), so the oracle-visible column is `approx_ok` — each engine
    * checks its OWN sketch against its exact count at the default ±5% rsd
    * (asserted here at 10% slack); the raw estimate is tolerance-asserted
    * in QueriesSpec. At 100 TB the approx path is the production one:
    * exact distinct shuffles the whole key set, HLL partial-aggregates a
    * constant-size sketch.
    */
  private[graft] def distinctCountRaw(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"))

  private def distinctCount(spark: SparkSession, sfDir: String): DataFrame =
    distinctCountRaw(spark, sfDir)
      .select(col("event_type"), col("n_users"), col("n_events"),
        (abs(col("approx_users") - col("n_users")) <= col("n_users") * 0.1).as("approx_ok"))
      .orderBy("event_type")

  /** The skew-salting pattern, oracle-verified equal to [[aggGroup]]:
    * phase 1 groups by (key, salt16) so a pathologically hot key spreads
    * over 16 reducers; phase 2 re-aggregates the (|keys| × 16)-row result
    * by key alone. Decimal accumulation keeps both phases bit-exact, so
    * the salted plan is value-identical to the direct one — which is the
    * point: salting must be a pure physical rewrite. (lineitem's 6-value
    * returnflag×linestatus grouping IS the canonical skewed-key shape: at
    * 100 TB a direct groupBy funnels the table into 6 reducers.)
    */
  private def aggSalted(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy("l_returnflag", "l_linestatus", "salt")
      .agg(
        sum(col("l_quantity").cast("decimal(18,6)")).as("qty_d"),
        sum(col("l_extendedprice").cast("decimal(18,6)")).as("price_d"),
        count(lit(1)).as("n"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty_d").cast("double").as("sum_qty"),
        sum("price_d").cast("double").as("sum_base"),
        sum("n").as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact interpolated percentiles (both engines use the same
    * lower + (higher-lower)*frac definition, so values hash-match) plus a
    * t-digest/KLL approx sketch each engine validates against its own
    * exact value (`approx_ok`, same pattern as `distinct_count`) — at
    * 100 TB the sketch is the production path: exact percentile sorts the
    * group, the sketch partial-aggregates a constant-size summary.
    */
  private def quantiles(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5D)").as("p50"),
        expr("percentile(value, 0.95D)").as("p95"),
        count(lit(1)).as("n"),
        (abs(expr("approx_percentile(value, 0.5D)") - expr("percentile(value, 0.5D)"))
          <= abs(expr("percentile(value, 0.5D)")) * 0.05).as("approx_ok"))
      .orderBy("event_type")

  /** Event counts pivoted to one column per type (explicit value list —
    * dynamic pivot would need a driver-side distinct): compiles to a
    * single hash aggregation with conditional counts, one shuffle on
    * user_id. Missing combinations coalesce to 0 to match the
    * conditional-count oracle.
    */
  private val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  private def pivotCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "events")
      .groupBy("user_id")
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
    p.select(col("user_id") +: PivotTypes.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
      .orderBy("user_id")
  }

  /** A16 analog: min/avg/max/count per key. */
  private def pingRtt(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        min("value").as("min_v"),
        Num.davg(col("value")).as("avg_v"),
        max("value").as("max_v"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  // ---- joins -------------------------------------------------------------

  private def joinHash(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), Num.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Same shape against small dims with an explicit broadcast hint — at
    * 100 TB the fact side never shuffles; the dims replicate.
    */
  private def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val n = t(spark, sfDir, "nation")
    val r = t(spark, sfDir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), Num.dsum(col("c_acctbal")).as("acctbal"))
      .orderBy("r_name", "n_name")
  }

  /** Skew-robust inner equi-join — the planned form of the hot-key
    * split, the join-side sibling of `agg_salted`'s two-phase
    * aggregation. Hot keys are detected EXACTLY (a per-key count on the
    * fact side — one partial-agg'd scan, the CBO-statistics analog, not
    * a sample that can miss a hot key); fact rows with hot keys join
    * against a BROADCAST of just the dim rows matching those keys, so no
    * shuffle partition ever receives a hot key's row flood; cold rows
    * take the ordinary shuffled path; the branches union. Semantically
    * identical to the plain inner join by construction — the two
    * branches partition the fact table by hot-set membership — which is
    * exactly what the oracle checks (the DuckDB side runs the PLAIN
    * join).
    *
    * At 100 TB: AQE's runtime skew split (`skewJoin.enabled`) already
    * rebalances sort-merge partitions after the fact; this planned form
    * is for the case AQE cannot fix — a key so hot its rows overwhelm
    * any single partition BEFORE the first shuffle materializes, where
    * the only winning move is to never shuffle those rows at all. The
    * hot-key set is |keys over threshold| rows — broadcastable by
    * definition (a key set too large to broadcast is not skew, it is
    * uniform load).
    */
  private[graft] def saltedSkewJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, hotThreshold: Long): DataFrame = {
    val hot = fact.groupBy(factKey).count()
      .filter(col("count") > hotThreshold)
      .select(col(factKey).as("__hot_key"))
    val factHot = fact.join(broadcast(hot), col(factKey) === col("__hot_key"))
      .drop("__hot_key")
    val factCold = fact.join(broadcast(hot), col(factKey) === col("__hot_key"), "left_anti")
    val dimHot = dim.join(broadcast(hot), col(dimKey) === col("__hot_key"))
      .drop("__hot_key")
    factHot.join(broadcast(dimHot), col(factKey) === col(dimKey))
      .unionByName(factCold.join(dim, col(factKey) === col(dimKey)))
  }

  /** Declared consumer: per-user event rollup joined to customer
    * attributes through [[saltedSkewJoin]] (threshold 80 splits the
    * events table's heaviest users onto the broadcast path at every sf —
    * both branches are exercised). The double `value` sum is quantized
    * to bigint BEFORE aggregating (floor-scaled — partition-order-
    * independent and tie-free, the `embed_centroid` discipline), so the
    * result hash-matches the single-threaded oracle exactly.
    */
  private def joinSkew(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events").select(col("user_id"), col("value"))
    val cust = t(spark, sfDir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    saltedSkewJoin(ev, cust, "user_id", "c_custkey", hotThreshold = 80L)
      .groupBy("user_id", "c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 1e9) AS BIGINT)")).as("value_q"))
      .orderBy("user_id")
  }

  /** TPC-H Q5-style 5-way join with region filter. */
  private def joinMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    val s = t(spark, sfDir, "supplier")
    val n = t(spark, sfDir, "nation")
    val r = t(spark, sfDir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "ASIA"
        && o("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && o("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  private def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders").select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  private def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders").select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---- windows / sort ----------------------------------------------------

  private def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  private def windowLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, sfDir, "events")
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .select("user_id", "event_id", "ts", "gap_us")
      .orderBy("user_id", "ts", "event_id")
  }

  /** Global top-k — compiles to TakeOrderedAndProject, not a full sort. */
  private def sortTopk(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(10)

  // ---- set ops / rollup --------------------------------------------------

  private def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val buyers = t(spark, sfDir, "orders").select(col("o_custkey").as("c_custkey")).distinct()
    val highbal = t(spark, sfDir, "customer").filter(col("c_acctbal") > 5000).select("c_custkey")
    def tag(df: DataFrame, op: String) = df.select(lit(op).as("op"), col("c_custkey"))
    tag(buyers.union(highbal).distinct(), "union")
      .union(tag(buyers.except(highbal), "except"))
      .union(tag(buyers.intersect(highbal), "intersect"))
      .orderBy("op", "c_custkey")
  }

  private def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    val n = t(spark, sfDir, "nation")
    val r = t(spark, sfDir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"), col("o_totalprice").as("price"))
      // Rollup implemented as fine-grained agg + re-aggregation of the tiny
      // result instead of Dataset.rollup: (a) Spark's Expand-based rollup
      // would push the fact stream through the shuffle 3x (one copy per
      // grouping set) — re-agg touches only |region x nation| rows; (b) the
      // Expand node trips Spark's ambiguous-column check after multi-joins.
      // Decimal sums stay exact through the re-aggregation.
      .groupBy("region", "nation")
      .agg(sum(col("price").cast("decimal(18,6)")).as("rev_d"), count(lit(1)).as("n_orders")) match { case fine =>
        // `fine` appears in all three branches with an identical subplan, so
        // the physical plan shares one shuffle via ReuseExchange — the scan +
        // joins + partial agg execute once.
        val lvl2 = fine.select(col("region"), col("nation"), col("rev_d"), col("n_orders"))
        val lvl1 = fine.groupBy("region")
          .agg(sum("rev_d").as("rev_d"), sum("n_orders").as("n_orders"))
          .select(col("region"), lit("ALL").as("nation"), col("rev_d"), col("n_orders"))
        val lvl0 = fine.groupBy()
          .agg(sum("rev_d").as("rev_d"), sum("n_orders").as("n_orders"))
          .select(lit("ALL").as("region"), lit("ALL").as("nation"), col("rev_d"), col("n_orders"))
        lvl2.union(lvl1).union(lvl0)
          .select(col("region"), col("nation"),
            col("rev_d").cast("double").as("revenue"), col("n_orders"))
          .orderBy("region", "nation")
      }
  }

  /** CUBE over (region, nation) via the same fine-agg + re-aggregation
    * pattern as [[rollupRevenue]]: the fact stream shuffles ONCE into the
    * |region × nation| fine grid (shared across all four branches via
    * ReuseExchange), and the three coarser grouping sets re-aggregate that
    * tiny result — vs Spark's Expand-based cube, which would push every
    * fact row through the shuffle 4×. Decimal sums stay exact through the
    * re-aggregation, so all levels are bit-consistent.
    */
  private def cubeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    val n = t(spark, sfDir, "nation")
    val r = t(spark, sfDir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"), col("o_totalprice").as("price"))
      .groupBy("region", "nation")
      .agg(sum(col("price").cast("decimal(18,6)")).as("rev_d"), count(lit(1)).as("n_orders")) match { case fine =>
        val both = fine.select(col("region"), col("nation"), col("rev_d"), col("n_orders"))
        val byRegion = fine.groupBy("region")
          .agg(sum("rev_d").as("rev_d"), sum("n_orders").as("n_orders"))
          .select(col("region"), lit("ALL").as("nation"), col("rev_d"), col("n_orders"))
        val byNation = fine.groupBy("nation")
          .agg(sum("rev_d").as("rev_d"), sum("n_orders").as("n_orders"))
          .select(lit("ALL").as("region"), col("nation"), col("rev_d"), col("n_orders"))
        val grand = fine.groupBy()
          .agg(sum("rev_d").as("rev_d"), sum("n_orders").as("n_orders"))
          .select(lit("ALL").as("region"), lit("ALL").as("nation"), col("rev_d"), col("n_orders"))
        both.union(byRegion).union(byNation).union(grand)
          .select(col("region"), col("nation"),
            col("rev_d").cast("double").as("revenue"), col("n_orders"))
          .orderBy("region", "nation")
      }
  }

  // ---- time buckets / json ----------------------------------------------

  /** Time-RANGE window frame: per-user sliding 5-minute sum — every event
    * sees the exact-decimal sum of its user's values in the trailing 300 s
    * (rangeBetween on unix_micros, which DuckDB mirrors with RANGE
    * INTERVAL). Unlike rowsBetween this is value-based, so it is the
    * batch analog of a sliding stream window.
    */
  private def windowRange(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-300000000L, 0L)
    t(spark, sfDir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("sliding_5m",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select("user_id", "event_id", "ts", "sliding_5m")
      .orderBy("user_id", "ts", "event_id")
  }

  /** Batch analog of a streaming tumbling window (1 hour). */
  private def windowTumbling(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .orderBy("hour")

  /** Interval-containment range join via granule bucketing — the pattern
    * that keeps a range join off the nested-loop path: 48 deliberately
    * hour-MISaligned windows (5.5 h stride, 4.75 h length, derived from
    * the stream's min ts inside the query so both engines see identical
    * intervals) are exploded to the hour granules they cover; events map
    * narrowly to their own hour granule; the join is then a plain EQUI
    * join on the granule plus a residual bounds filter. Here the tiny
    * window side broadcasts; at millions of intervals the same plan
    * becomes a shuffled equi-join on the granule — either way no
    * BroadcastNestedLoopJoin over a theta condition, which is what a
    * naive `ts BETWEEN start AND end` join plans.
    */
  private def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val strideUs = 19800000000L // 5.5 h
    val lenUs = 17100000000L // 4.75 h
    val e = t(spark, sfDir, "events")
      .select(col("event_id"), col("value"), unix_micros(col("ts")).as("us"))
    val wins = e.agg(min("us").as("min_us"))
      .select(explode(sequence(lit(0), lit(47))).as("window_id"), col("min_us"))
      .select(col("window_id"),
        (col("min_us") + col("window_id") * strideUs).as("w_start"),
        (col("min_us") + col("window_id") * strideUs + lenUs).as("w_end"))
    val winGranules = wins.withColumn("g",
      explode(sequence(floor(col("w_start") / hourUs), floor((col("w_end") - 1) / hourUs))))
    e.withColumn("g", floor(col("us") / hourUs))
      .join(broadcast(winGranules), "g")
      .filter(col("us") >= col("w_start") && col("us") < col("w_end"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .orderBy("window_id")
  }

  private def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), avg("k").as("avg_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  // ---- declarations ------------------------------------------------------

  val defs: Map[String, QueryDef] = Map(
    "ingest_scan" -> QueryDef(ingestScan,
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_extendedprice * (1 - l_discount) AS revenue
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    "filter_project" -> QueryDef(filterProject,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05 AND l_quantity < 25
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    "agg_group" -> QueryDef(aggGroup,
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
             |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "distinct_count" -> QueryDef(distinctCount,
      Some(s"""$evCte
              |SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              |       count(*) AS n_events,
              |       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
              |         <= count(DISTINCT user_id) * 0.1 AS approx_ok
              |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "agg_salted" -> QueryDef(aggSalted,
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "quantiles" -> QueryDef(quantiles,
      Some(s"""$evCte
              |SELECT event_type,
              |       quantile_cont(value, 0.5) AS p50,
              |       quantile_cont(value, 0.95) AS p95,
              |       count(*) AS n,
              |       abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
              |         <= abs(quantile_cont(value, 0.5)) * 0.05 AS approx_ok
              |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "pivot_counts" -> QueryDef(pivotCounts,
      Some(s"""$evCte
              |SELECT user_id,
              |       count(*) FILTER (WHERE event_type = 'click') AS click,
              |       count(*) FILTER (WHERE event_type = 'error') AS error,
              |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
              |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
              |       count(*) FILTER (WHERE event_type = 'view') AS view
              |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "ping_rtt" -> QueryDef(pingRtt,
      Some(s"""$evCte
              |SELECT event_type, min(value) AS min_v,
              |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_v,
              |       max(value) AS max_v, count(*) AS n
              |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "join_hash" -> QueryDef(joinHash,
      Some("""SELECT c_mktsegment, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "join_broadcast" -> QueryDef(joinBroadcast,
      Some("""SELECT r_name, n_name, count(*) AS n_cust, CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    "join_multi" -> QueryDef(joinMulti,
      Some("""SELECT n_name, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    "join_skew" -> QueryDef(joinSkew,
      Some("""SELECT e.user_id, c.c_mktsegment, count(*) AS n_events,
             |       CAST(sum(CAST(floor(e.value * 1e9) AS BIGINT)) AS BIGINT) AS value_q
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2
             |ORDER BY e.user_id""".stripMargin)),

    "join_semi" -> QueryDef(joinSemi,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    "join_anti" -> QueryDef(joinAnti,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    "window_rank" -> QueryDef(windowRank,
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    "window_lag" -> QueryDef(windowLag,
      Some(s"""$evCte
              |SELECT user_id, event_id, ts,
              |       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              |FROM ev ORDER BY user_id, ts, event_id""".stripMargin)),

    "sort_topk" -> QueryDef(sortTopk,
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    "set_ops" -> QueryDef(setOps,
      Some("""WITH buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
             |     highbal AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
             |SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM buyers UNION SELECT c_custkey FROM highbal)
             |UNION ALL
             |SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM buyers EXCEPT SELECT c_custkey FROM highbal)
             |UNION ALL
             |SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM buyers INTERSECT SELECT c_custkey FROM highbal)
             |ORDER BY op, c_custkey""".stripMargin)),

    "rollup_revenue" -> QueryDef(rollupRevenue,
      Some("""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue, count(*) AS n_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)
             |ORDER BY region, nation""".stripMargin)),

    "cube_revenue" -> QueryDef(cubeRevenue,
      Some("""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue, count(*) AS n_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY CUBE(r_name, n_name)
             |ORDER BY region, nation""".stripMargin)),

    "window_range" -> QueryDef(windowRange,
      Some(s"""$evCte
              |SELECT user_id, event_id, ts,
              |       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
              |         PARTITION BY user_id ORDER BY epoch_us(ts)
              |         RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_5m
              |FROM ev ORDER BY user_id, ts, event_id""".stripMargin)),

    "window_tumbling" -> QueryDef(windowTumbling,
      Some(s"""$evCte
              |SELECT date_trunc('hour', ts) AS hour, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
              |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin)),

    "range_join" -> QueryDef(rangeJoin,
      Some(s"""$evCte, b AS (SELECT min(epoch_us(ts)) AS min_us FROM ev),
              |wins AS (
              |  SELECT i AS window_id,
              |         min_us + i * 19800000000 AS w_start,
              |         min_us + i * 19800000000 + 17100000000 AS w_end
              |  FROM b, (SELECT unnest(generate_series(0, 47)) AS i))
              |SELECT w.window_id, count(*) AS n,
              |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
              |FROM wins w JOIN ev e
              |  ON epoch_us(e.ts) >= w.w_start AND epoch_us(e.ts) < w.w_end
              |GROUP BY w.window_id ORDER BY w.window_id""".stripMargin)),

    "json_extract" -> QueryDef(jsonExtract,
      Some(s"""$evCte
              |SELECT event_type,
              |       CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
              |       avg(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS avg_k,
              |       count(*) AS n
              |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}

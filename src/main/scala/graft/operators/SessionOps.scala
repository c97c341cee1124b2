package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's keyed-session semantics (SURVEY Table A rows A8-A13,
  * A18) replayed over the `events` table: at-most-once dedup (seq equality
  * check, `transf_server.cpp:273`), ordered reassembly + running written
  * counter (`transf_server.cpp:275-294`), RECEIVED/DONE ack generation
  * (`transf_server.cpp:295-326`), TTL expiry (`transf_server.cpp:78-131`),
  * the session state machine (`transf_server.cpp:49-70`), and the progress
  * percentage with repeat suppression (`transf_client.cpp:138-146`).
  *
  * Scale notes: every op shuffles once on `user_id` (the session key) and
  * stays there — windows and groupBys share that partitioning. Window
  * cumulative sums use exact decimal accumulation (see [[Num]]): DuckDB
  * evaluates window aggregates with segment trees (pairwise order), so
  * float prefix sums are NOT cross-engine-stable, decimals are.
  */
object SessionOps {

  private def ev(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")

  private val evCte =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  private def w = Window.partitionBy("user_id").orderBy("ts", "event_id")
  private def wAll = Window.partitionBy("user_id")

  // ---- queries -----------------------------------------------------------

  /** A9: at-most-once — first event per (user, type) by (ts, event_id).
    * Deterministic row_number, not dropDuplicates (which keeps an arbitrary
    * row and would not be oracle-stable).
    */
  private def dedupSession(spark: SparkSession, sfDir: String): DataFrame = {
    val wd = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ev(spark, sfDir)
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  /** A10: ordered reassembly — per-user journey string in (ts, event_id)
    * order; batch analog of the server's running-offset append.
    */
  private def reassembleOrdered(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        concat_ws("|",
          expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"))
          .as("journey"))
      .orderBy("user_id")

  /** A10: the `info.written` running counter — exact-decimal prefix sum. */
  private def runningTotal(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .withColumn("running",
        sum(col("value").cast("decimal(18,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select("user_id", "event_id", "ts", "running")
      .orderBy("user_id", "ts", "event_id")

  /** A11: RECEIVED/DONE ack per ordered event with next_seq = seq+1. */
  private def ackReply(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .select(
        col("user_id"), col("event_id"),
        (col("rn") + 1).cast("long").as("next_seq"),
        when(col("rn") === col("cnt"), "DONE").otherwise("RECEIVED").as("ack"))
      .orderBy("user_id", "next_seq")

  /** A13: TTL expiry — sessions idle > 20 s (reference default,
    * `transf_server.cpp:653-655`) before the stream's global max time.
    */
  private def ttlExpire(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ev(spark, sfDir)
    val perUser = e.groupBy("user_id").agg(max("ts").as("last_ts"))
    val global = e.agg(max("ts").as("gmax"))
    perUser.crossJoin(broadcast(global))
      .select(col("user_id"), col("last_ts"),
        (unix_micros(col("gmax")) - unix_micros(col("last_ts")) > 20000000L).as("expired"))
      .orderBy("user_id")
  }

  /** A8+A11: session state machine replay from event counts. */
  private def sessionState(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        count(lit(1)).as("n_events"))
      .withColumn("state",
        when(col("n_purchase") > 0, "DONE")
          .when(col("n_click") > 0, "TRANSFERING")
          .when(col("n_signup") > 0, "HANDSHAKE")
          .otherwise("IDLE"))
      .orderBy("user_id")

  /** A18: integer progress percent + suppress-repeat flag via lag. */
  private def progressRate(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .withColumn("rate", expr("rn * 100 div cnt"))
      .withColumn("changed",
        coalesce(col("rate") =!= lag("rate", 1).over(w), lit(true)))
      .select(col("user_id"), col("event_id"), col("rn").cast("long").as("seq"),
        col("rate"), col("changed"))
      .orderBy("user_id", "seq")

  /** As-of join — the time-series join Spark lacks natively: every
    * `purchase` event picks up the value of the most recent `view` at or
    * before it (per user, ties by event_id). Implemented with the
    * union + `last(_, ignoreNulls)` carry-forward idiom: both sides union
    * into ONE stream, sort per user by (ts, side, event_id) inside a
    * single window, and the view value propagates forward — one shuffle
    * on the session key, no range join, no per-row probe. The naive
    * alternative (non-equi theta join + argmax) explodes quadratically;
    * this form is linear in the union and is the scale-correct as-of.
    */
  private def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ev(spark, sfDir)
    // the carried view is ONE struct (id + value travel together): two
    // independent last(ignoreNulls) columns could split across rows when
    // a view's value is NULL — the struct is null exactly on non-view
    // rows, so ignoreNulls lands on the newest view row as a unit
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"),
        struct(col("event_id").as("view_id"), col("value").as("view_value")).as("v"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"),
        lit(null).cast("struct<view_id:bigint,view_value:double>").as("v"))
    // views sort before purchases at equal ts (side 0 < 1), so "at or
    // before" includes same-timestamp views; among tied views the largest
    // event_id wins, matching the oracle's ORDER BY ts DESC, event_id DESC
    val w = Window.partitionBy("user_id").orderBy("ts", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.union(purchases)
      .withColumn("lastv", last("v", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("lastv.view_id").as("last_view_id"), col("lastv.view_value").as("last_view_value"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** 30-min-gap sessionization (windowed gap-flag prefix sum idiom). */
  private def windowSession(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("start_ts"), max("ts").as("end_ts"))
      .orderBy("user_id", "session_id")

  // ---- declarations ------------------------------------------------------

  val defs: Map[String, QueryDef] = Map(
    "dedup_session" -> QueryDef(dedupSession,
      Some(s"""$evCte
              |SELECT user_id, event_type, event_id, ts FROM (
              |  SELECT user_id, event_type, event_id, ts,
              |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
              |  FROM ev) WHERE rn = 1
              |ORDER BY user_id, event_type""".stripMargin)),

    "reassemble_ordered" -> QueryDef(reassembleOrdered,
      Some(s"""$evCte
              |SELECT user_id, count(*) AS n_events,
              |       string_agg(event_type, '|' ORDER BY ts, event_id) AS journey
              |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "running_total" -> QueryDef(runningTotal,
      Some(s"""$evCte
              |SELECT user_id, event_id, ts,
              |       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
              |         PARTITION BY user_id ORDER BY ts, event_id
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
              |FROM ev ORDER BY user_id, ts, event_id""".stripMargin)),

    "ack_reply" -> QueryDef(ackReply,
      Some(s"""$evCte
              |SELECT user_id, event_id, rn + 1 AS next_seq,
              |       CASE WHEN rn = cnt THEN 'DONE' ELSE 'RECEIVED' END AS ack
              |FROM (
              |  SELECT user_id, event_id,
              |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
              |         count(*) OVER (PARTITION BY user_id) AS cnt
              |  FROM ev)
              |ORDER BY user_id, next_seq""".stripMargin)),

    "ttl_expire" -> QueryDef(ttlExpire,
      Some(s"""$evCte
              |SELECT u.user_id, u.last_ts,
              |       (epoch_us(g.gmax) - epoch_us(u.last_ts) > 20000000) AS expired
              |FROM (SELECT user_id, max(ts) AS last_ts FROM ev GROUP BY user_id) u,
              |     (SELECT max(ts) AS gmax FROM ev) g
              |ORDER BY u.user_id""".stripMargin)),

    "session_state" -> QueryDef(sessionState,
      Some(s"""$evCte
              |SELECT user_id,
              |       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
              |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
              |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
              |       count(*) AS n_events,
              |       CASE WHEN count(*) FILTER (WHERE event_type = 'purchase') > 0 THEN 'DONE'
              |            WHEN count(*) FILTER (WHERE event_type = 'click') > 0 THEN 'TRANSFERING'
              |            WHEN count(*) FILTER (WHERE event_type = 'signup') > 0 THEN 'HANDSHAKE'
              |            ELSE 'IDLE' END AS state
              |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "progress_rate" -> QueryDef(progressRate,
      Some(s"""$evCte, numbered AS (
              |  SELECT user_id, event_id,
              |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
              |         count(*) OVER (PARTITION BY user_id) AS cnt
              |  FROM ev),
              |rated AS (
              |  SELECT user_id, event_id, CAST(rn AS BIGINT) AS seq, (rn * 100) // cnt AS rate
              |  FROM numbered)
              |SELECT user_id, event_id, seq, rate,
              |       coalesce(rate <> lag(rate) OVER (PARTITION BY user_id ORDER BY seq), TRUE) AS changed
              |FROM rated
              |ORDER BY user_id, seq""".stripMargin)),

    "asof_join" -> QueryDef(asofJoin,
      Some(s"""$evCte
              |SELECT p.user_id, p.event_id, p.ts,
              |       (SELECT v.event_id FROM ev v
              |        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
              |        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_id,
              |       (SELECT v.value FROM ev v
              |        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
              |        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_value
              |FROM ev p WHERE p.event_type = 'purchase'
              |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin)),

    "window_session" -> QueryDef(windowSession,
      Some(s"""$evCte, flags AS (
              |  SELECT user_id, ts, event_id,
              |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              |                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              |              THEN 1 ELSE 0 END AS new_sess
              |  FROM ev),
              |sess AS (
              |  SELECT user_id, ts,
              |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              |  FROM flags)
              |SELECT user_id, session_id, count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
              |FROM sess GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin))
  )
}

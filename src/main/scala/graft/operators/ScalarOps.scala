package graft.operators

import graft.QueryDef
import graft.functions.FmtSize
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function operators from the reference's utility layer: IP
  * validation + ip:port formatting (`src/network.cpp:885-920`), the
  * brute-force nearest-color search with redmean distance
  * (`src/ansi.tpp:339-363`), and HSL→RGB conversion (`src/ansi.tpp:365-402`).
  *
  * The redmean distance is re-expressed in exact integer math (×512):
  * 512·d = (1024 + (r+R))·dr² + 2048·dg² + (1534 − (r+R))·db², which
  * preserves the argmin and makes the oracle comparison exact.
  *
  * Scale notes: `color_nearest` is a broadcast nested-loop join against a
  * 16-row palette — the fact side streams, and the per-key argmin is a
  * `min(struct(...))` partial aggregation that combines map-side to one
  * row per key before any exchange. This is the archetype for brute-force
  * kNN (VectorOps.knn_cosine): N×K compare with broadcast small side and
  * an agg-based argmin/argmax, never a window over the exploded rows.
  */
object ScalarOps {

  /** The 16 SYSTEM palette entries, MAP_256C[0..15] (`src/ansi.tpp:81-96`). */
  val SystemPalette: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 0, 0), (128, 0, 0, 1), (0, 128, 0, 2), (128, 128, 0, 3),
    (0, 0, 128, 4), (128, 0, 128, 5), (0, 128, 128, 6), (192, 192, 192, 7),
    (128, 128, 128, 8), (255, 0, 0, 9), (0, 255, 0, 10), (255, 255, 0, 11),
    (0, 0, 255, 12), (255, 0, 255, 13), (0, 255, 255, 14), (255, 255, 255, 15))

  private val paletteValuesSql: String =
    SystemPalette.map { case (r, g, b, c) => s"($r, $g, $b, $c)" }.mkString(", ")

  /** MAP_256C[16..255] — the range the reference's
    * `find_closest_color_code` actually scans (`src/ansi.tpp:351-363`;
    * it starts at 16 because terminal emulators redefine the SYSTEM
    * entries): codes 16-231 are the standard xterm 6×6×6 cube over
    * channel values {0,95,135,175,215,255} (code = 16 + 36·ri + 6·gi +
    * bi), codes 232-255 the grayscale ramp v = 8 + 10·(code−232).
    * COMPUTED from the defining formula — public xterm data, identical
    * entry for entry to the reference's table (spot-pinned in
    * QueriesSpec against `src/ansi.tpp:97-337` values).
    */
  val ExtendedPalette: Seq[(Int, Int, Int, Int)] = {
    val vals = IndexedSeq(0, 95, 135, 175, 215, 255)
    val cube = for {
      ri <- 0 until 6; gi <- 0 until 6; bi <- 0 until 6
    } yield (vals(ri), vals(gi), vals(bi), 16 + 36 * ri + 6 * gi + bi)
    val gray = (0 until 24).map(i => (8 + 10 * i, 8 + 10 * i, 8 + 10 * i, 232 + i))
    cube ++ gray
  }

  private val extendedPaletteValuesSql: String =
    ExtendedPalette.map { case (r, g, b, c) => s"($r, $g, $b, $c)" }.mkString(", ")

  // ---- validate_ip_port (A26, A27) --------------------------------------

  /** IPv4 octet: 0-255, no leading zeros — `inet_pton(AF_INET, ...)`
    * semantics (`src/network.cpp:885-905` delegates to inet_pton, which
    * rejects out-of-range octets and leading zeros).
    */
  private val OctRe = "(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9][0-9]|[0-9])"
  private[graft] val V4Re = s"^$OctRe(\\.$OctRe){3}$$"

  /** Full IPv6 grammar (hex groups + one `::` compression at any position;
    * embedded-IPv4 tails excluded — the reference never formats them):
    * the standard 9-branch alternation equivalent to
    * `inet_pton(AF_INET6, ...)` acceptance for pure-hex addresses.
    */
  private[graft] val V6Re = {
    val h = "[0-9A-Fa-f]{1,4}"
    s"^(($h:){7}$h|($h:){1,7}:|($h:){1,6}:$h|($h:){1,5}(:$h){1,2}|($h:){1,4}(:$h){1,3}" +
      s"|($h:){1,3}(:$h){1,4}|($h:){1,2}(:$h){1,5}|$h:(:$h){1,6}|:((:$h){1,7}|:))$$"
  }

  /** A26+A27 over synthesized endpoints, including deliberately INVALID
    * ones so the validators are exercised: custkey%10==0 → valid v6;
    * %10==5 → malformed v6 (triple colon); %7==3 → v4 with an octet >255;
    * else valid v4. Ports run 8000..67999 so the upper tail exceeds
    * 65535 (`check_port`, `src/network.cpp:897-905`). `ip_version`
    * mirrors `get_ipversion` (4 / 6 / 0 on invalid); `endpoint` mirrors
    * `join_ip_port` (`src/network.cpp:907-920`: v6 bracketed).
    */
  private def validateIpPort(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer")
      .select(col("c_custkey"),
        expr("""CASE WHEN c_custkey % 10 = 0
               |       THEN concat('fe80::', CAST(c_custkey % 9999 AS STRING))
               |     WHEN c_custkey % 10 = 5
               |       THEN concat('fe80:::', CAST(c_custkey % 99 AS STRING))
               |     WHEN c_custkey % 7 = 3
               |       THEN concat('10.0.', CAST(256 + c_custkey % 300 AS STRING),
               |                   '.', CAST(c_custkey % 256 AS STRING))
               |       ELSE concat('10.0.', CAST((c_custkey div 256) % 256 AS STRING),
               |                   '.', CAST(c_custkey % 256 AS STRING)) END""".stripMargin).as("ip"),
        (lit(8000L) + (col("c_custkey") * 97) % 60000).as("port"))
      .withColumn("valid_v4", regexp_like(col("ip"), lit(V4Re)))
      .withColumn("valid_v6", regexp_like(col("ip"), lit(V6Re)))
      .withColumn("ip_version",
        when(col("valid_v4"), 4L).when(col("valid_v6"), 6L).otherwise(0L))
      .withColumn("valid_port", col("port") > 0 && col("port") <= 65535)
      .withColumn("endpoint",
        when(col("ip_version") === 6L, concat(lit("["), col("ip"), lit("]:"), col("port")))
          .otherwise(concat(col("ip"), lit(":"), col("port"))))
      .select("c_custkey", "ip", "port", "endpoint", "valid_v4", "valid_v6", "ip_version", "valid_port")
      .orderBy("c_custkey")

  // ---- color_nearest (A28) ----------------------------------------------

  /** Per-key argmin as a PARTIAL AGGREGATION, not a window: `min` over
    * `struct(dist, code, ...)` compares lexicographically (min dist, ties
    * broken by min code — the reference's first-wins scan order,
    * `src/ansi.tpp:339-363`), and HashAggregate combines map-side, so the
    * exchange moves one row per p_partkey instead of sorting all 16N
    * scored rows through a window (the same shape as knn_cosine's
    * `max(struct)` argmax, VectorOps). r/g/b ride along in the struct tail
    * (constant within a key, below the deciding fields).
    */
  private def colorNearest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val palette = SystemPalette.toDF("cr", "cg", "cb", "code")
    val pts = Tables(spark, sfDir, "part")
      .select(col("p_partkey"),
        (col("p_partkey") % 256).as("r"),
        (col("p_partkey") * 7 % 256).as("g"),
        (col("p_partkey") * 13 % 256).as("b"))
    pts.crossJoin(broadcast(palette))
      .withColumn("dist",
        expr("""(1024 + (r + cr)) * (r - cr) * (r - cr)
               | + 2048 * (g - cg) * (g - cg)
               | + (1534 - (r + cr)) * (b - cb) * (b - cb)""".stripMargin))
      .groupBy("p_partkey")
      .agg(min(struct(col("dist"), col("code"), col("r"), col("g"), col("b"))).as("best"))
      .select(col("p_partkey"),
        col("best.r").as("r"), col("best.g").as("g"), col("best.b").as("b"),
        col("best.code").cast("int").as("code"), col("best.dist").as("dist"))
      .orderBy("p_partkey")
  }

  /** A28 at FULL reference fidelity: `find_closest_color_code` verbatim —
    * the dark cutoff (`r<20 && g<15 && b<15` → code 16, "prevents
    * artifacting from the redmean approximation", `src/ansi.tpp:354`)
    * and the strict-< scan over MAP_256C[16..255] (first index wins
    * ties = lowest code, the `min(struct)` order). Same ×512 integer
    * redmean as [[colorNearest]] — algebraically exact against the
    * reference's float form: 512·(2+(r+R)/512) = 1024+(r+R), 4·512 =
    * 2048, 512·(2+(255−(r+R)/2)/256) = 1534−(r+R). The 240-row palette
    * broadcasts; the per-key argmin is the same map-side-combining
    * partial aggregation, so the exchange still moves one row per key.
    * The cutoff is a post-aggregation override rather than a scan
    * bypass: dark rows are a ~0.06% sliver, and a union split would
    * cost a second branch of the plan to save 240 comparisons each.
    */
  private def colorNearest256(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val palette = ExtendedPalette.toDF("cr", "cg", "cb", "code")
    Tables(spark, sfDir, "part")
      .select(col("p_partkey"),
        (col("p_partkey") % 256).as("r"),
        (col("p_partkey") * 7 % 256).as("g"),
        (col("p_partkey") * 13 % 256).as("b"))
      .crossJoin(broadcast(palette))
      .withColumn("dist",
        expr("""(1024 + (r + cr)) * (r - cr) * (r - cr)
               | + 2048 * (g - cg) * (g - cg)
               | + (1534 - (r + cr)) * (b - cb) * (b - cb)""".stripMargin))
      .groupBy("p_partkey")
      .agg(min(struct(col("dist"), col("code"), col("r"), col("g"), col("b"))).as("best"))
      .select(col("p_partkey"),
        col("best.r").as("r"), col("best.g").as("g"), col("best.b").as("b"),
        when(col("best.r") < 20 && col("best.g") < 15 && col("best.b") < 15, lit(16))
          .otherwise(col("best.code")).cast("int").as("code"))
      .orderBy("p_partkey")
  }

  // ---- color_hsl (A29) ---------------------------------------------------

  /** Reference hsl_to_rgb: f(n) = l − α·max(−1, min(k−3, 9−k, 1)) with
    * k = fmod(n + h·12, 12), α = s·min(l, 1−l); channel = clamp(round(f·255)).
    * Pure double math, expressed identically in both engines (the custom
    * fmod/round in the reference reduce to floor forms for positive input).
    */
  private def fChan(k: String): String =
    s"least(greatest(CAST(floor((l - alpha * greatest(-1.0, least($k - 3, 9 - $k, 1.0))) * 255 + 0.5) AS BIGINT), 0), 255)"

  private def colorHsl(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "part")
      // NB: `360.0` alone would parse as a DECIMAL literal in Spark SQL and
      // drag the whole chain into decimal arithmetic (observed: scale-6
      // truncation diverging from the oracle); the D suffix forces DOUBLE.
      .selectExpr("p_partkey",
        "(p_partkey % 360) / 360.0D AS h",
        "(p_partkey % 100) / 100.0D AS s",
        "((p_partkey % 50) + 25) / 100.0D AS l")
      .selectExpr("p_partkey", "h", "s", "l", "s * least(l, 1 - l) AS alpha", "h * 12 AS h12")
      .selectExpr("p_partkey", "l", "alpha",
        "(0 + h12) - 12 * floor((0 + h12) / 12) AS k0",
        "(8 + h12) - 12 * floor((8 + h12) / 12) AS k8",
        "(4 + h12) - 12 * floor((4 + h12) / 12) AS k4")
      .selectExpr("p_partkey",
        s"${fChan("k0")} AS r", s"${fChan("k8")} AS g", s"${fChan("k4")} AS b")
      .orderBy("p_partkey")

  // ---- fmt_size (A19) ----------------------------------------------------

  /** A19: humanized size via the custom Catalyst expression [[FmtSize]],
    * exercised across the B..TB bands (o_totalprice as bytes, and scaled
    * by 1 MiB).
    */
  private def fmtSizeQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice) AS BIGINT)").as("bytes_small"),
        (expr("CAST(floor(o_totalprice) AS BIGINT)") * 1048576L).as("bytes_big"))
      .select(col("o_orderkey"),
        col("bytes_small"), FmtSize.fmt_size(col("bytes_small")).as("fmt_small"),
        col("bytes_big"), FmtSize.fmt_size(col("bytes_big")).as("fmt_big"))
      .orderBy("o_orderkey")

  // ---- surrogate_id (A24 analog) ----------------------------------------

  /** Deterministic surrogate id — the pipeline-safe analog of the
    * reference's UUIDv1 session id (`src/utils.tpp:35-63`). UUIDv1 mixes
    * wall clock + MAC and is nondeterministic by design (excluded from the
    * oracle surface, SURVEY §2); a data pipeline wants the *same* row to
    * get the *same* id on every run, so this derives a name-based
    * (UUIDv3-shaped) id from the row content: md5 over a namespaced key,
    * formatted 8-4-4-4-12 with the version nibble forced to 3 and the
    * variant nibble to 8. Pure per-row scalar math — no shuffle, no state,
    * partition-independent, identical on any cluster layout.
    */
  /** 8-4-4-4-12 formatting over a 32-hex-char column `h` — identical text
    * in Spark SQL and DuckDB, so the oracle comparison is exact.
    */
  private[graft] val UuidShapeSql: String =
    "concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-3', substr(h, 14, 3), " +
      "'-8', substr(h, 18, 3), '-', substr(h, 21, 12))"

  private def surrogateId(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "md5(concat('graft:', CAST(doc_id AS STRING), ':', text)) AS h")
      .selectExpr("doc_id", s"$UuidShapeSql AS sid")
      .orderBy("doc_id")

  // ---- declarations ------------------------------------------------------

  val defs: Map[String, QueryDef] = Map(
    "fmt_size" -> QueryDef(fmtSizeQuery,
      Some(s"""WITH b AS (
              |  SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS bytes_small,
              |         CAST(floor(o_totalprice) AS BIGINT) * 1048576 AS bytes_big
              |  FROM orders)
              |SELECT o_orderkey, bytes_small, ${FmtSize.fmtSizeSql("bytes_small")} AS fmt_small,
              |       bytes_big, ${FmtSize.fmtSizeSql("bytes_big")} AS fmt_big
              |FROM b ORDER BY o_orderkey""".stripMargin)),

    "validate_ip_port" -> QueryDef(validateIpPort,
      Some(s"""WITH p AS (
              |  SELECT c_custkey,
              |         CASE WHEN c_custkey % 10 = 0
              |              THEN 'fe80::' || CAST(c_custkey % 9999 AS VARCHAR)
              |              WHEN c_custkey % 10 = 5
              |              THEN 'fe80:::' || CAST(c_custkey % 99 AS VARCHAR)
              |              WHEN c_custkey % 7 = 3
              |              THEN '10.0.' || CAST(256 + c_custkey % 300 AS VARCHAR)
              |                   || '.' || CAST(c_custkey % 256 AS VARCHAR)
              |              ELSE '10.0.' || CAST((c_custkey // 256) % 256 AS VARCHAR)
              |                   || '.' || CAST(c_custkey % 256 AS VARCHAR) END AS ip,
              |         8000 + (c_custkey * 97) % 60000 AS port
              |  FROM customer),
              |v AS (
              |  SELECT c_custkey, ip, CAST(port AS BIGINT) AS port,
              |         regexp_matches(ip, '$V4Re') AS valid_v4,
              |         regexp_matches(ip, '$V6Re') AS valid_v6
              |  FROM p)
              |SELECT c_custkey, ip, port,
              |       CASE WHEN NOT valid_v4 AND valid_v6
              |            THEN '[' || ip || ']:' || CAST(port AS VARCHAR)
              |            ELSE ip || ':' || CAST(port AS VARCHAR) END AS endpoint,
              |       valid_v4, valid_v6,
              |       CAST(CASE WHEN valid_v4 THEN 4 WHEN valid_v6 THEN 6 ELSE 0 END AS BIGINT) AS ip_version,
              |       port > 0 AND port <= 65535 AS valid_port
              |FROM v ORDER BY c_custkey""".stripMargin)),

    "color_nearest" -> QueryDef(colorNearest,
      Some(s"""WITH pal(cr, cg, cb, code) AS (VALUES $paletteValuesSql),
              |pts AS (
              |  SELECT p_partkey, p_partkey % 256 AS r, p_partkey * 7 % 256 AS g,
              |         p_partkey * 13 % 256 AS b
              |  FROM part),
              |scored AS (
              |  SELECT p_partkey, r, g, b, code,
              |         (1024 + (r + cr)) * (r - cr) * (r - cr)
              |           + 2048 * (g - cg) * (g - cg)
              |           + (1534 - (r + cr)) * (b - cb) * (b - cb) AS dist,
              |         row_number() OVER (PARTITION BY p_partkey ORDER BY
              |           (1024 + (r + cr)) * (r - cr) * (r - cr)
              |             + 2048 * (g - cg) * (g - cg)
              |             + (1534 - (r + cr)) * (b - cb) * (b - cb), code) AS rn
              |  FROM pts CROSS JOIN pal)
              |SELECT p_partkey, r, g, b, code, dist
              |FROM scored WHERE rn = 1 ORDER BY p_partkey""".stripMargin)),

    "color_nearest_256" -> QueryDef(colorNearest256,
      Some(s"""WITH pal(cr, cg, cb, code) AS (VALUES $extendedPaletteValuesSql),
              |pts AS (
              |  SELECT p_partkey, p_partkey % 256 AS r, p_partkey * 7 % 256 AS g,
              |         p_partkey * 13 % 256 AS b
              |  FROM part),
              |scored AS (
              |  SELECT p_partkey, r, g, b, code,
              |         row_number() OVER (PARTITION BY p_partkey ORDER BY
              |           (1024 + (r + cr)) * (r - cr) * (r - cr)
              |             + 2048 * (g - cg) * (g - cg)
              |             + (1534 - (r + cr)) * (b - cb) * (b - cb), code) AS rn
              |  FROM pts CROSS JOIN pal)
              |SELECT p_partkey, r, g, b,
              |       CASE WHEN r < 20 AND g < 15 AND b < 15 THEN 16 ELSE code END AS code
              |FROM scored WHERE rn = 1 ORDER BY p_partkey""".stripMargin)),

    "surrogate_id" -> QueryDef(surrogateId,
      Some(s"""WITH b AS (
              |  SELECT doc_id,
              |         md5(concat('graft:', CAST(doc_id AS VARCHAR), ':', text)) AS h
              |  FROM documents)
              |SELECT doc_id, $UuidShapeSql AS sid
              |FROM b ORDER BY doc_id""".stripMargin)),

    "color_hsl" -> QueryDef(colorHsl,
      Some(s"""WITH base AS (
              |  SELECT p_partkey, (p_partkey % 360) / 360.0 AS h,
              |         (p_partkey % 100) / 100.0 AS s,
              |         ((p_partkey % 50) + 25) / 100.0 AS l
              |  FROM part),
              |a AS (SELECT p_partkey, l, alpha, h12 FROM (
              |  SELECT p_partkey, l, s * least(l, 1 - l) AS alpha, h * 12 AS h12 FROM base)),
              |k AS (
              |  SELECT p_partkey, l, alpha,
              |         (0 + h12) - 12 * floor((0 + h12) / 12) AS k0,
              |         (8 + h12) - 12 * floor((8 + h12) / 12) AS k8,
              |         (4 + h12) - 12 * floor((4 + h12) / 12) AS k4
              |  FROM a)
              |SELECT p_partkey, ${fChan("k0")} AS r, ${fChan("k8")} AS g, ${fChan("k4")} AS b
              |FROM k ORDER BY p_partkey""".stripMargin))
  )
}

package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import graft.sources.JsonLines
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Permissive JSONL ingestion: valid lines parse to the declared schema,
  * malformed lines are quarantined (not dropped, not fatal), and a
  * parquet → JSONL → parse round trip is lossless for the documents
  * shape.
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  test("valid and corrupt lines separate cleanly; neither is lost") {
    val dir = Files.createTempDirectory("graft-jsonl")
    // NB: Jackson tolerates trailing garbage after a complete object, so
    // such lines parse as VALID — corrupt here means structurally broken
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "hello world"}""",
      """{"doc_id": 2, "lang": "de", "text": }""",
      """not json at all""",
      """{"doc_id": 3, "lang": "fr", "text": "bonjour"}""")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val parsed = JsonLines.read(spark, dir.toString, docSchema)
    val good = parsed.filter(col(JsonLines.CorruptCol).isNull)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(good == Map(1L -> "en", 3L -> "fr"), s"clean rows wrong: $good")

    val corrupt = JsonLines.corruptLines(spark, dir.toString, docSchema)
      .collect().map(_.getString(0)).toSet
    assert(corrupt == Set(lines(1), lines(2)),
      s"quarantine must capture exactly the malformed lines: $corrupt")
  }

  test("CSV: valid and corrupt rows separate cleanly; neither is lost") {
    import graft.sources.CsvLines
    val dir = Files.createTempDirectory("graft-csv")
    // the pinned quarantine contract: TYPE failures are quarantined;
    // arity mismatches follow CSV's loose-schema tradition — extra
    // fields dropped, missing trailing fields null (documented on
    // CsvLines)
    val lines = Seq(
      "1,en,hello world",
      "not-a-long,de,kaputt",
      "3,fr,bonjour",
      "4,es,hola,EXTRA-COLUMN")
    Files.write(dir.resolve("part-0.csv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val parsed = CsvLines.read(spark, dir.toString, docSchema)
    val good = parsed.filter(col(CsvLines.CorruptCol).isNull)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(good == Map(1L -> "en", 3L -> "fr", 4L -> "es"),
      s"clean rows wrong (extra column must drop, not corrupt): $good")

    val corrupt = CsvLines.corruptLines(spark, dir.toString, docSchema)
      .collect().map(_.getString(0)).toSet
    assert(corrupt == Set(lines(1)),
      s"quarantine must capture exactly the type-failed rows: $corrupt")
  }

  test("parquet -> CSV -> parse round trip is lossless for documents") {
    import graft.sources.CsvLines
    val out = Files.createTempDirectory("graft-csv-rt").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    docs.write.mode("overwrite").option("header", "true").csv(out)
    val back = CsvLines.read(spark, out, docSchema, header = true).cache()
    assert(back.filter(col(CsvLines.CorruptCol).isNotNull).count() == 0)
    assert(back.select("doc_id", "lang", "text").exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back.select("doc_id", "lang", "text")).count() == 0)
  }

  test("events.ts normalizes identically across every fixture encoding ever shipped") {
    // Fixture-drift guard: the driver has regenerated the test fixtures with
    // different physical ts encodings across rounds (int64 TIMESTAMP(NANOS),
    // then timestamp[us] NTZ). Tables("events") must produce byte-identical
    // TimestampType micros for all of them, so the next silent regeneration
    // is a one-test signal instead of a multi-suite outage.
    import graft.sources.Tables
    val base = Files.createTempDirectory("graft-events-enc")
    val micros = Seq(1700000000000000L, 1700000000123456L, 1700086400999999L)
    val src = spark.range(micros.size)
      .withColumn("user_id", col("id") + 100)
      .withColumn("us", {
        val m = map(micros.zipWithIndex.flatMap { case (v, i) =>
          Seq(lit(i.toLong), lit(v))
        }: _*)
        m(col("id"))
      })

    // encoding 1: raw int64 nanoseconds — how legacy TIMESTAMP(NANOS)
    // fixtures surface under spark.sql.legacy.parquet.nanosAsLong
    val dNanos = base.resolve("nanos").toString
    src.select(col("user_id"), (col("us") * 1000L).as("ts"))
      .write.parquet(s"$dNanos/events.parquet")

    // encoding 2: timestamp[us] without timezone → TIMESTAMP_NTZ on read
    // (cast TimestampType→NTZ keeps the wall clock; session TZ is UTC so
    // the wall clock IS the instant)
    val dNtz = base.resolve("ntz").toString
    src.select(col("user_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dNtz/events.parquet")

    // encoding 3: timestamp[us] adjusted-to-UTC → TimestampType on read;
    // the conf is restored so later timestamp-writing tests on the shared
    // session don't inherit the micros encoding
    val dTz = base.resolve("tz").toString
    val prevTsType = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try src.select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$dTz/events.parquet")
    finally prevTsType match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    val loaded = Seq("nanos" -> dNanos, "ntz" -> dNtz, "tz" -> dTz).map {
      case (label, dir) =>
        val df = Tables(spark, dir, "events")
        assert(df.schema("ts").dataType == TimestampType,
          s"$label: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
        label -> df.select(col("user_id"), unix_micros(col("ts")).as("us"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val expected = micros.zipWithIndex.map { case (v, i) => (i + 100L) -> v }.toMap
    loaded.foreach { case (label, got) =>
      assert(got == expected, s"$label: normalized micros wrong: $got")
    }
  }

  test("all ten fixture tables load with the column names and types the operators rely on") {
    // Broad fixture-drift tripwire (the events.ts-specific guard above is
    // the deep one): if a regeneration renames a column or shifts a type
    // the operators depend on, this fails as ONE pointed test naming the
    // table, instead of a scatter of downstream analysis errors.
    import graft.sources.Tables
    val sfDir = "/root/testdata/sf0.001"
    def schema(t: String) = Tables(spark, sfDir, t).schema
    val expectedCols = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    expectedCols.foreach { case (t, cols) =>
      assert(schema(t).fieldNames.toSeq == cols, s"$t: column drift")
    }
    // operator-critical types
    val ev = schema("events")
    assert(ev("ts").dataType == TimestampType, "events.ts must normalize to TimestampType")
    assert(ev("user_id").dataType == LongType && ev("value").dataType == DoubleType)
    val em = schema("embeddings")
    assert(em("embedding").dataType == ArrayType(FloatType),
      s"embeddings.embedding must be array<float>, got ${em("embedding").dataType}")
    val doc = schema("documents")
    assert(doc("doc_id").dataType == LongType && doc("text").dataType == StringType &&
      doc("lang").dataType == StringType)
    val li = schema("lineitem")
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach { c =>
      assert(li(c).dataType == DoubleType, s"lineitem.$c must be double")
    }
    // date-ish columns have drifted encodings before; both timestamp
    // flavors (and a plain date) are fine for the operators — anything
    // else is a drift worth stopping on
    Seq(schema("orders")("o_orderdate").dataType, li("l_shipdate").dataType).foreach { dt =>
      assert(dt == TimestampNTZType || dt == TimestampType || dt == DateType,
        s"date-ish column drifted to unexpected type $dt")
    }
  }

  test("parquet -> JSONL -> parse round trip is lossless for documents") {
    val out = Files.createTempDirectory("graft-jsonl-rt").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    docs.write.mode("overwrite").json(out)
    // cache the parsed result: Spark's sanctioned way to query the
    // corrupt column in isolation
    val back = JsonLines.read(spark, out, docSchema).cache()
    assert(back.filter(col(JsonLines.CorruptCol).isNotNull).count() == 0)
    assert(back.select("doc_id", "lang", "text").exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back.select("doc_id", "lang", "text")).count() == 0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions packaging: a session configured with
  * `spark.sql.extensions=graft.GraftExtensions` can call every custom
  * expression straight from SQL — the library integrates the way a Spark
  * extension is supposed to.
  *
  * NOTE: needs its own SparkSession (extensions apply at session build),
  * so this spec builds one with a distinct app name; getOrCreate would
  * otherwise reuse a session built without the extension.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  // this session carries the extensions conf; stop it after the suite so
  // later suites build their own via getOrCreate
  override def afterAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  lazy val spark: SparkSession = {
    // a prior suite's session would be reused by getOrCreate and lacks the
    // extension — clear it so this builder takes effect
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("fmt_size is callable from SQL") {
    assert(spark.sql("SELECT fmt_size(1536)").head().getString(0) == "1.5 KB")
  }

  test("float_dot is callable from SQL") {
    val v = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(v == 11.0)
    // plain double-literal arrays work too — the builder casts to
    // ARRAY<FLOAT> so SQL users get float semantics, not silent garbage
    val w = spark.sql("SELECT float_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0)
    assert(w == 11.0)
    // non-numeric arrays must ERROR at analysis, not degrade to NULLs via
    // a lenient string->float cast
    val ex = intercept[Exception] {
      spark.sql("SELECT float_dot(array('x'), array('y'))").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("float"), ex.getMessage)
  }

  test("minhash_sig is callable from SQL") {
    val sig = spark.sql("SELECT minhash_sig(array('a b c', 'b c d'), 4)")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    // deterministic: same input, same signature
    val sig2 = spark.sql("SELECT minhash_sig(array('a b c', 'b c d'), 4)")
      .head().getSeq[Long](0)
    assert(sig == sig2)
  }

  test("simhash_sig is callable from SQL and deterministic") {
    val a = spark.sql("SELECT simhash_sig(array('a', 'b', 'c'))").head().getLong(0)
    val b = spark.sql("SELECT simhash_sig(array('a', 'b', 'c'))").head().getLong(0)
    assert(a == b && a != 0L)
  }

  test("window argmin rule: rn=1 window collapses to a partial-aggregable argmin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 5.0, "x"), (1, 3.0, "y"), (2, 7.0, "z"), (2, 9.0, "w"))
      .toDF("k", "v", "tag")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
    val q = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("k", "v", "tag")
    val opt = q.queryExecution.optimizedPlan
    assert(!opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"window survived the rewrite:\n$opt")
    assert(opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
      s"no aggregate in rewritten plan:\n$opt")
    // values: the per-key order-key minimum survives with its payload row
    assert(q.collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
      == Set((1, 3.0, "y"), (2, 7.0, "z")))
    // and the physical form partial-aggregates (map-side combine)
    assert(q.queryExecution.executedPlan.toString.contains("partial_min"),
      "rewritten argmin must combine map-side")
  }

  test("window argmin rule leaves non-matching shapes alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 5.0), (1, 3.0), (2, 7.0)).toDF("k", "v")
    def hasWindow(q: org.apache.spark.sql.DataFrame): Boolean =
      q.queryExecution.optimizedPlan
        .exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window])
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
    // MIXED directions: no single struct ordering agrees — must not fire
    val mixed = df.withColumn("u", $"v" * -1)
      .withColumn("rn", row_number().over(w.orderBy($"v".desc, $"u".asc)))
      .filter($"rn" === 1).select("k", "v")
    assert(hasWindow(mixed), "rule fired on MIXED window order directions")
    assert(mixed.collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
      == Set((1, 5.0), (2, 7.0)))
    // rank 2 filter: not an argmin — must not fire
    val rank2 = df.withColumn("rn", row_number().over(w.orderBy($"v")))
      .filter($"rn" === 2).select("k", "v")
    assert(hasWindow(rank2), "rule fired on a rank-2 filter")
    // rank referenced downstream: must not fire
    val keepsRn = df.withColumn("rn", row_number().over(w.orderBy($"v")))
      .filter($"rn" === 1).select("k", "v", "rn")
    assert(hasWindow(keepsRn), "rule fired although the rank is projected")
    // GLOBAL (unpartitioned) argmin: must not fire — a grand-total
    // Aggregate would emit one all-null row on empty input where the
    // window emits none
    val globalW = org.apache.spark.sql.expressions.Window.orderBy($"v")
    val global = df.withColumn("rn", row_number().over(globalW))
      .filter($"rn" === 1).select("k", "v")
    assert(hasWindow(global), "rule fired on an unpartitioned window")
    // and the empty-input case yields zero rows (Catalyst's own
    // empty-relation propagation removes the window here; the point is
    // the rewrite must never turn this into a 1-row grand-total agg)
    val globalEmpty = df.filter($"v" > 100.0)
      .withColumn("rn", row_number().over(globalW)).filter($"rn" === 1).select("k", "v")
    assert(globalEmpty.collect().isEmpty, "empty input must yield zero rows")
  }

  test("window argmin rule: DESC NULLS LAST ordering collapses to max(struct)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 5.0, "x"), (1, 3.0, "y"), (2, 7.0, "z"), (2, 9.0, "w"))
      .toDF("k", "v", "tag")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy($"v".desc)
    val q = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("k", "v", "tag")
    val opt = q.queryExecution.optimizedPlan
    assert(!opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"window survived the DESC rewrite:\n$opt")
    assert(q.collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
      == Set((1, 5.0, "x"), (2, 9.0, "w")))
    assert(q.queryExecution.executedPlan.toString.contains("partial_max"),
      "DESC argmax must combine map-side")
  }

  test("window argmin rule: rank()=1 keeps ties via the join-back rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 3.0, "a"), (1, 3.0, "b"), (1, 5.0, "c"), (2, 7.0, "d"))
      .toDF("k", "v", "tag")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
    val q = df.withColumn("rn", rank().over(w)).filter($"rn" === 1)
      .select("k", "v", "tag")
    val opt = q.queryExecution.optimizedPlan
    assert(!opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"window survived the rank rewrite:\n$opt")
    assert(opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      s"rank rewrite must join back to keep ties:\n$opt")
    // BOTH tied-first rows survive — the cardinality row_number would lose
    assert(q.collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
      == Set((1, 3.0, "a"), (1, 3.0, "b"), (2, 7.0, "d")))
  }

  test("window argmin rule: GLOBAL rank()=1 is safe through the join-back (incl. empty input)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 5.0), (1, 3.0), (2, 5.0)).toDF("k", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"v".desc)
    val q = df.withColumn("rn", rank().over(w)).filter($"rn" === 1).select("k", "v")
    val opt = q.queryExecution.optimizedPlan
    assert(!opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"window survived the global rank rewrite:\n$opt")
    assert(q.collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
      == Set((1, 5.0), (2, 5.0)), "global DESC rank-1 keeps every tied max row")
    // empty input joins to nothing — no all-null phantom row
    val empty = df.filter($"v" > 100.0)
      .withColumn("rn", rank().over(w)).filter($"rn" === 1).select("k", "v")
    assert(empty.collect().isEmpty, "empty input must yield zero rows")
  }

  test("window argmin rule: rank rewrite handles expression keys, null keys, and bails on rand()") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def hasWindow(q: org.apache.spark.sql.DataFrame): Boolean =
      q.queryExecution.optimizedPlan
        .exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window])
    // EXPRESSION order key: rank over v*-1 asc == rank over v desc
    val df = Seq((1, 5.0, "x"), (1, 5.0, "y"), (1, 3.0, "z")).toDF("k", "v", "tag")
    val wExpr = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy($"v" * -1)
    val qe = df.withColumn("rn", rank().over(wExpr)).filter($"rn" === 1).select("k", "v", "tag")
    assert(!hasWindow(qe), "rank rewrite must handle expression order keys")
    assert(qe.collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
      == Set((1, 5.0, "x"), (1, 5.0, "y")), "both tied-max rows under the negated key")
    // NULL order keys sort first under ASC NULLS FIRST: the rank-1 group
    // IS the null rows, and the null-safe join-back must keep them all
    val dfn = Seq((1, Some(2.0), "a"), (1, None, "b"), (1, None, "c")).toDF("k", "v", "tag")
    val wAsc = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
    val qn = dfn.withColumn("rn", rank().over(wAsc)).filter($"rn" === 1).select("k", "tag")
    assert(!hasWindow(qn))
    assert(qn.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      == Set((1, "b"), (1, "c")), "null-key rank-1 rows must survive the join-back")
    // nondeterministic subtree: duplicating it into both join sides would
    // evaluate rand() twice — the rule must leave the window alone.
    // (A LocalRelation source won't do here: ConvertToLocalRelation
    // pre-evaluates rand() into literal rows before this rule runs, and
    // the rewrite on literal data is legitimately safe. A file-backed
    // scan keeps the Rand expression alive in the child.)
    val qr = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("r", rand(7))
      .withColumn("rn", rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy($"r")))
      .filter($"rn" === 1).select("doc_id", "lang")
    assert(hasWindow(qr), "rank rewrite fired on a nondeterministic child")
  }

  test("window argmin rule: rank join-back shares NO exprIds between the two join sides") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LogicalPlan}
    // file-backed child WITH an interior alias: both the relation's ids
    // and the alias-minted id must be re-minted on the aggregate side —
    // re-aliasing only the visible output would leave interior duplicates
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", ($"doc_id" % 10).as("k"), length($"text").as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
    val q = df.withColumn("rn", rank().over(w)).filter($"rn" === 1)
      .select("k", "v", "doc_id")
    val opt = q.queryExecution.optimizedPlan
    assert(!opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"window survived the rank rewrite:\n$opt")
    val joins = opt.collect { case j: LJoin => j }
    assert(joins.nonEmpty, s"rank rewrite must produce a join:\n$opt")
    def producedIds(p: LogicalPlan) =
      p.collect { case n => n.output.map(_.exprId) }.flatten.toSet
    joins.foreach { j =>
      val shared = producedIds(j.left).intersect(producedIds(j.right))
      assert(shared.isEmpty, s"join sides share exprIds $shared:\n$opt")
    }
    assert(q.count() > 0)
  }

  test("window argmin rule: rank join-back bails when the child cannot be freshly copied (Generate)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a Generate's output attributes are minted by neither a
    // MultiInstanceRelation leaf nor an Alias, so freshCopy cannot
    // re-mint them — the safety net (rebuilt ids overlapping the
    // original's) must decline the rewrite and leave the Window alone;
    // a fired rewrite would self-join two subtrees sharing the
    // generator's exprIds. File-backed scan: a LocalRelation source
    // would be pre-collapsed below the Generate by the optimizer.
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 50)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .select($"doc_id", $"tok", length($"tok").as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("v")
    val q = df.withColumn("rn", rank().over(w)).filter($"rn" === 1).select("doc_id", "tok")
    val opt = q.queryExecution.optimizedPlan
    assert(opt.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"rank rewrite fired on a Generate child it cannot freshly copy:\n$opt")
    // and the untouched window query still answers correctly: every kept
    // row carries its partition's minimum token length
    val mins = df.groupBy("doc_id").agg(min($"v").as("mv"))
    val expected = df.join(mins, "doc_id").filter($"v" === $"mv").select("doc_id", "tok")
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == expected.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(q.count() > 0)
  }

  test("top_k aggregate is callable from SQL") {
    val rows = spark.sql(
      """SELECT g, top_k(s, id, p, 2) FROM VALUES
        |  ('a', 0.5D, 1L, 10L), ('a', 0.9D, 2L, 20L), ('a', 0.7D, 3L, 30L),
        |  ('b', 0.1D, 4L, 40L)
        |  AS t(g, s, id, p)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val a = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.9, 2L), (0.7, 3L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(4L))
  }

  test("misra_gries and deflate_size are callable from SQL") {
    // misra_gries: k larger than the distinct-item count degenerates to
    // exact counts — a deterministic SQL-level check
    val rows = spark.sql(
      """SELECT misra_gries(x, 5) FROM VALUES
        |  ('a'), ('a'), ('a'), ('b'), ('b'), ('c') AS t(x)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    // deflate_size: matches the JVM zlib reference
    val d = new java.util.zip.Deflater(6, false)
    d.setInput("graft graft graft graft".getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](256); var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    assert(spark.sql("SELECT deflate_size('graft graft graft graft')").head().getInt(0) == n)
    // non-literal k must fail loudly
    intercept[Exception] {
      spark.sql("SELECT misra_gries(x, length(x)) FROM VALUES ('aa') AS t(x)").collect()
    }: Unit
    // char_grams: code-point grams from SQL
    assert(spark.sql("SELECT char_grams('a😀b', 2)").head().getSeq[String](0) ==
      Seq("a😀", "😀b"))
  }

  test("winnow_select and nfc_normalize are callable from SQL") {
    // winnow_select: positions agree with the library entry point
    val text = ('a' to 'z').mkString * 4
    val got = spark.sql(s"SELECT winnow_select('$text', 30, 15)")
      .head().getSeq[Int](0)
    val want = graft.functions.WinnowSelect
      .selectPositions(text, 30, 15).toSeq
    assert(got == want, s"SQL $got vs library $want")
    // non-literal k must fail loudly, not silently misparse
    intercept[Exception] {
      spark.sql("SELECT winnow_select('abc', length('abc'), 2)").collect()
    }
    // nfc_normalize: NFD composes; already-normalized passes through
    // NOTE: Spark's chr() is ASCII-mod-256 (unlike DuckDB's) — embed the
    // combining acute directly in the SQL text
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301'), nfc_normalize('plain')").head()
    assert(r.getString(0) == "caf\u00e9" && r.getString(1) == "plain")
  }
}

package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Near-duplicate detection properties: the hot-bucket star-pair guard
  * (a skewed corpus must not explode quadratically on one reducer), the
  * connectivity invariant under the guard, and the candidate-quality probe
  * (LSH candidates must be far more similar than random pairs).
  */
class DedupSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toks(s: String): Set[String] = s.split(" ").toSet
  private def jaccard(a: String, b: String): Double = {
    val (x, y) = (toks(a), toks(b))
    x.intersect(y).size.toDouble / x.union(y).size
  }

  test("500 identical docs produce O(n) star pairs, not O(n^2) (hot-bucket cap)") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val d = (1L to 500L).map(i => (i, text)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(d).collect()
    // all 500 share every band bucket -> star: min id (1) linked to all others
    assert(pairs.length == 499, s"expected 499 star pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 1L), "star root must be the bucket minimum id")
    assert(pairs.map(_.getLong(1)).toSet == (2L to 500L).toSet)
  }

  test("near-dup pairs below the cap still get all-pairs candidates") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val variant = ((1 to 29).map(i => s"w$i") :+ "wX").mkString(" ")
    val fillers = (100L to 140L).map(i => i -> (1 to 30).map(j => s"f${i}_$j").mkString(" "))
    val d = (Seq(1L -> base, 2L -> variant) ++ fillers).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-identical pair (1,2) missing from $pairs")
    assert(!pairs.exists(p => p._1 >= 100L && p._2 >= 100L && p._1 != p._2 - 0),
      s"unrelated filler docs paired: ${pairs.filter(p => p._1 >= 100L)}")
  }

  test("candidate quality: LSH candidates are far more similar than random pairs") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cands = SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.nonEmpty, "no minhash candidates at sf0.01")
    val candAvg = cands.map { case (a, b) => jaccard(texts(a), texts(b)) }.sum / cands.length
    val ids = texts.keys.toArray.sorted
    val randPairs = ids.indices.take(500).map(i => (ids(i), ids((i * 37 + 11) % ids.length)))
      .filter(p => p._1 != p._2)
    val randAvg = randPairs.map { case (a, b) => jaccard(texts(a), texts(b)) }.sum / randPairs.length
    info(f"avg Jaccard: candidates $candAvg%.3f vs random $randAvg%.3f (n=${cands.length})")
    assert(candAvg >= randAvg + 0.2,
      f"candidate quality margin collapsed: $candAvg%.3f vs random $randAvg%.3f")
  }
}

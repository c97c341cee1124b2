package graft

import graft.operators.PipelineOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §B1: chunk → reassemble must be the identity on
  * `documents.text` for degenerate and reference chunk widths (1 char,
  * primes, the reference's 1999-byte payload, widths beyond doc length).
  * Exercises the A10 clamp semantics at every boundary.
  */
class RoundTripSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 1 = one chunk per char; 7 = prime; 64 = engine default; 1999 = reference
  // payload (transf_client.cpp:127); 2048 = reference buffer; 4096 > max doc
  Seq(1, 7, 64, 1999, 2048, 4096).foreach { width =>
    test(s"chunk width $width round-trips all documents byte-identically") {
      val chunks = PipelineOps.chunksAt(spark, sfDir, width)
      val reassembled = chunks
        .groupBy("doc_id")
        .agg(
          concat_ws("", expr("transform(array_sort(collect_list(struct(seq, chunk))), x -> x.chunk)"))
            .as("rt"),
          count(lit(1)).as("n_chunks"),
          first("text").as("text"),
          first("n_chars").as("n_chars"))
      val bad = reassembled.filter(col("rt") =!= col("text")).count()
      assert(bad == 0, s"width $width: $bad documents failed to round-trip")
      // chunk count law: ceil(len/width) with the 1-chunk floor
      val wrongCount = reassembled
        .filter(col("n_chunks") =!= greatest(ceil(col("n_chars") / lit(width.toDouble)), lit(1)))
        .count()
      assert(wrongCount == 0, s"width $width: chunk-count law violated")
    }
  }
}

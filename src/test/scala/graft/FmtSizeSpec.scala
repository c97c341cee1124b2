package graft

import graft.functions.FmtSize
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the reference fmt_size algorithm
  * (/root/reference/src/utils.tpp:18-33), per FIXTURES.md §B5.
  */
class FmtSizeSpec extends AnyFunSuite {

  val cases: Seq[(Long, String)] = Seq(
    0L -> "0 B",
    1L -> "1 B",
    1023L -> "1023 B",
    1024L -> "1 KB",
    1536L -> "1.5 KB", // p=50 -> single digit quirk
    1075L -> "1.04 KB", // p=4 -> zero-padded quirk
    1048575L -> "1023.99 KB",
    1048576L -> "1 MB",
    5L * 1024 * 1024 * 1024 -> "5 GB",
    1099511627776L -> "1 TB",
    1024L * 1099511627776L -> "1024 TB", // unit index capped at TB (i < 4)
    4294967295L -> "3.99 GB", // u32 max
    -1L -> "0 B", // negatives (unreachable in the reference's u_long) clamp to 0
    Long.MinValue -> "0 B"
  )

  test("format matches reference integer algorithm on boundaries") {
    cases.foreach { case (in, want) =>
      assert(FmtSize.format(in) == want, s"fmt_size($in)")
    }
  }

  test("expression evaluates identically through Spark (codegen path)") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    import spark.implicits._
    val df = cases.map(_._1).toDF("v")
      .select(FmtSize.fmt_size($"v").as("s"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }
}

package graft

import java.nio.file.{Files, Path}

import graft.operators.MultimodalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real-binary multimodal path (VERDICT r1 item 8): opaque files with
  * arbitrary bytes written to disk, ingested via the `binaryFile` source,
  * and pushed through the same typed feature pass as the parquet path.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic opaque fixtures: all 256 byte values appear, including
    * 0x00 and invalid-UTF8 sequences — actual binary, not text in disguise.
    */
  private def writeFixtures(): Path = {
    val dir = Files.createTempDirectory("graft-binfiles")
    def bytesFor(id: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * 7 + id * 13) % 256).toByte)
    Seq(1 -> 100, 2 -> 256, 3 -> 33).foreach { case (id, n) =>
      Files.write(dir.resolve(s"doc$id.bin"), bytesFor(id, n))
    }
    dir
  }

  test("binaryFile source reads opaque bytes with correct ids and lengths") {
    val dir = writeFixtures()
    val rows = MultimodalOps.readBinaryDir(spark, dir.toString)
      .select("doc_id", "length").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 100L, 2L -> 256L, 3L -> 33L))
    // payload bytes survive the scan verbatim (spot-check doc 2: one full
    // pass over all 256 byte values starting at 2*13=26)
    val payload = MultimodalOps.readBinaryDir(spark, dir.toString)
      .filter(col("doc_id") === 2L).select("payload").head().getAs[Array[Byte]](0)
    assert(payload.length == 256)
    assert((payload(0) & 0xff) == 26 && (payload(255) & 0xff) == (255 * 7 + 26) % 256)
  }

  test("feature extraction over real binary files matches a direct computation") {
    val dir = writeFixtures()
    val feats = MultimodalOps.binaryFeatures(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getFloat(4)))
    assert(feats.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val byId = feats.map(f => f._1 -> f).toMap
    // doc 3: 33 bytes -> 2 frames (32 + 1); recompute mean directly
    val b3 = Array.tabulate(33)(i => (i * 7 + 3 * 13) % 256)
    assert(byId(3L)._2 == 33)
    assert(byId(3L)._4 == 2)
    assert(math.abs(byId(3L)._3 - b3.sum.toDouble / 33) < 1e-9)
    assert(math.abs(byId(3L)._5 - b3.take(32).sum.toFloat / 32) < 1e-4)
  }

  test("frame sampling and fixed-bin resize have the declared shapes") {
    val dir = writeFixtures()
    val rows = MultimodalOps.binaryFeatures(spark, dir.toString)
      .select("doc_id", "n_frames", "n_sampled", "r0").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getFloat(3))).toMap
    // sampled = ceil(n_frames / stride); doc 2 has 8 frames -> 2 sampled
    rows.foreach { case (id, (nf, ns, _)) =>
      assert(ns == (nf + MultimodalOps.SampleStride - 1) / MultimodalOps.SampleStride,
        s"doc $id: $ns sampled of $nf frames")
    }
    // doc 3 (2 frames): resize bin 0 pools frames [0,1) -> exactly frame 0
    val b3 = Array.tabulate(33)(i => (i * 7 + 3 * 13) % 256)
    assert(math.abs(rows(3L)._3 - b3.take(32).sum.toFloat / 32) < 1e-4)
  }

  test("a custom FrameDecoder injects through the full pipeline (interface is real)") {
    import graft.operators.FrameDecoder
    val dir = writeFixtures()
    // per-byte identity decode: one frame per byte — shapes downstream of
    // the interface must follow the DECODER's output, not the stub's
    object ByteDecoder extends FrameDecoder {
      override def decode(payload: Array[Byte]): Array[Float] =
        payload.map(b => (b & 0xff).toFloat)
    }
    val rows = MultimodalOps.binaryFeatures(spark, dir.toString, ByteDecoder)
      .select("doc_id", "n_frames", "n_sampled", "f0").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getFloat(3))).toMap
    // doc 3: 33 bytes -> 33 frames under ByteDecoder (2 under the stub)
    assert(rows(3L)._1 == 33, s"decoder output ignored: ${rows(3L)}")
    assert(rows(3L)._2 == (33 + MultimodalOps.SampleStride - 1) / MultimodalOps.SampleStride)
    assert(rows(3L)._3 == ((0 * 7 + 3 * 13) % 256).toFloat)
  }

  test("default decoder really decodes PNM/WAV files end-to-end; opaque stays stub") {
    import graft.operators.StubFrameDecoder
    val dir = Files.createTempDirectory("graft-codecfiles")
    // P5 4x3: rows with hand-computed means 15.0 / 100.0 / 127.5
    val pnm = "P5\n4 3\n255\n".getBytes("US-ASCII") ++
      Array[Int](0, 10, 20, 30, 100, 100, 100, 100, 255, 0, 255, 0).map(_.toByte)
    // WAV mono 16-bit PCM, 300 samples: 256x |±3277| then 44x 16384
    val wav = {
      def u16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def u32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val data = (Array.tabulate(256)(i => if (i % 2 == 0) 3277 else -3277) ++
        Array.fill(44)(16384)).flatMap(s => u16(s & 0xffff))
      val fmt = "fmt ".getBytes("US-ASCII") ++ u32(16) ++ u16(1) ++ u16(1) ++
        u32(8000) ++ u32(16000) ++ u16(2) ++ u16(16)
      val body = "WAVE".getBytes("US-ASCII") ++ fmt ++
        "data".getBytes("US-ASCII") ++ u32(data.length) ++ data
      "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
    }
    val opaque = Array.tabulate[Byte](100)(i => ((i * 7 + 13) % 256).toByte)
    Files.write(dir.resolve("img1.pnm"), pnm)
    Files.write(dir.resolve("snd2.wav"), wav)
    Files.write(dir.resolve("doc3.bin"), opaque)
    val rows = MultimodalOps.binaryFeatures(spark, dir.toString) // default = Auto
      .select("doc_id", "n_frames", "f0").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getFloat(2))).toMap
    assert(rows(1L) == (3, 15.0f), s"PNM not decoded: ${rows(1L)}") // h=3 rows, row-0 mean
    assert(rows(2L) == (2, 3277.0f / 32768.0f), s"WAV not decoded: ${rows(2L)}")
    assert(rows(3L) == (4, StubFrameDecoder.decode(opaque)(0)), s"opaque not stub: ${rows(3L)}")
  }

  test("compressed PNG/JPEG files decode end-to-end through the binaryFile pipeline") {
    // shared 4x3 raster fixture (TestRasters): pooled row means 20/100/170
    def enc(fmt: String): Array[Byte] = TestRasters.encode(fmt)
    val dir = Files.createTempDirectory("graft-imgfiles")
    Files.write(dir.resolve("pic1.png"), enc("png"))
    Files.write(dir.resolve("pic2.jpg"), enc("jpg"))
    val rows = MultimodalOps.binaryFeatures(spark, dir.toString) // default = Auto
      .select("doc_id", "n_frames", "f0").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getFloat(2))).toMap
    assert(rows(1L) == (3, TestRasters.RowMeans.head), s"PNG not decoded: ${rows(1L)}")
    assert(rows(2L)._1 == 3, s"JPEG frame count: ${rows(2L)}")
    assert(math.abs(rows(2L)._2 - TestRasters.RowMeans.head) <= 10.0f, s"JPEG row-0 mean: ${rows(2L)}")
  }

  test("declared multimodal_features over text payloads is unchanged by the auto decoder") {
    import graft.operators.{AutoFrameDecoder, StubFrameDecoder}
    import org.apache.spark.sql.functions.col
    // the declared key feeds document TEXT cast to binary — none of it is
    // PNM/RIFF, so the auto default must reproduce the stub bit-for-bit
    // (this is what keeps CORRECTNESS spec-green across the default switch)
    val payloads = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val auto = MultimodalOps.featuresOf(spark, payloads, AutoFrameDecoder).collect()
    val stub = MultimodalOps.featuresOf(spark, payloads, StubFrameDecoder).collect()
    assert(auto.length == stub.length && auto.length > 0)
    assert(auto.sameElements(stub), "auto decoder changed the declared text-payload output")
  }

  test("multimodal_neardup: near-identical rasters flag, distinct rasters and stub payloads do not (r18 task 2)") {
    import spark.implicits._
    // P5 grayscale, 4 wide x 64 tall: decoded profile = 64 per-row means
    def p5(rows: Array[Int]): Array[Byte] =
      s"P5\n4 ${rows.length}\n255\n".getBytes("US-ASCII") ++
        rows.flatMap(v => Array.fill(4)(v.toByte))
    val gradient = Array.tabulate(64)(r => r * 4)            // strictly rising
    val nearDup = gradient.clone()
    nearDup(31) = gradient(31) + 20                          // one row perturbed
    val inverted = gradient.reverse                          // structurally different
    val payloads = Seq(
      3L -> p5(gradient),
      9L -> p5(nearDup),
      6L -> p5(inverted),
      // stub-decoded opaque payloads (no image/RIFF magic), long enough
      // that their 32-byte-frame profiles have real structure — a
      // 2-frame payload's dHash is degenerately near 0, which is the
      // CORRECT perceptual reading (everything that flat looks alike),
      // but would make this assertion about stub pass-through vacuous
      12L -> Array.tabulate[Byte](3200)(i => ((i * 7 + 13) % 251 + 1).toByte),
      15L -> Array.tabulate[Byte](3200)(i => ((i * i * 31 + 5) % 251 + 1).toByte)
    ).toDF("doc_id", "payload")
    val pairs = MultimodalOps.perceptualPairs(spark, payloads)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((3L, 9L)),
      s"exactly the planted near-identical raster pair must flag: $pairs")
    assert(pairs.forall(_._3 <= 3), s"emitted hamming must be verified <= 3: $pairs")
    // dHash unit pins: determinism, and the structural distance that
    // makes the banding meaningful (rising vs inverted profile differ in
    // nearly every adjacent comparison)
    val hA = MultimodalOps.dHashOf(gradient.map(_.toFloat))
    assert(hA == MultimodalOps.dHashOf(gradient.map(_.toFloat)), "dHash must be deterministic")
    val hB = MultimodalOps.dHashOf(inverted.map(_.toFloat))
    assert(java.lang.Long.bitCount(hA ^ hB) > 3,
      s"distinct rasters must land outside the neighbor threshold: ${java.lang.Long.bitCount(hA ^ hB)}")
    // the declared key's contract on the real corpus: every emitted pair
    // carries true verified hamming <= 3 and the image-kind filter holds
    val key = SparkEntry.queries("multimodal_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(key.nonEmpty, "key must produce pairs on the corpus (stub near-identical texts exist)")
    assert(key.forall(r => r.getInt(2) <= 3 && r.getLong(0) % 3 == 0 && r.getLong(1) % 3 == 0),
      "key rows must be image-kind ids with verified hamming <= 3")
  }

  test("degenerate-profile policy: a flood of tiny flat rasters yields zero vacuous pairs; real near-dups still flag (r19)") {
    import spark.implicits._
    def p5(rows: Array[Int]): Array[Byte] =
      s"P5\n4 ${rows.length}\n255\n".getBytes("US-ASCII") ++
        rows.flatMap(v => Array.fill(4)(v.toByte))
    val gradient = Array.tabulate(64)(r => r * 4)
    val nearDup = gradient.clone()
    nearDup(31) = gradient(31) + 20
    // the flood: 20 flat icons at assorted constant intensities and
    // assorted tiny sizes — pre-r19 every one hashed to code ~0 and all
    // 190 cross pairs flagged at hamming 0
    val flood = (0 until 20).map { i =>
      (100L + i * 3, p5(Array.fill(2 + i % 5)(i * 12 % 256)))
    }
    val payloads = (Seq(3L -> p5(gradient), 9L -> p5(nearDup)) ++ flood)
      .toDF("doc_id", "payload")
    val pairs = MultimodalOps.perceptualPairs(spark, payloads)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 9L)),
      s"flat-raster flood must produce no pairs while the planted near-dup still flags: $pairs")
    // the policy's exact boundary: a constant profile emits no code, the
    // minimal structured profile (one step) emits one
    assert(MultimodalOps.dHashCodeOpt(Array.fill(64)(7f)).isEmpty,
      "constant profile must emit no signature")
    assert(MultimodalOps.dHashCodeOpt(Array.empty[Float]).isEmpty,
      "empty profile must emit no signature")
    val stepped = Array.tabulate(64)(i => if (i < 32) 0f else 255f)
    assert(MultimodalOps.dHashCodeOpt(stepped).contains(MultimodalOps.dHashOf(stepped)),
      "structured profiles must hash exactly as dHashOf")
    // cluster view: degenerate image-kind docs stay PRESENT as singletons
    val codes = MultimodalOps.perceptualCodes(spark, payloads)
      .collect().map(_.getLong(0)).toSet
    assert(codes == Set(3L, 9L), s"only structured profiles carry codes: $codes")
  }

  test("multimodal_clusters: every image-kind doc labeled, pairs co-clustered, min-id reps (r18)") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("multimodal_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val imageIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 3 === 0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.keySet == imageIds,
      "every image-kind doc must get a cluster row (singletons included)")
    // every neardup pair lands in one cluster — the closure honors the edges
    val pairs = SparkEntry.queries("multimodal_neardup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture corpus lost its perceptual pairs — vacuous")
    pairs.foreach { case (a, b) =>
      assert(rows(a)._1 == rows(b)._1, s"pair ($a,$b) split across clusters")
    }
    // min-id representative discipline and consistent sizes
    rows.groupBy(_._2._1).foreach { case (cluster, members) =>
      assert(cluster == members.keys.min, s"cluster $cluster is not its min member id")
      assert(members.values.map(_._2).toSet == Set(members.size.toLong),
        s"cluster $cluster sizes inconsistent")
    }
    assert(rows.exists(r => r._2._3 && r._1 == r._2._1), "is_rep must mark the min-id member")
  }

  test("metadata-only projection does not read payload bytes (column pruning)") {
    val dir = writeFixtures()
    val plan = MultimodalOps.readBinaryDir(spark, dir.toString)
      .select("doc_id", "length").queryExecution.executedPlan.toString
    assert(!plan.contains("content"), s"payload column not pruned from scan:\n$plan")
  }
}

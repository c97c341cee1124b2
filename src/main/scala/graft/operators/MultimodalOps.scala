package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, fixed-size framing, and a feature-extraction pass over the
  * bytes via a typed Dataset + mapPartitions.
  *
  * The decode step is REAL for every format a pure JVM can decode — PNM
  * rasters and compressed PNG/JPEG/GIF/BMP (→ per-row mean intensity,
  * the compressed path via the JDK's own `javax.imageio`, headless, no
  * JNI) and RIFF/WAVE 16-bit PCM (→ per-256-sample loudness envelope),
  * via [[AutoFrameDecoder]] / [[Codecs]] — and falls back to the
  * deterministic [[StubFrameDecoder]] byte statistics for any other (or
  * malformed) payload, so a corrupt file degrades instead of failing the
  * job. Formats with no JDK codec (MP3, H.264) would slot into the same
  * [[FrameDecoder]] interface via JNI/FFI; those libraries are not in
  * this container.
  *
  * Scale notes: payload bytes never leave their partition (narrow map);
  * metadata projections are codegen'd; at 100 TB the binary column would
  * live in its own parquet column chunk and column pruning keeps metadata
  * queries from reading payload bytes at all.
  */
/** The decode extension point: turns an opaque payload into per-frame
  * feature values. Implementations must be Serializable — they ship into
  * the executors inside the mapPartitions closure. The default
  * [[AutoFrameDecoder]] really decodes PNM, PNG, JPEG, GIF, BMP and WAV;
  * a real deployment plugs a JNI/FFI codec in here only for formats the
  * JDK cannot decode (video, MP3). Everything around the interface —
  * binary column pruning, typed encoders, partition-local batch shape,
  * sampling/resize — is decoder-independent.
  */
trait FrameDecoder extends Serializable {
  /** One float per decoded frame; empty payload → empty array. */
  def decode(payload: Array[Byte]): Array[Float]
}

/** STUB decode (declared, SURVEY §2): mean byte value per 32-byte frame —
  * deterministic, codec-free, preserves the real batch/shape contract.
  */
object StubFrameDecoder extends FrameDecoder {
  override def decode(payload: Array[Byte]): Array[Float] =
    payload.grouped(32).map(fr => fr.map(_ & 0xff).sum.toFloat / fr.length).toArray
}

object MultimodalOps {

  final case class DocBytes(doc_id: Long, payload: Array[Byte])
  final case class DocFeat(
      doc_id: Long, n_bytes: Int, mean_byte: Double, frames: Array[Float],
      sampled: Array[Float], resized: Array[Float])

  /** Stride for frame sampling (every k-th frame — the video keyframe
    * analog) and the fixed bin count for resize (mean-pool to a constant
    * resolution regardless of payload size — the image-resize analog).
    */
  val SampleStride = 4
  val ResizeBins = 8

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")

  /** Binary payload + typed metadata (kind, frame count, dimensions). */
  private def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"))
      .select(col("doc_id"), col("byte_len"),
        expr("(byte_len + 255) div 256").as("n_frames"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").as("kind"),
        (lit(64L) + col("doc_id") % 576).as("width"),
        (lit(64L) + col("doc_id") % 416).as("height"))
      .orderBy("doc_id")

  /** Typed feature extraction over any (doc_id, payload: BINARY) frame:
    * the shared pass behind [[multimodalFeatures]] (text cast to bytes,
    * oracle-comparable) and the real opaque-file path ([[binaryFeatures]]
    * via the `binaryFile` source). The decode step is injected via
    * [[FrameDecoder]]; the default [[AutoFrameDecoder]] really decodes
    * PNM/PNG/JPEG/GIF/BMP/WAV payloads and keeps the stub
    * byte-statistics for everything else — text payloads (no image/RIFF
    * magic; BMP's printable "BM" prefix additionally requires a
    * plausible binary header) are decoded identically to the stub, so
    * the declared `multimodal_features` output is unchanged.
    *
    * RESIDUAL RISK (documented, deliberately accepted): the ASCII P2/P3
    * PNM variants are printable text, so a text payload that IS a valid
    * ASCII PNM end to end would be decoded as an image rather than
    * byte-statistics. The signature is strict — magic + single
    * whitespace, exactly w·h·planes in-range integer tokens, and NOTHING
    * but whitespace/comments after the raster (Codecs.decodeAsciiPnm) —
    * so a natural-language document cannot trip it; only a document that
    * is a well-formed PNM in its entirety can, and decoding that one as
    * an image is arguably the correct reading.
    */
  private[graft] def featuresOf(
      spark: SparkSession, payloads: DataFrame,
      decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[DocBytes]
      .mapPartitions { it =>
        it.map { d =>
          val frames = decoder.decode(d.payload)
          val mean =
            if (d.payload.isEmpty) 0.0
            else d.payload.map(_ & 0xff).sum.toDouble / d.payload.length
          // frame-sample: every SampleStride-th frame (keyframe analog)
          val sampled = frames.indices.collect {
            case i if i % SampleStride == 0 => frames(i)
          }.toArray
          // resize: mean-pool to ResizeBins fixed bins (bin b covers
          // frames [b*n/8, max(that+1, (b+1)*n/8)) — every payload maps to
          // the same output shape)
          val n = frames.length
          val resized =
            if (n == 0) Array.fill(ResizeBins)(0f)
            else Array.tabulate(ResizeBins) { b =>
              // Long arithmetic — b*n overflows Int past ~306M frames
              val lo = (b.toLong * n / ResizeBins).toInt
              val hi = math.min(n, math.max(lo + 1, ((b + 1).toLong * n / ResizeBins).toInt))
              val slice = frames.slice(lo, hi)
              slice.sum / slice.length
            }
          DocFeat(d.doc_id, d.payload.length, mean, frames, sampled, resized)
        }
      }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("mean_byte"),
        size(col("frames")).as("n_frames"), element_at(col("frames"), 1).as("f0"),
        size(col("sampled")).as("n_sampled"), element_at(col("resized"), 1).as("r0"))
      .orderBy("doc_id")
  }

  private def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    featuresOf(spark,
      docs(spark, sfDir).select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** Number of pooled bins behind the 64-bit dHash: 64 adjacent-bin
    * comparisons need 65 bins (the classic 9×8-pixel image dHash, one
    * dimension down — the decoders reduce a raster to its per-row
    * intensity profile, so the difference hash runs over that profile).
    */
  private val DHashBins = 65

  /** 64-bit difference hash of a decoded intensity profile: mean-pool to
    * [[DHashBins]] bins (the same pooling scheme as the resize feature),
    * bit i = 1 iff bin(i+1) > bin(i). Perceptual by construction — small
    * pixel noise barely moves bin means, so near-identical rasters land
    * within a few bits, while structurally different rasters (e.g. an
    * inverted gradient) flip many comparisons. Deterministic, pure
    * arithmetic; the nearest-match archetype of the reference's palette
    * search (`src/ansi.tpp:339-363`) lifted to the raster grain.
    * Caller filters empty frame arrays (no raster → no code — the
    * 0-bigram charlm discipline).
    */
  private def dHashBinsOf(frames: Array[Float]): Array[Double] = {
    val n = frames.length
    Array.tabulate(DHashBins) { b =>
      // Long arithmetic: b*n overflows Int past ~33M frames (a long
      // audio's loudness envelope is exactly that shape)
      val lo = (b.toLong * n / DHashBins).toInt
      val hi = math.min(n, math.max(lo + 1, ((b + 1).toLong * n / DHashBins).toInt))
      var s = 0.0
      var j = lo
      while (j < hi) { s += frames(j); j += 1 }
      s / (hi - lo)
    }
  }

  private[graft] def dHashOf(frames: Array[Float]): Long = {
    val n = frames.length
    require(n > 0, "dHashOf needs a non-empty profile")
    val bins = dHashBinsOf(frames)
    var code = 0L
    var i = 0
    while (i < 64) {
      if (bins(i + 1) > bins(i)) code |= (1L << i)
      i += 1
    }
    code
  }

  /** [[dHashOf]] with the DEGENERATE-PROFILE POLICY (r18 verdict task 3):
    * a profile whose [[DHashBins]] pooled means collapse to fewer than
    * two distinct values — a flat raster, a constant tone, or a payload
    * too short to give the bins any structure — hashes to code ~0, and
    * at corpus scale every such payload would cross-pair at hamming 0
    * and chain into one giant vacuous "near-dup" class (bounded by the
    * hot-bucket star guard, but a precision flood all the same). Such
    * profiles emit NO signature: a flat icon is perceptually "like every
    * other flat icon" only in the sense that tells a curation pipeline
    * nothing, so the dedup keys treat it like an empty payload — present
    * in the corpus, a singleton in the cluster view, never a pair.
    * Profiles with any structure at all (≥ 2 distinct pooled bins) hash
    * exactly as before.
    */
  private[graft] def dHashCodeOpt(frames: Array[Float]): Option[Long] = {
    if (frames.isEmpty) return None
    val bins = dHashBinsOf(frames)
    val first = bins(0)
    var degenerate = true
    var i = 1
    while (degenerate && i < DHashBins) {
      if (bins(i) != first) degenerate = false
      i += 1
    }
    if (degenerate) None
    else {
      var code = 0L
      var j = 0
      while (j < 64) {
        if (bins(j + 1) > bins(j)) code |= (1L << j)
        j += 1
      }
      Some(code)
    }
  }

  final case class DocHash(doc_id: Long, simhash: Long)

  /** Perceptual near-dup pairs over opaque payloads: decode → [[dHashOf]]
    * → the SAME 4×16-bit pigeonhole banding + `bit_count(xor)` verify as
    * the token-SimHash family ([[DedupOps.hammingPairsScored]] — the
    * machinery is shared, not duplicated). Decode is a second use of the
    * documented typed-decode slot, kept LEAN on purpose: it emits only
    * `(doc_id, code)` — at 100 TB the neardup pass must not carry frame
    * arrays or payload bytes past the map, and the banding join then
    * shuffles 16 bytes/doc, never pixels. Docs whose payload decodes to
    * an empty OR DEGENERATE profile (empty payload, flat raster,
    * constant tone — [[dHashCodeOpt]]'s policy) carry no code and never
    * pair: they stay in the corpus as singletons instead of flooding
    * the hamming-0 bucket with vacuous pairs (r18 verdict task 3).
    */
  private[graft] def perceptualPairs(
      spark: SparkSession, payloads: DataFrame,
      decoder: FrameDecoder = AutoFrameDecoder): DataFrame =
    DedupOps.hammingPairsScored(perceptualCodes(spark, payloads, decoder))

  /** The lean decode pass alone: one `(doc_id, simhash)` row per doc
    * whose payload yields a non-degenerate profile (the column is named
    * `simhash` because [[DedupOps.hammingPairsScored]] and the streaming
    * gate's banding are agnostic to where the 64-bit code came from).
    * Shared by the batch pair generation above and the streaming
    * perceptual ingest gate ([[graft.streaming.PerceptGate]]), so the
    * online and batch signatures can never drift.
    */
  private[graft] def perceptualCodes(
      spark: SparkSession, payloads: DataFrame,
      decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[DocBytes]
      .mapPartitions { it =>
        it.flatMap { d =>
          dHashCodeOpt(decoder.decode(d.payload)).map(DocHash(d.doc_id, _))
        }
      }.toDF()
  }

  /** The corpus's image-kind payloads (the [[multimodalMeta]]
    * `doc_id % 3 = 0` convention) — shared input of the perceptual
    * dedup keys.
    */
  private def imagePayloads(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Declared key: perceptual image near-dup over [[imagePayloads]] —
    * the dedup member of the multimodal family (r18 verdict task 2).
    * Emits `(doc_a, doc_b, hamming)` with true hamming ≤ 3, exactly the
    * `dedup_simhash_pairs` relation at the raster grain. No oracle
    * (hash-derived, like the simhash family); MultimodalSpec pins
    * planted near-identical rasters flagging, distinct rasters not, and
    * stub-decoded text payloads passing through unflagged.
    */
  private def multimodalNeardup(spark: SparkSession, sfDir: String): DataFrame =
    perceptualPairs(spark, imagePayloads(spark, sfDir))
      .orderBy("doc_a", "doc_b")

  /** Perceptual dedup CLUSTERS — the multimodal member of the production
    * clustering family (token MinHash `dedup_clusters_minhash`, token
    * hamming `dedup_clusters_simhash`, embedding cosine
    * `embed_clusters_lsh`): [[perceptualPairs]] edges (true VERIFIED
    * hamming ≤ 3, so as with simhash there is no false-edge class to
    * gate before the transitive closure) → checkpointed connected
    * components → min-id representative. Image-kind docs whose payload
    * yields no code (empty or degenerate profile — [[dHashCodeOpt]]),
    * or no neighbor, are singleton clusters — every doc gets a cluster
    * row, the dedup-cluster contract. Path halving ON
    * for the same reason as the simhash sibling: hamming neighborhoods
    * chain into wide-diameter components.
    */
  private def multimodalClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = imagePayloads(spark, sfDir)
    val edges = perceptualPairs(spark, payloads)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    DedupOps.clusterReportReleased(payloads.select("doc_id"), edges,
      s"multimodal_clusters_$sfDir", compress = true)
  }

  /** Opaque files through the REAL `binaryFile` source (SURVEY §1.4 row 1:
    * the client's `std::ifstream(..., std::ios::binary)`,
    * `transf_client.cpp:102`): one row per file with path/length/bytes,
    * doc_id recovered from digits in the filename. The scan is
    * partition-parallel and prunes to metadata columns when `payload`
    * is not selected.
    */
  private[graft] def readBinaryDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      // id = last digit run of the FILENAME (a digit run in a parent
      // directory must not leak in); files without digits fall back to a
      // NEGATIVE path hash — a disjoint namespace from the non-negative
      // digit-derived ids, so a hash can never collide with a real id —
      // and doc_id is never null (the typed decode reads a primitive Long)
      .withColumn("fname", element_at(split(col("path"), "/"), -1))
      .select(
        coalesce(
          nullif(regexp_extract(col("fname"), "([0-9]+)[^0-9]*$", 1), lit("")).cast("long"),
          -lit(1L) - pmod(xxhash64(col("path")), lit(1000000007L))).as("doc_id"),
        col("path"), col("length"), col("content").as("payload"))

  /** Feature extraction over real opaque files: binaryFile scan → the same
    * typed mapPartitions decode slot as the parquet path, with the decoder
    * injectable per call site.
    */
  def binaryFeatures(
      spark: SparkSession, dir: String,
      decoder: FrameDecoder = AutoFrameDecoder): DataFrame =
    featuresOf(spark, readBinaryDir(spark, dir), decoder)

  // ---- declarations ------------------------------------------------------

  val defs: Map[String, QueryDef] = Map(
    "multimodal_meta" -> QueryDef(multimodalMeta,
      Some("""WITH b AS (
             |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len FROM documents)
             |SELECT doc_id, byte_len, (byte_len + 255) // 256 AS n_frames,
             |       CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             |       64 + doc_id % 576 AS width, 64 + doc_id % 416 AS height
             |FROM b ORDER BY doc_id""".stripMargin)),

    "multimodal_features" -> QueryDef(multimodalFeatures, None),

    "multimodal_neardup" -> QueryDef(multimodalNeardup, None),

    "multimodal_clusters" -> QueryDef(multimodalClusters, None)
  )
}

package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's transfer pipeline re-expressed relationally over the
  * `documents` table: fixed-width chunking (reference: 1999 B payload per
  * frame, `transf_client.cpp:126-133`), frame encode/decode
  * (`transf_client.cpp:163-170` / `transf_server.cpp:252-287`), filename
  * validation (`transf_server.cpp:164-167`), byte clamping of the final
  * chunk (`transf_server.cpp:277-283`), and ordered reassembly
  * (`transf_server.cpp:275-294`).
  *
  * Scale notes: `chunk_split` is a generate (flatMap) — no shuffle; the
  * round-trip's only shuffle is the final groupBy(doc_id), which is the
  * minimal possible exchange for reassembly and partitions evenly by key.
  * Nothing collects to the driver; all string math is codegen'd Column
  * algebra (no UDFs).
  */
object PipelineOps {

  /** Chunk width in chars. The reference uses a 2048 B buffer => 1999 B
    * payload (`transf_client.cpp:127`); 64 exercises multi-chunk documents
    * on the test corpus (avg doc ~306 chars).
    */
  val C = 64

  /** Frame layout mirrors SURVEY §1.2: tag(9) ∥ uuid(36) ∥ seq(8) ∥ payload,
    * re-expressed textually (tag = \v + "TRANSFER", zero-padded decimal ids)
    * so a SQL oracle can reproduce it byte-for-byte.
    */
  private val TagSql = "chr(11) || 'TRANSFER'"

  private def chunks(spark: SparkSession, sfDir: String): DataFrame =
    chunksAt(spark, sfDir, C)

  /** Width-parameterized chunking (package-visible for the round-trip
    * property tests over degenerate widths, FIXTURES.md §B1).
    */
  private[graft] def chunksAt(spark: SparkSession, sfDir: String, width: Int): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(
        col("doc_id"), col("text"), col("n_chars"),
        posexplode(expr(
          s"transform(sequence(1, greatest(1, cast(ceil(length(text)/$width.0) as int))), i -> substring(text, (i-1)*$width+1, $width))"
        )).as(Seq("pos", "chunk")))
      .withColumn("seq", (col("pos") + 1).cast("long"))
      .drop("pos")

  /** Shared oracle CTE producing (doc_id, text, n_chars, seq, chunk). */
  private def chunksCte: String =
    s"""WITH spans AS (
       |  SELECT doc_id, text, n_chars,
       |         unnest(generate_series(1, greatest(1, CAST(ceil(length(text)/$C.0) AS BIGINT)))) AS seq
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, text, n_chars, seq,
       |         substring(text, CAST((seq-1)*$C+1 AS BIGINT), $C) AS chunk
       |  FROM spans
       |)""".stripMargin

  private def frameCol = concat(
    expr(TagSql),
    lpad(col("doc_id").cast("string"), 36, "0"),
    lpad(col("seq").cast("string"), 8, "0"),
    col("chunk"))

  // ---- queries -----------------------------------------------------------

  /** A3: fixed-size chunking with 1-based sequence numbers. */
  private def chunkSplit(spark: SparkSession, sfDir: String): DataFrame =
    chunks(spark, sfDir)
      .select(col("doc_id"), col("seq"), col("chunk"))
      .orderBy("doc_id", "seq")

  /** A4: frame encode — tag ∥ uuid36 ∥ seq8 ∥ payload. */
  private def frameEncode(spark: SparkSession, sfDir: String): DataFrame =
    chunks(spark, sfDir)
      .select(col("doc_id"), col("seq"), frameCol.as("frame"))
      .orderBy("doc_id", "seq")

  /** A5+A6: frame decode — substring field extraction + tag validation,
    * inverse of [[frameEncode]] (frames built inline, then parsed).
    */
  private def frameDecode(spark: SparkSession, sfDir: String): DataFrame =
    chunks(spark, sfDir)
      .select(frameCol.as("frame"))
      .select(
        expr("CAST(substring(frame, 10, 36) AS BIGINT)").as("doc_id"),
        expr("CAST(substring(frame, 46, 8) AS BIGINT)").as("seq"),
        expr("substring(frame, 54)").as("payload"),
        expr(s"substring(frame, 1, 9) = $TagSql").as("tag_ok"))
      .orderBy("doc_id", "seq")

  /** Flagship: full round trip — chunk → encode → decode → ordered
    * reassembly (array_sort(collect_list(struct)) = the batch analog of the
    * server's running-offset append, `transf_server.cpp:275-294`) — must
    * reproduce `documents.text` exactly.
    */
  def roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val decoded = chunks(spark, sfDir)
      .select(frameCol.as("frame"))
      .select(
        expr("CAST(substring(frame, 10, 36) AS BIGINT)").as("doc_id"),
        expr("CAST(substring(frame, 46, 8) AS BIGINT)").as("seq"),
        expr("substring(frame, 54)").as("payload"))
    val reassembled = decoded
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        concat_ws("", expr("transform(array_sort(collect_list(struct(seq, payload))), x -> x.payload)"))
          .as("reassembled"))
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    reassembled
      .join(docs, "doc_id")
      .select(col("doc_id"), col("n_chunks"), (col("reassembled") === col("text")).as("ok"))
      .orderBy("doc_id")
  }

  /** A10 clamp math: bytes accepted for a chunk = min(max(remaining,0), C). */
  private def clampFinalChunk(spark: SparkSession, sfDir: String): DataFrame =
    chunks(spark, sfDir)
      .select(
        col("doc_id"), col("seq"),
        expr(s"least(greatest(n_chars - (seq-1)*$C, 0), $C)").as("clamped"),
        length(col("chunk")).cast("long").as("payload_len"))
      .withColumn("ok", col("clamped") === col("payload_len"))
      .orderBy("doc_id", "seq")

  /** A7: filename sanitization — reject empty, absolute, or '..' paths. */
  private def validateFilename(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr(
          """CASE WHEN doc_id % 4 = 0 THEN '/' || source || '/abs.bin'
            |     WHEN doc_id % 4 = 1 THEN 'a/../' || source
            |     WHEN doc_id % 4 = 2 THEN ''
            |     ELSE 'dir/' || source || '.bin' END""".stripMargin).as("path"))
      .filter(not(col("path") === "" or col("path").like("/%") or col("path").like("%..%")))
      .orderBy("doc_id")

  /** A12: client-side ack verification (`transf_client.cpp:174-194`) —
    * after each TRANSFER the client requires an ack that (a) arrived,
    * (b) echoes the session uuid, and (c) carries seq+1; anything else
    * aborts the send. Replayed relationally: acks are synthesized from the
    * sent frames with deterministic fault injection (lost ack, corrupted
    * uuid echo, stale seq echo), and the query returns exactly the frames
    * a client would abort on — the sent-vs-acked anti-join, with the
    * failure classified. The join is a co-partitioned equi-join on
    * (doc_id, seq); at scale both sides shuffle once on the same composite
    * key.
    */
  private def ackVerify(spark: SparkSession, sfDir: String): DataFrame = {
    val sent = chunks(spark, sfDir).select(col("doc_id"), col("seq"))
    val acks = sent
      .filter(expr("(doc_id * 31 + seq) % 97 <> 0")) // lost in transit
      .select(col("doc_id"), col("seq"),
        expr("CASE WHEN (doc_id * 13 + seq) % 83 = 0 THEN doc_id + 1 ELSE doc_id END").as("ack_doc"),
        expr("CASE WHEN (doc_id * 17 + seq) % 89 = 0 THEN seq ELSE seq + 1 END").as("ack_seq"))
    sent.join(acks, Seq("doc_id", "seq"), "left")
      .withColumn("reason",
        when(col("ack_seq").isNull, "MISSING")
          .when(col("ack_doc") =!= col("doc_id"), "BAD_UUID")
          .when(col("ack_seq") =!= col("seq") + 1, "BAD_SEQ"))
      .filter(col("reason").isNotNull)
      .select("doc_id", "seq", "reason")
      .orderBy("doc_id", "seq")
  }

  /** A20: basename extraction (find_last_of("/\\") + substr). */
  private def extractBasename(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), concat(lit("dir/sub/"), col("source"), lit(".bin")).as("path"))
      .withColumn("basename", element_at(split(col("path"), "/"), -1))
      .orderBy("doc_id")

  /** A23: ANSI escape stripping via regexp_replace. */
  private def stripAnsi(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        concat(lit("\u001b[31m"), col("lang"), lit("\u001b[0m")).as("wrapped"))
      .select(col("doc_id"), col("lang"),
        length(col("wrapped")).cast("long").as("wrapped_len"),
        regexp_replace(col("wrapped"), "\u001b\\[[0-9;]*m", "").as("stripped"))
      .withColumn("ok", col("stripped") === col("lang"))
      .orderBy("doc_id")

  // ---- declarations ------------------------------------------------------

  val defs: Map[String, QueryDef] = Map(
    "chunk_split" -> QueryDef(chunkSplit,
      Some(s"""$chunksCte
              |SELECT doc_id, seq, chunk FROM c ORDER BY doc_id, seq""".stripMargin)),

    "frame_encode" -> QueryDef(frameEncode,
      Some(s"""$chunksCte
              |SELECT doc_id, seq,
              |       $TagSql || lpad(CAST(doc_id AS VARCHAR), 36, '0') || lpad(CAST(seq AS VARCHAR), 8, '0') || chunk AS frame
              |FROM c ORDER BY doc_id, seq""".stripMargin)),

    "frame_decode" -> QueryDef(frameDecode,
      Some(s"""$chunksCte, f AS (
              |  SELECT $TagSql || lpad(CAST(doc_id AS VARCHAR), 36, '0') || lpad(CAST(seq AS VARCHAR), 8, '0') || chunk AS frame FROM c
              |)
              |SELECT CAST(substring(frame, 10, 36) AS BIGINT) AS doc_id,
              |       CAST(substring(frame, 46, 8) AS BIGINT) AS seq,
              |       substring(frame, 54) AS payload,
              |       substring(frame, 1, 9) = $TagSql AS tag_ok
              |FROM f ORDER BY doc_id, seq""".stripMargin)),

    "roundtrip_pipeline" -> QueryDef(roundtrip,
      Some(s"""$chunksCte, r AS (
              |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
              |         string_agg(chunk, '' ORDER BY seq) AS reassembled
              |  FROM c GROUP BY doc_id
              |)
              |SELECT r.doc_id, r.n_chunks, (r.reassembled = d.text) AS ok
              |FROM r JOIN documents d ON r.doc_id = d.doc_id
              |ORDER BY r.doc_id""".stripMargin)),

    "clamp_final_chunk" -> QueryDef(clampFinalChunk,
      Some(s"""$chunksCte
              |SELECT doc_id, seq,
              |       least(greatest(n_chars - (seq-1)*$C, 0), $C) AS clamped,
              |       CAST(length(chunk) AS BIGINT) AS payload_len,
              |       least(greatest(n_chars - (seq-1)*$C, 0), $C) = CAST(length(chunk) AS BIGINT) AS ok
              |FROM c ORDER BY doc_id, seq""".stripMargin)),

    "ack_verify" -> QueryDef(ackVerify,
      Some(s"""$chunksCte, sent AS (SELECT doc_id, seq FROM c),
              |acks AS (
              |  SELECT doc_id, seq,
              |         CASE WHEN (doc_id * 13 + seq) % 83 = 0 THEN doc_id + 1 ELSE doc_id END AS ack_doc,
              |         CASE WHEN (doc_id * 17 + seq) % 89 = 0 THEN seq ELSE seq + 1 END AS ack_seq
              |  FROM sent WHERE (doc_id * 31 + seq) % 97 <> 0)
              |SELECT s.doc_id, s.seq,
              |       CASE WHEN a.ack_seq IS NULL THEN 'MISSING'
              |            WHEN a.ack_doc <> s.doc_id THEN 'BAD_UUID'
              |            WHEN a.ack_seq <> s.seq + 1 THEN 'BAD_SEQ' END AS reason
              |FROM sent s LEFT JOIN acks a ON s.doc_id = a.doc_id AND s.seq = a.seq
              |WHERE a.ack_seq IS NULL OR a.ack_doc <> s.doc_id OR a.ack_seq <> s.seq + 1
              |ORDER BY s.doc_id, s.seq""".stripMargin)),

    "validate_filename" -> QueryDef(validateFilename,
      Some("""WITH p AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 4 = 0 THEN '/' || source || '/abs.bin'
             |              WHEN doc_id % 4 = 1 THEN 'a/../' || source
             |              WHEN doc_id % 4 = 2 THEN ''
             |              ELSE 'dir/' || source || '.bin' END AS path
             |  FROM documents)
             |SELECT doc_id, path FROM p
             |WHERE NOT (path = '' OR path LIKE '/%' OR path LIKE '%..%')
             |ORDER BY doc_id""".stripMargin)),

    "extract_basename" -> QueryDef(extractBasename,
      Some("""SELECT doc_id, 'dir/sub/' || source || '.bin' AS path,
             |       string_split('dir/sub/' || source || '.bin', '/')[-1] AS basename
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "strip_ansi" -> QueryDef(stripAnsi,
      Some("""WITH w AS (
             |  SELECT doc_id, lang, chr(27) || '[31m' || lang || chr(27) || '[0m' AS wrapped FROM documents)
             |SELECT doc_id, lang, CAST(length(wrapped) AS BIGINT) AS wrapped_len,
             |       regexp_replace(wrapped, chr(27) || '\[[0-9;]*m', '', 'g') AS stripped,
             |       regexp_replace(wrapped, chr(27) || '\[[0-9;]*m', '', 'g') = lang AS ok
             |FROM w ORDER BY doc_id""".stripMargin))
  )
}

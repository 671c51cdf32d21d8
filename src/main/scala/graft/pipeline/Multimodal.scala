package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction is a
  * clearly-marked deterministic STUB (this container has no codec
  * libraries), while everything Spark-side - schema, narrow per-row
  * shape, explode-based frame fan-out, partition-friendly keys - is
  * real and oracle-checked.
  *
  * The `documents.text` bytes stand in for the media payload; at 100 TB
  * the same plan shape applies to real image/audio/video bytes.
  */
object Multimodal {

  val frameSizeBytes = 1000
  val frameStride = 2

  /** STUB decode: width/height/format derived deterministically from
    * the content digest, standing in for an image-header parse.
    */
  def binaryStats(spark: SparkSession, sfDir: String): DataFrame =
    Graft.tableParallel(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", expr("octet_length(payload)").cast(LongType))
      .withColumn("digest", md5(col("payload")))
      .withColumn("width", expr(
        "CAST(64 + (instr('0123456789abcdef', substring(digest, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(digest, 2, 1)) - 1) AS BIGINT)"))
      .withColumn("height", expr(
        "CAST(64 + (instr('0123456789abcdef', substring(digest, 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(digest, 4, 1)) - 1) AS BIGINT)"))
      .withColumn("format", expr(
        "element_at(array('jpeg', 'png', 'webp'), CAST((instr('0123456789abcdef', substring(digest, 5, 1)) - 1) % 3 AS INT) + 1)"))
      .withColumn("n_frames",
        (col("n_bytes") / frameSizeBytes).cast(LongType) + 1)
      .select(col("doc_id"), col("n_bytes"), col("digest"), col("width"),
        col("height"), col("format"), col("n_frames"))
      .orderBy(col("doc_id"))

  val binaryStatsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |         md5(text) AS digest
       |  FROM documents
       |)
       |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, digest,
       |  CAST(64 + (strpos('0123456789abcdef', substr(digest, 1, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substr(digest, 2, 1)) - 1)
       |       AS BIGINT) AS width,
       |  CAST(64 + (strpos('0123456789abcdef', substr(digest, 3, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substr(digest, 4, 1)) - 1)
       |       AS BIGINT) AS height,
       |  ['jpeg', 'png', 'webp']
       |    [((strpos('0123456789abcdef', substr(digest, 5, 1)) - 1) % 3) + 1]
       |    AS format,
       |  CAST(n_bytes // $frameSizeBytes + 1 AS BIGINT) AS n_frames
       |FROM t ORDER BY doc_id""".stripMargin

  /** Typed rows for the batched-decode path. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, n_bytes: Long, digest: String,
                              width: Long, height: Long, format: String)

  /** Batched decode via mapPartitions - the Scala analog of a
    * mapInPandas decode stage: the (expensive) codec is initialized
    * ONCE per partition and the partition's rows stream through it as
    * one batch. The codec itself is a deterministic STUB (md5-derived
    * header fields, same derivation as `binaryStats`, so the same
    * oracle applies); swapping in a real image/audio decoder changes
    * only the body of `decodeOne`.
    */
  def decodeBatched(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    val hexv = "0123456789abcdef"
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init ≙ loading codec/model weights once
        val md = java.security.MessageDigest.getInstance("MD5")
        def decodeOne(r: MediaRow): DecodedRow = {
          md.reset()
          val digest = md.digest(r.payload).map(b => f"$b%02x").mkString
          def nib(i: Int): Int = hexv.indexOf(digest.charAt(i))
          DecodedRow(r.doc_id, r.payload.length.toLong, digest,
            64L + nib(0) * 16 + nib(1), 64L + nib(2) * 16 + nib(3),
            Seq("jpeg", "png", "webp")(nib(4) % 3))
        }
        rows.map(decodeOne)
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Same header fields as binaryStats - the mapPartitions decode and
    * the declarative derivation must agree.
    */
  val decodeBatchedSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |         md5(text) AS digest
       |  FROM documents
       |)
       |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, digest,
       |  CAST(64 + (strpos('0123456789abcdef', substr(digest, 1, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substr(digest, 2, 1)) - 1)
       |       AS BIGINT) AS width,
       |  CAST(64 + (strpos('0123456789abcdef', substr(digest, 3, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substr(digest, 4, 1)) - 1)
       |       AS BIGINT) AS height,
       |  ['jpeg', 'png', 'webp']
       |    [((strpos('0123456789abcdef', substr(digest, 5, 1)) - 1) % 3) + 1]
       |    AS format
       |FROM t ORDER BY doc_id""".stripMargin

  /** Frame-sampling plumbing: each payload fans out to stride-sampled
    * frame-index rows (explode = the distributed flatMap); the per-frame
    * "feature" is a STUB digest. Narrow: no shuffle at any width.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    binaryStats(spark, sfDir)
      .select(col("doc_id"), col("digest"), col("n_frames"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0L, n_frames - 1, $frameStride)")))
      .withColumn("frame_feature",
        md5(concat(col("digest"), lit(":"), col("frame_idx"))))
      .select(col("doc_id"), col("frame_idx"), col("frame_feature"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val frameSampleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, md5(text) AS digest,
       |         octet_length(encode(text)) // $frameSizeBytes + 1 AS n_frames
       |  FROM documents
       |)
       |SELECT doc_id, CAST(unnest(range(0, n_frames, $frameStride)) AS BIGINT)
       |         AS frame_idx,
       |       md5(digest || ':'
       |           || CAST(unnest(range(0, n_frames, $frameStride)) AS VARCHAR))
       |         AS frame_feature
       |FROM t ORDER BY doc_id, frame_idx""".stripMargin
}

package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2f multimodal columns.
  *
  * m_json_extract: typed metadata out of the events props JSON — the
  * NotifyHTTPParam payload analog (gotimer_web/app/webserver API
  * params are JSON blobs on the timer row).
  *
  * m_binary_pipeline: an opaque binary payload column pushed through
  * distributed per-partition processing — the Spark-side plumbing
  * (schema, typed Encoder, partition-local state, batch shape) is
  * real; the media DECODE step is a deterministic STUB (this
  * container has no image/audio codecs), clearly marked below.
  */
/** Encoder row types for the binary pipeline (top-level: Spark's
  * generated deserializer code can't reach private nested classes). */
case class Payload(doc_id: Long, text: String)
case class Decoded(doc_id: Long, byte_len: Int, payload_md5: String,
    width: Int, height: Int)

object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Typed extraction from the props JSON column: get_json_object is
    * codegen'd; no UDF, and NO shuffle at all — the former
    * per-event_id output sort was purely presentational (the
    * correctness gate sorts rows before hashing) and cost a global
    * range-exchange of every extracted row. */
  def mJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("k_bucket", pmod(col("k"), lit(10)))

  /** Binary payload pipeline via mapPartitions over a typed Dataset:
    * one MessageDigest per partition (not per row), rows streamed.
    * byte_len/md5 are real; width/height are the STUBBED "decode"
    * (deterministic fake dims derived from byte length — a real
    * deployment swaps in the codec here, the distributed shape is
    * unchanged). */
  def mBinaryPipeline(s: SparkSession, dir: String): DataFrame = {
    val session = s
    import session.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[Payload]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { p =>
          val bytes = p.text.getBytes(StandardCharsets.UTF_8)
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          // STUB decode: fake dims stand in for image width/height
          Decoded(p.doc_id, bytes.length, hex, bytes.length % 640, bytes.length % 480)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over the opaque payload — the video/audio analog
    * of context chunking: keep a fixed-length frame every `stride`
    * bytes (here 64 of every 256 — a 25% sample), emitting per-frame
    * offset/length/digest. The real decoder slots where the substring
    * sits (the same stub seam as mBinaryPipeline); the SAMPLING
    * plumbing — per-row explode, zero shuffle, frames never crossing
    * payloads — is real and oracle-checked. Byte slicing is exact in
    * BOTH engines because the corpus is spec-pinned ASCII (DedupSpec):
    * char offsets ≡ byte offsets, so the mirror slices the string. */
  def mFrameSample(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 64
    val stride = 256
    Tables.documents(s, dir)
      .withColumn("f", explode(expr(
        s"""transform(sequence(0, (length(text) - 1) div $stride),
           |  i -> struct(i AS frame_idx, i * $stride AS frame_off,
           |    substring(text, i * $stride + 1, $frameLen) AS frame))""".stripMargin)))
      .select(col("doc_id"), col("f.frame_idx"), col("f.frame_off"),
        length(col("f.frame")).as("frame_len"),
        md5(col("f.frame").cast("binary")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: ListMap[String, Q] = ListMap(
    "m_json_extract" -> (mJsonExtract _),
    "m_binary_pipeline" -> (mBinaryPipeline _),
    "m_frame_sample" -> (mFrameSample _),
    "m_payload_dedup" -> (mPayloadDedup _),
  )

  /** Content-hash dedup of the binary payload — the first pass of
    * every multimodal store (image/audio dedup IS md5-of-bytes before
    * any perceptual hashing): group by payload digest, keep the
    * smallest id, and account the bytes deduplication reclaims —
    * (copies − 1) × payload size per group, the number a storage
    * owner actually reads. Same scale shape as d_exact_dedup: one
    * shuffle on the 128-bit digest, map-side partial agg; the payload
    * BYTES never shuffle — only (digest, id, len) rows do. */
  def mPayloadDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), md5(col("payload")).as("payload_md5"),
        length(col("payload")).as("byte_len"))
      .groupBy(col("payload_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        max(col("byte_len")).as("byte_len"), // identical within a group
        ((count(lit(1)) - 1) * max(col("byte_len"))).as("bytes_reclaimed"))
      .orderBy(col("keep_id"))

  val oracles: ListMap[String, String] = ListMap(
    "m_payload_dedup" ->
      """SELECT md5(text) AS payload_md5, min(doc_id) AS keep_id,
        |  count(*) AS n_copies,
        |  CAST(max(octet_length(encode(text))) AS INTEGER) AS byte_len,
        |  CAST((count(*) - 1) * max(octet_length(encode(text))) AS BIGINT) AS bytes_reclaimed
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "m_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  ((CAST(json_extract_string(props, '$.k') AS INTEGER) % 10) + 10) % 10 AS k_bucket
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "m_binary_pipeline" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  md5(text) AS payload_md5,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // static frame-index series 0..15 with headroom over the ≤2 frames
    // a max-length doc yields (same convention as x_doc_chunks)
    "m_frame_sample" ->
      """SELECT doc_id, i AS frame_idx, i * 256 AS frame_off,
        |  length(substring(text, i * 256 + 1, 64)) AS frame_len,
        |  md5(substring(text, i * 256 + 1, 64)) AS frame_md5
        |FROM documents CROSS JOIN (SELECT unnest(range(0, 16)) AS i)
        |WHERE i <= (length(text) - 1) // 256
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}

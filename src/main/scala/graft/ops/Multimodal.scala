package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * No media codecs exist in this environment, so the decode step is a
  * clearly-marked deterministic STUB ([[decodeStub]]) — but the Spark-side
  * plumbing is real: a typed `Dataset[MediaRecord]`, `mapPartitions` with a
  * per-partition batch loop (the Scala analogue of an arrow-batched
  * `mapInPandas` decode), an explicit feature schema, and partition-count
  * independence. Swapping [[decodeStub]] for a real JNI/codec call changes
  * nothing else. The stub's arithmetic is mirrored in the oracle, so even
  * the mapPartitions path is hash-verified.
  */
object Multimodal {

  /** One media object: id + raw bytes (here synthesized from document text —
    * the only binary source in the testdata). */
  final case class MediaRecord(doc_id: Long, content: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      content_hash: String)

  /** STUB decode: deterministic pseudo-metadata from the byte stream. A real
    * implementation would parse the container header; the shapes (one
    * struct per record, pure function of bytes) are identical. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.content.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = n,
      width = 16L + n % 640L,
      height = 16L + (n * 7L) % 480L,
      n_frames = Math.floorDiv(n - 1L, 1024L) + 1L, // floor (not truncate): n=0 must give 0 like the oracle's //
      content_hash = java.security.MessageDigest.getInstance("MD5")
        .digest(r.content).map("%02x".format(_)).mkString)
  }

  /** Documents as a binary media table (text bytes stand in for image/audio
    * payloads). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    // fanOut: the batch-decode mapPartitions kernels downstream are the
    // dense path; a one-row-group test file would serialize them (see
    // Tables.documentsWide)
    Tables.fanOut(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("content")))
      .as[MediaRecord]
  }

  /** Batch feature extraction: one `mapPartitions` pass, iterator-to-iterator
    * (no per-partition materialization — spill-safe at any partition size). */
  def extractFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** Target square side for [[resizePlan]] (the ubiquitous 224 of vision
    * encoders). */
  val TargetSide = 224L

  /** Resize plan: aspect-preserving letterbox of every media object's
    * (stub-decoded) dimensions into a [[TargetSide]]² canvas — output size
    * and padding, all in INTEGER arithmetic (floor via integer division)
    * so the plan is bit-identical in the oracle. A real resize kernel
    * consumes exactly these numbers; computing them is a pure projection
    * over the feature frame, no extra pass over the bytes. */
  def resizePlan(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, sfDir)
      .select(col("doc_id"), col("width"), col("height"))
      .withColumn("out_w",
        when(col("width") >= col("height"), lit(TargetSide))
          .otherwise(expr(s"width * $TargetSide DIV height")))
      .withColumn("out_h",
        when(col("width") >= col("height"),
          expr(s"height * $TargetSide DIV width"))
          .otherwise(lit(TargetSide)))
      .withColumn("pad_x", expr(s"($TargetSide - out_w) DIV 2"))
      .withColumn("pad_y", expr(s"($TargetSide - out_h) DIV 2"))
      .orderBy("doc_id")

  /** Frame sampling plan: for each media object, the byte offsets a sampler
    * would decode (every 1024 bytes) — generated per row with `sequence`,
    * exploded; pure column ops, no driver loop. */
  def frameSamplePlan(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      // empty payloads sample no frames (sequence(0,-1) would throw; the
      // oracle's range(0, 0, 1024) emits no row — match it with a filter)
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_bytes") - 1, lit(1024L))).as("frame_offset"))
      .orderBy("doc_id", "frame_offset")

  /** How many content groups [[mediaDedup]] reports. */
  val MediaDedupTopK = 20

  /** Exact dedup over the binary media column: byte-identical payloads
    * group by content hash (the perceptual-hash slot is the stubbed decode
    * step; the Spark-side plumbing — hash, group, keeper election — is the
    * real pipeline). Reports the [[MediaDedupTopK]] largest content
    * groups (keeper = smallest doc id, same convention as the text-side
    * `q_dedup_exact`); a clean corpus reports singleton groups rather
    * than an empty table. */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(encode(col("text"), "UTF-8")).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .orderBy(col("n_copies").desc, col("keeper"))
      .limit(MediaDedupTopK)

  /** Frame grain (chars) and report size for [[frameDedup]]. */
  val FrameLen = 1024
  val FrameDedupTopK = 20

  /** FRAME-level dedup: hash every [[FrameLen]]-grain frame of every
    * media object and group identical frames ACROSS objects — the video
    * analogue of [[mediaDedup]] (whole-file dedup misses near-identical
    * cuts of the same footage; frame dedup catches any shared aligned
    * segment). The frame grid is [[frameSamplePlan]]'s, so this is
    * exactly "run the dedup after the sampler" — with the perceptual
    * hash slot stubbed to md5 of the frame payload, like every decode
    * stub in this module. Frames cut on the CHARACTER grid of the
    * stand-in payload (both engines substring by codepoint; a byte grid
    * would need BLOB substring the oracle engine lacks — contract, not
    * compromise: a real perceptual hash is alignment-tolerant anyway).
    *
    * Pure explode → projection → one grouped count; the TopK cut is a
    * TakeOrdered. Scale cost is the decode pass itself. */
  def frameDedup(spark: SparkSession, sfDir: String): DataFrame =
    frameDedupOf(Tables.documents(spark, sfDir))

  /** [[frameDedup]] over any (doc_id, text) payload frame. */
  def frameDedupOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n_chars"))
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n_chars") - 1,
          lit(FrameLen.toLong))).as("frame_offset"))
      .select(col("doc_id"), col("frame_offset"),
        md5(expr(s"substring(text, frame_offset + 1, $FrameLen)"))
          .as("frame_hash"))
      .groupBy("frame_hash")
      .agg(count(lit(1)).as("n_copies"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"))
      .orderBy(col("n_copies").desc, col("keeper"), col("frame_hash"))
      .limit(FrameDedupTopK)
}

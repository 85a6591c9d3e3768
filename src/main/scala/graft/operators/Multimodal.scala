package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) modeled as an
  * opaque BINARY payload column plus typed metadata, the way a 100 TB
  * training corpus stores it (bytes in parquet, decode on demand).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * STUB — [[stubFeatures]] derives deterministic pseudo-features from
  * the raw bytes (header sniff + byte arithmetic), keeping every piece
  * of Spark-side plumbing real and testable: binary schema, byte
  * slicing, hex sniffing, fixed-width feature vectors, partition-
  * parallel execution. A real decoder replaces ONE function
  * ([[decodePayload]]) without touching the pipeline shape.
  */
object Multimodal {

  /** Number of stub feature dimensions. */
  val NFeatures = 4

  /** Attach an opaque binary payload. In this corpus the bytes are the
    * UTF-8 encoding of `text` (a deterministic stand-in for image
    * bytes); real ingestion would read the bytes straight from
    * parquet/blob storage.
    */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))

  /** REAL DECODER GOES HERE. Deliberately unimplemented: the
    * environment ships no codecs. Callers use [[stubFeatures]], which
    * has the same signature shape (payload bytes → fixed-width
    * features) and is deterministic for the oracle.
    */
  def decodePayload(payload: Array[Byte]): Array[Float] =
    throw new NotImplementedError(
      "media decode stub: no codec libraries in this environment; " +
      "use Multimodal.stubFeatures for the deterministic fake")

  /** Deterministic fake "decoded features": f_i derives from the byte
    * length and the i-th payload byte (sliced from the BINARY column —
    * the pipeline never touches the source string). Only the ONE byte
    * each feature needs is sliced and hex-decoded; hex-dumping the
    * whole payload per row would materialize a 2x-payload string to
    * read 4 bytes (the r2 plan did, at ~5 s per bench run). Values
    * land in [0, 1) like a normalized feature.
    */
  def stubFeature(payload: Column, nBytes: Column, i: Int): Column = {
    val byteI = conv(hex(substring(payload, i + 1, 1)), 16, 10).cast("bigint")
    round(((nBytes * (2 * i + 1) + byteI) % 1000) / lit(1000.0), 6)
  }

  /** Frame sampling over the raw payload: treat the byte stream as
    * fixed-size frames and keep every `stride`-th one — real binary
    * slicing (`substring` on the BINARY column via a position
    * Generate), which is the video-frame-sampling pipeline shape; only
    * the codec behind each frame stays stubbed. Output: one row per
    * sampled frame with its index and bytes. Narrow — no shuffle.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    df.select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          greatest(floor((octet_length(col("payload")) - 1) / frameBytes).cast("int"),
                   lit(0)))).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))

  /** Frame-level exact dedup — the multimodal twin of
    * [[CorpusOps.chunkDedup]]: sampled binary frames fingerprint by
    * md5, a frame occurrence is a duplicate unless it is the first
    * (smallest (doc_id, frame_idx)) bearer, and the per-document
    * duplicate-frame ratio flags media that re-uses footage the
    * whole-payload hash misses (intros, watermarks, stock b-roll).
    *
    * Scale shape: the rank window shuffles (doc_id, frame_idx, 16-byte
    * md5) triples — never frame bytes (plan-asserted alongside the
    * chunk variant); sampling bounds the fan-out to one row per
    * `stride` frames.
    */
  def frameDedup(spark: SparkSession, dir: String,
                 frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fp").orderBy("doc_id", "frame_idx")
    sampleFrames(withPayload(Tables.documents(spark, dir)), frameBytes, stride)
      .select(col("doc_id"), col("frame_idx"), md5(col("frame")).as("fp"))
      .withColumn("is_dup", (row_number().over(w) > 1).cast("bigint"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
           sum(col("is_dup")).as("n_dup_frames"),
           round(sum(col("is_dup")).cast("double") / count(lit(1)), 6)
             .as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Batched decode plumbing: groups payloads into fixed-size batches
    * within each partition — the batch shape a real codec/GPU decoder
    * consumes — and applies a pluggable batch decoder. `mapPartitions`
    * is the right tool here (the documented last resort elsewhere):
    * batch-at-a-time decode is genuinely imperative, and the grouping
    * preserves partition parallelism with zero shuffle. The default
    * decoder is [[stubBatchDecoder]] — deterministic features derived
    * from the bytes, so the pipeline is testable without codecs; a
    * real decoder drops in with the same `Seq[bytes] => Seq[features]`
    * signature.
    */
  def decodeBatched(df: DataFrame, batchSize: Int = 32,
                    decoder: Seq[Array[Byte]] => Seq[Array[Float]] = stubBatchDecoder)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decoder(batch.map(_._2))
          require(feats.length == batch.length,
            s"decoder returned ${feats.length} features for ${batch.length} payloads")
          batch.zip(feats).map { case ((id, _), f) => (id, f) }
        }
      }
      .toDF("doc_id", "features")
  }

  /** Deterministic fake batch decoder: per payload, NFeatures values
    * derived from the byte length and leading bytes, plus the actual
    * batch size as the last element — letting tests assert the batch
    * shape from the output alone.
    */
  def stubBatchDecoder(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      val fs = (0 until NFeatures).map { i =>
        val b = if (i < bytes.length) bytes(i) & 0xff else 0
        ((bytes.length * (2 * i + 1) + b) % 1000) / 1000.0f
      }
      (fs :+ batch.length.toFloat).toArray
    }

  /** Deterministic per-payload decoder for ORACLE-CHECKED compositions
    * downstream of [[decodeBatched]] (e.g. the media→ANN pipeline in
    * [[Similarity.mediaIvfKnn]]). Differs from [[stubBatchDecoder]] in
    * two deliberate ways: no batch-size element (output must depend
    * only on the payload bytes, never the partition layout), and a
    * power-of-two denominator so every feature value is a dyadic
    * rational exactly representable in FLOAT — all downstream double
    * arithmetic (norms, dot products, cosine) is then bit-identical
    * between Spark and any double-precision oracle engine.
    */
  def exactBatchDecoder(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      Array.tabulate(NFeatures) { i =>
        val b = if (i < bytes.length) bytes(i) & 0xff else 0
        ((bytes.length * (2 * i + 1) + b) % 1000) / 1024.0f
      }
    }

  /** Oracle-checkable projection of [[sampleFrames]]: per sampled
    * frame, its byte length and a 4-byte header sniff — the metadata a
    * video pipeline records per extracted frame before the (stubbed)
    * codec runs. Bounded to the leading documents so the output stays
    * small at any scale factor.
    *
    * ASCII-corpus contract (same caveat as PolyHash): frames slice the
    * BINARY payload by bytes, while the DuckDB oracle slices the text
    * by characters before encoding — identical only while one
    * character is one byte. The synthetic corpus is ASCII by
    * construction; for multi-byte text the oracle would have to slice
    * the encoded bytes instead (the Spark side is the semantics a real
    * media pipeline wants — byte offsets into an opaque payload).
    */
  def frameSample(spark: SparkSession, dir: String, maxDocs: Int = 50): DataFrame =
    sampleFrames(withPayload(
        Tables.documents(spark, dir).filter(col("doc_id") < maxDocs)))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("bigint").as("n_frame_bytes"),
        lower(hex(substring(col("frame"), 1, 4))).as("head_hex"))
      .orderBy("doc_id", "frame_idx")

  /** Metadata + stub-feature extraction over the payload column:
    * byte length, 8-byte header sniff (hex), and NFeatures stub
    * features. All narrow projections — embarrassingly parallel, no
    * shuffle; at scale this is the map stage before any dedup/cluster
    * step over media features.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val base = withPayload(Tables.documents(spark, dir))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("bigint").as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        col("payload"))
    val feats = (0 until NFeatures).map(i =>
      stubFeature(col("payload"), col("n_bytes"), i).as(s"f$i"))
    base.select(col("doc_id") +: col("n_bytes") +: col("header_hex") +: feats: _*)
      .orderBy("doc_id")
  }
}

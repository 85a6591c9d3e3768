package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) modeled as an
  * opaque BINARY payload column plus typed metadata, the way a 100 TB
  * training corpus stores it (bytes in parquet, decode on demand).
  *
  * Image decode is REAL: [[imageBatchDecoder]] routes payloads
  * through `javax.imageio` (the JDK ships BMP/PNG/GIF readers), and
  * [[withBmpPayload]] builds valid deterministic BMP containers so
  * the codec round-trip is oracle-checkable end to end. Formats the
  * JDK lacks (JPEG2000, video/audio codecs) keep the STUB path —
  * [[stubFeatures]] derives deterministic pseudo-features from the
  * raw bytes (header sniff + byte arithmetic), keeping the Spark-side
  * plumbing (binary schema, byte slicing, batch shape, partition
  * parallelism) testable; a real codec replaces one function without
  * touching the pipeline shape.
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

  /** The real per-payload decoder: `javax.imageio` (BMP/PNG/GIF ship
    * in the JDK). Formats the JDK lacks (JPEG2000, video codecs)
    * still need [[stubFeatures]]; image payloads are end-to-end real
    * via [[imageBatchDecoder]] / [[withBmpPayload]].
    */
  def decodePayload(payload: Array[Byte]): Array[Float] =
    imageBatchDecoder(Seq(payload)).head

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

  /** Width in pixels of the [[withBmpPayload]] fixture image. */
  val BmpWidth = 4

  private def le32(v: Int): String =
    f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x${(v >> 16) & 0xff}%02x${(v >> 24) & 0xff}%02x"

  /** 54-byte header of a `width`x1 24bpp bottom-up BI_RGB BMP (14-byte
    * file header + 40-byte BITMAPINFOHEADER). The single pixel row
    * must already be 4-byte aligned (3·width % 4 == 0) so no padding
    * bytes complicate the text↦pixel mapping. Pixel bytes follow the
    * header as B,G,R triples.
    */
  private[graft] def bmpHeaderHex(width: Int): String = {
    require(3 * width % 4 == 0, s"row of $width 24bpp pixels needs padding")
    "424d" + le32(54 + 3 * width) + "00000000" + le32(54) +
      le32(40) + le32(width) + le32(1) + "0100" + "1800" + le32(0) +
      le32(3 * width) + le32(0) + le32(0) + le32(0) + le32(0)
  }

  /** Attach a REAL image payload: a valid `width`x1 24-bit BMP whose
    * 3·width pixel bytes are the first 3·width bytes of the
    * (space-padded) text — deterministic, so an oracle can predict the
    * decoded pixels from the text alone, yet a genuine codec
    * round-trip: the bytes carry a real BMP container that
    * [[imageBatchDecoder]] decodes with `javax.imageio`, not a header
    * sniff. Narrow projection, no shuffle. (ASCII-corpus contract as
    * in [[frameSample]]: text characters are payload bytes only while
    * 1 char == 1 byte.)
    */
  def withBmpPayload(df: DataFrame, width: Int = BmpWidth): DataFrame =
    df.withColumn("payload",
      concat(unhex(lit(bmpHeaderHex(width))),
        encode(substring(rpad(col("text"), 3 * width, " "), 1, 3 * width), "UTF-8")))

  /** REAL batched image decoder over [[decodeBatched]]'s seam — the
    * decoder [[decodePayload]]'s scaladoc promised: each payload goes
    * through `javax.imageio` (BMP/PNG/GIF readers ship in the JDK —
    * no external codec needed after all for these formats), and each
    * decoded pixel yields one feature: its packed 24-bit RGB value
    * normalized by 2^24 — a dyadic rational, exactly representable in
    * FLOAT, so downstream cosine arithmetic stays bit-identical to a
    * double-precision oracle (the [[exactBatchDecoder]] discipline).
    * Pixels walk row-major and wrap when NFeatures exceeds the pixel
    * count. In-memory decode only (`setUseCache(false)`) — executors
    * never touch a scratch directory.
    */
  def imageBatchDecoder(batch: Seq[Array[Byte]]): Seq[Array[Float]] = {
    javax.imageio.ImageIO.setUseCache(false)
    batch.map { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"payload is not a decodable image (${bytes.length} bytes)")
      val n = img.getWidth * img.getHeight
      Array.tabulate(NFeatures) { i =>
        val p = i % n
        (img.getRGB(p % img.getWidth, p / img.getWidth) & 0xffffff) / 16777216.0f
      }
    }
  }

  /** Pixels per image of the [[ahashNearDup]] fixture (16-bit hash). */
  val AhashWidth = 16

  /** Per-image 16-bit AVERAGE HASH from REAL decoded pixels — the
    * standard perceptual fingerprint (aHash): bit p is set iff pixel
    * p's luminance exceeds the image mean, here as the exact integer
    * comparison gray_p · n > Σ gray (no division, engine-exact).
    * Decode is a genuine `javax.imageio` round-trip per payload
    * ([[imageBatchDecoder]]'s codec path); the `mapPartitions` is the
    * imperative-decode seam [[decodeBatched]] documents.
    */
  def ahashFrom(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"payload is not a decodable image (${bytes.length} bytes)")
          val n = img.getWidth * img.getHeight
          val grays = Array.tabulate(n) { p =>
            val rgb = img.getRGB(p % img.getWidth, p / img.getWidth)
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          }
          // 1L << p wraps mod 64 — bits past pixel 63 would silently
          // alias onto earlier positions; callers pass 16x1 BMPs
          require(n <= 64, s"ahash needs <= 64 pixels, got $n")
          val tot = grays.map(_.toLong).sum
          val h = grays.zipWithIndex
            .map { case (g, p) => if (g.toLong * n > tot) 1L << p else 0L }.sum
          (id, h)
        }
      }
      .toDF("doc_id", "ahash")
  }

  /** Per-image 15-bit DIFFERENCE HASH from REAL decoded pixels — the
    * gradient sibling of [[ahashFrom]] (dHash): bit p is set iff
    * pixel p+1's luminance exceeds pixel p's — pure integer
    * comparisons of adjacent gray sums, no mean, no division. dHash
    * survives global brightness shifts that flip aHash bits (the
    * published reason production image-dedup runs both). Same
    * genuine `javax.imageio` decode through the mapPartitions seam.
    */
  def dhashFrom(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"payload is not a decodable image (${bytes.length} bytes)")
          val n = img.getWidth * img.getHeight
          val grays = Array.tabulate(n) { p =>
            val rgb = img.getRGB(p % img.getWidth, p / img.getWidth)
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          }
          // 1L << p wraps mod 64 — gradient bits past pixel 64 would
          // silently alias onto earlier positions; callers pass 16x1
          // BMPs (15 gradient bits)
          require(n <= 65, s"dhash needs <= 65 pixels, got $n")
          val h = (0 until n - 1)
            .map(p => if (grays(p + 1) > grays(p)) 1L << p else 0L).sum
          (id, h)
        }
      }
      .toDF("doc_id", "dhash")
  }

  /** Gradient-hash near-dup audit — [[ahashNearDup]]'s shape over
    * [[dhashFrom]] fingerprints: 15-bit dHash per really-decoded
    * image, pigeonhole band join (8+7 bit bands — hamming <= 1 agrees
    * on >= 1 band), exact `bit_count(xor)` verify, bounded
    * per-distance audit. Payloads never cross an exchange.
    */
  def dhashNearDup(spark: SparkSession, dir: String,
                   maxHamming: Int = 1): DataFrame =
    nearDupCensus(dhashFrom(
      withBmpPayload(Tables.documents(spark, dir), AhashWidth)),
      "dhash", maxHamming)

  /** Shared near-dup census over a (doc_id, hash) table — the
    * HASH-SPACE-bounded formulation: identical-hash pairs come from
    * `C(cnt, 2)` per hash GROUP (no pair ever materializes), and
    * cross-hash candidates band-join the DISTINCT-VALUE table (at
    * most 2^15 rows however large the corpus; a band bucket holds at
    * most 2^7/2^8 VALUES by construction, so the join is bounded by
    * the fingerprint space, not the corpus). The doc-level band join
    * this replaces OOM'd at 30x amplification: replicated corpora
    * collapse onto few hash values, one 8-bit bucket held 17k docs,
    * and the self-join materialized 10^8 pairs — the textbook
    * duplicate-blowup that pair-free group counting sidesteps.
    * Pair/doc counts are identical to the pairwise definition by
    * construction; the oracle keeps the independent pairwise SQL.
    */
  private def nearDupCensus(hashed: DataFrame, hashCol: String,
                            maxHamming: Int): DataFrame = {
    val groups = hashed.groupBy(col(hashCol).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // consumers: h0 aggregate + both join sides
    val h0 = groups.filter(col("cnt") >= 2)
      .agg(sum(expr("cnt * (cnt - 1) DIV 2")).as("n_pairs"),
           sum(col("cnt")).as("n_docs"))
      .select(lit(0L).as("hamming"), col("n_pairs"), col("n_docs"))
    val banded = groups.select(col("h"), col("cnt"),
        explode(array(
          struct(lit(0L).as("band"), (col("h") % 256).as("key")),
          struct(lit(1L).as("band"), (col("h") / 256).cast("bigint").as("key"))))
          .as("b"))
      .select(col("h"), col("cnt"), col("b.band").as("band"), col("b.key").as("key"))
    val vp = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.h") < col("y.h"))
      .select(col("x.h").as("ha"), col("y.h").as("hb"),
        col("x.cnt").as("ca"), col("y.cnt").as("cb"),
        expr("bit_count(x.h ^ y.h)").cast("bigint").as("hamming"))
      .distinct() // a value pair can collide in both bands
      .filter(col("hamming") >= 1 && col("hamming") <= maxHamming)
      .localCheckpoint() // consumers: pair products + doc rollup
    val h1p = vp.groupBy("hamming").agg(sum(col("ca") * col("cb")).as("n_pairs"))
    val h1d = vp.select(col("hamming"), col("ha").as("h"), col("ca").as("cnt"))
      .unionAll(vp.select(col("hamming"), col("hb").as("h"), col("cb").as("cnt")))
      .distinct()
      .groupBy("hamming").agg(sum(col("cnt")).as("n_docs"))
    h0.unionAll(h1p.join(h1d, Seq("hamming"))
        .select(col("hamming"), col("n_pairs"), col("n_docs")))
      .filter(col("n_pairs").isNotNull && col("n_pairs") > 0)
      .orderBy("hamming")
  }

  /** Perceptual near-dup audit over REAL decoded images — the
    * multimodal twin of the SimHash near-dup: every document carries a
    * [[AhashWidth]]x1 BMP ([[withBmpPayload]]), its 16-bit
    * [[ahashFrom]] fingerprint is computed from the `javax.imageio`
    * decode, and near-duplicate pairs (hamming <= `maxHamming`) are
    * found with the pigeonhole band join (two 8-bit bands — a pair
    * within hamming 1 must agree on at least one band), then verified
    * by exact `bit_count(xor)`. Output is the bounded per-distance
    * audit (pair count, documents involved), not the raw pair list —
    * the shape that stays small however hot the hash space gets.
    *
    * Scale shape: candidates come from band equi-joins (never
    * all-pairs, the [[Dedup]] discipline); everything shuffled is
    * (doc_id, 8-byte hash) — pixels and payloads never cross an
    * exchange after the narrow hash projection.
    */
  def ahashNearDup(spark: SparkSession, dir: String,
                   maxHamming: Int = 1): DataFrame =
    nearDupCensus(ahashFrom(
      withBmpPayload(Tables.documents(spark, dir), AhashWidth)),
      "ahash", maxHamming)

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

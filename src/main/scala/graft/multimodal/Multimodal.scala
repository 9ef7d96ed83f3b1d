package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video carried as opaque `binary` columns
  * with typed metadata, processed partition-wise in bounded batches.
  *
  * The decode step is a STUB — this environment has no image/audio codecs —
  * implemented as a deterministic fake (dimensions/features derived from the
  * content bytes) so results are reproducible and testable. Everything
  * around it is the real production shape:
  * - schema: (media_id long, kind string, content binary) → fixed-dim
  *   feature vectors + typed metadata;
  * - `mapPartitions` with `grouped(batchSize)` bounds per-batch memory the
  *   way Arrow record batches do for vectorized Python UDFs;
  * - downstream (feature vectors) plugs into `graft.queries.Similarity`.
  *
  * At 100 TB: media rows are large — the caller controls partition sizing
  * via `spark.sql.files.maxPartitionBytes` / `repartition(n)`; the decode
  * stage is a narrow map (no shuffle), so it scales linearly with executors.
  */
object Multimodal {

  val FeatureDim = 16

  final case class Media(media_id: Long, kind: String, content: Array[Byte])
  final case class Decoded(
      media_id: Long, kind: String, width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** STUB decode. A real implementation calls the codec (JPEG/PNG/WAV/MP4)
    * here and this is the only line that changes. Deterministic fake:
    * metadata and features are pure functions of the bytes.
    */
  private[multimodal] def stubDecode(m: Media): Decoded = {
    val n = m.content.length
    val h = m.content.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    val features = Array.tabulate(FeatureDim) { i =>
      // spread bytes across the feature dims; bounded [-1, 1]
      val x = java.lang.Long.rotateLeft(h, i * 4) ^ (i * 0x9E3779B97F4A7C15L)
      (x % 1000).toFloat / 1000.0f
    }
    Decoded(m.media_id, m.kind, width = 1 + (n % 512), height = 1 + ((n / 7) % 512),
      n_frames = if (m.kind == "video") 1 + (n % 30) else 1, features = features)
  }

  /** Decode + featurize, partition-wise in bounded batches (the Arrow-batch
    * shape). Narrow transformation: no shuffle.
    */
  def decodeAndFeaturize(media: Dataset[Media], batchSize: Int = 64): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real impl hands `batch` to the codec as one vectorized call
        batch.map(stubDecode)
      }
    }
  }

  /** STUB resize: real impl scales pixel data; fake scales metadata only. */
  def resize(decoded: Dataset[Decoded], maxSide: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
        height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** Frame sampling for video rows: keep every `stride`-th frame (metadata
    * form of the real op; a real impl slices the frame tensor).
    */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    decoded.map(d => d.copy(n_frames = math.max(1, (d.n_frames + stride - 1) / stride)))
  }

  /** Synthetic media table derived from `documents` (text bytes as opaque
    * content) so the plumbing runs against real testdata at any SF.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Media]
  }

  /** Rows-only corpus query: decode → resize → frame-sample → per-kind
    * feature statistics. Exercises the full multimodal plumbing.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_features" -> ((s, d) => {
      val decoded = sampleFrames(resize(decodeAndFeaturize(mediaFromDocuments(s, d)), 256), 4)
      decoded.toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"), col("n_frames"),
          graft.queries.Similarity.norm(col("features")).as("feat_norm"))
        .groupBy("kind")
        .agg(count(lit(1)).as("cnt"),
          round(avg("feat_norm"), 4).as("avg_feat_norm"),
          max("width").as("max_w"), max("height").as("max_h"),
          max("n_frames").as("max_frames"))
        .orderBy("kind")
    })
  )
}

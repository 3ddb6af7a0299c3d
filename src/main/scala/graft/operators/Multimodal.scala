package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * are opaque `binary` columns with typed metadata; decode / feature
  * extraction run batched per partition over the typed Dataset API.
  *
  * The actual codecs (JPEG/PNG/audio) are NOT in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[StubCodec]]) —
  * everything around it (schema, batching, partitioning, feature shape)
  * is real: swap [[StubCodec]] for a real codec and nothing else changes.
  *
  * Scale shape: `mapPartitions` keeps per-record work executor-local with
  * zero shuffle; `repartition(kind)` co-locates one modality per task so a
  * real codec's native buffers/threads initialize once per partition
  * (the same batching contract as Arrow-based pandas UDFs).
  */
object Multimodal {

  /** One media row: payload + metadata the pipeline carries along. */
  final case class MediaRecord(
      mediaId: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, // images/video
      height: Int,
      sampleRate: Int, // audio
      durationMs: Int) // audio/video

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      featureDim: Int,
      features: Array[Float])

  /** STUB decode: a real implementation hands `payload` to a codec. This
    * one derives a deterministic feature vector from the payload bytes so
    * the pipeline shape (schema, batch, partitioning) is testable. */
  object StubCodec {
    def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9E3779B9L
      var i = 0
      while (i < payload.length) {
        h = h * 31 + (payload(i) & 0xFF)
        out(i % dim) += ((h & 0xFFFF).toFloat / 0xFFFF - 0.5f)
        i += 1
      }
      out
    }

    /** STUB frame sampling: byte-range slices standing in for decoded
      * frames (a real codec returns pixel buffers). */
    def sampleFrames(payload: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty || nFrames <= 0) return Seq.empty
      val stride = math.max(payload.length / nFrames, 1)
      (0 until math.min(nFrames, payload.length)).map { f =>
        payload.slice(f * stride, math.min(f * stride + stride, payload.length))
      }
    }
  }

  /** Batched feature extraction: one codec context per partition, zero
    * shuffle (narrow dependency). */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs initialize native state here, once per partition
      it.map(m => MediaFeatures(m.mediaId, m.kind, dim,
        StubCodec.decodeFeatures(m.payload, dim)))
    }
  }

  /** Co-locate one modality per task before decoding (real codecs batch
    * much better over homogeneous input). */
  def partitionByKind(media: Dataset[MediaRecord], partitions: Int): Dataset[MediaRecord] =
    media.repartition(partitions, col("kind"))

  /** Frame sampling as a generator: one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(m => StubCodec.sampleFrames(m.payload, nFrames).zipWithIndex
        .map { case (frame, idx) => (m.mediaId, idx, frame) })
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Metadata-only projection — payloads pruned at the scan when the
    * source is columnar (parquet never reads the binary column). */
  def metadata(media: Dataset[MediaRecord]): DataFrame =
    media.select("mediaId", "kind", "width", "height", "sampleRate", "durationMs")
}

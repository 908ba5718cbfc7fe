package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The container has no media codecs, so the decode step is a clearly
  * marked deterministic STUB ([[FakeCodec]]); everything Spark-side —
  * schema, batch iteration shape (`mapPartitions`, the Scala analogue of
  * `mapInPandas` batches), partitioning, feature schema — is real and
  * tested. Swapping in a real codec touches only `FakeCodec.decode`.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media: Array[Byte],
      format: String,
      n_bytes: Long
  )

  /** Extracted features, one row per media item. */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      n_frames: Long,
      mean_byte: Double,
      checksum: Long
  )

  /** STUB codec: stands in for image/audio decode. Deterministic: "frames"
    * are 256-byte chunks; "pixels" are the raw bytes. A real build replaces
    * this object with an actual decoder behind the same signature. */
  object FakeCodec {
    val FrameSize = 256
    def decode(media: Array[Byte]): Iterator[Array[Byte]] =
      media.grouped(FrameSize)
  }

  /** Attach a fake binary media column derived from a text column —
    * stands in for reading real blobs; keeps the pipeline runnable. */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("fake/utf8").as("format"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** Batch feature extraction over the binary column: per-partition
    * iteration (no per-row task overhead), decode stubbed, features real.
    * Runs fully parallel, no shuffle. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        var sum = 0L
        var checksum = 0L
        var frames = 0L
        FakeCodec.decode(r.media).foreach { frame =>
          frames += 1
          var i = 0
          while (i < frame.length) {
            val b = frame(i) & 0xff
            sum += b
            checksum = (checksum * 131 + b) % 1000000007L
            i += 1
          }
        }
        MediaFeatures(
          media_id = r.media_id,
          n_bytes = r.n_bytes,
          n_frames = frames,
          mean_byte = if (r.n_bytes > 0) sum.toDouble / r.n_bytes else 0.0,
          checksum = checksum)
      }
    }
  }

  /** End-to-end: text table → fake media column → batched feature
    * extraction. The gate query checks the deterministic features. */
  def pipeline(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(withFakeMedia(docs, idCol, textCol).as[MediaRecord])
  }
}

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

  // ------------------------------------------------------- image headers

  /** Container-level image metadata: format + pixel dimensions.
    * `unknown`/-1 when the payload is not a recognized image. */
  final case class MediaMeta(
      media_id: Long, format: String, width: Int, height: Int)

  /** REAL (non-stub) metadata extraction: image container headers are
    * plain bytes — PNG IHDR, GIF logical-screen descriptor, BMP
    * info-header, JPEG SOF markers — so format sniffing and pixel
    * dimensions need no codec at all. This is the part of multimodal
    * handling a 100 TB pipeline runs on EVERY blob (filtering by
    * size/aspect before any expensive decode). */
  def sniffImage(b: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      ("png", be32(16), be32(20))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      ("gif", le16(6), le16(8))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      // DIB header size decides the field layout: BITMAPINFOHEADER and
      // later (>= 40) carry 32-bit dims at 18/22; the OS/2
      // BITMAPCOREHEADER (12) carries 16-bit dims at 18/20
      val dib = le32(14)
      if (dib >= 40) ("bmp", le32(18), math.abs(le32(22))) // height<0 = top-down
      else if (dib == 12) ("bmp", le16(18), le16(20))
      else ("bmp", -1, -1)
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk the marker stream to the first SOFn frame header.
      // Markers may be preceded by any number of 0xFF fill bytes
      // (spec B.1.1.2); TEM (0x01), RSTn and SOI are parameterless; EOI
      // before a frame header means no dimensions.
      var i = 2
      while (i + 1 < b.length) {
        if (u8(i) != 0xff) return ("jpeg", -1, -1) // corrupt marker stream
        var j = i + 1
        while (j < b.length && u8(j) == 0xff) j += 1 // skip fill bytes
        if (j >= b.length) return ("jpeg", -1, -1)
        val marker = u8(j)
        if (marker == 0xd9) return ("jpeg", -1, -1) // EOI, no SOF seen
        else if (marker == 0x01 || marker == 0xd8 ||
          (marker >= 0xd0 && marker <= 0xd7)) i = j + 1
        else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (j + 7 >= b.length) return ("jpeg", -1, -1)
          return ("jpeg", be16(j + 6), be16(j + 4)) // SOFn: height then width
        } else {
          if (j + 2 >= b.length) return ("jpeg", -1, -1)
          i = j + 1 + be16(j + 1) // segment length includes its own 2 bytes
        }
      }
      ("jpeg", -1, -1)
    } else ("unknown", -1, -1)
  }

  /** Per-blob image metadata, batched like [[extractFeatures]] — parallel,
    * no shuffle, no decode. */
  def imageMetadata(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (fmt, w, h) = sniffImage(r.media)
      MediaMeta(r.media_id, fmt, w, h)
    })
  }

  /** Minimal PNG signature + IHDR prefix with the given dimensions — what
    * [[sniffImage]] reads; used to synthesize blobs in tests and the gate
    * query's parse round-trip. */
  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    bb.array()
  }

  /** Synthetic PNG blob per row, dimensions a deterministic function of
    * the id — the construct half of the construct↔parse oracle check. */
  def withSyntheticPng(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 1000 + 1).toInt
      val h = ((id * 7) % 1000 + 1).toInt
      MediaRecord(id, pngHeader(w, h), "png", 24L)
    }
  }
}

package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns (BASELINE.json's LLM-pipeline extension surface):
  * media payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample / resize run executor-side over
  * batches — `mapPartitions` is the JVM analogue of the Python
  * `mapInPandas` batch-iterator shape: one task pulls an iterator of rows,
  * amortizes decoder setup once per partition, and never routes payloads
  * through the driver.
  *
  * THE DECODE IS A STUB: this container has no image/audio codecs, so
  * [[Multimodal.decode]] derives deterministic fake media properties from
  * the bytes (magic byte → kind, first/last byte → dimensions, 256-byte
  * blocks → frames). Swapping in a real codec changes only the body of
  * `decode`; the schema, partitioning, batch shape and query wiring are
  * the real, tested article.
  */
object Multimodal {

  val FrameBytes = 256
  val ThumbMax = 32L

  /** Decoded media: stubbed kind/dimensions + byte-block "frames". */
  final case class Decoded(kind: String, width: Long, height: Long, frames: Seq[Array[Byte]])

  /** One document's extracted features (the query/output row). */
  final case class FeatureRow(
      doc_id: Long, kind: String, width: Long, height: Long,
      n_frames: Long, frame0_hash: String, thumb_w: Long, thumb_h: Long)

  /** DECODE STUB — see the object doc. Deterministic in the bytes. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.nonEmpty, "empty payload")
    val b0 = bytes.head & 0xff
    val bn = bytes.last & 0xff
    val kind = (b0 % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    Decoded(kind, 16L + b0 % 64, 16L + bn % 64, frameSample(bytes, 1))
  }

  /** Frame sampling: every `stride`-th 256-byte block. A real video path
    * would seek keyframes; the block walk has the same access pattern. */
  def frameSample(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
    bytes.grouped(FrameBytes).grouped(stride).map(_.head).toSeq

  /** Resize: scale the longer edge down to `maxDim` (integer math, aspect
    * preserved); no-op when already small enough. */
  def resize(width: Long, height: Long, maxDim: Long): (Long, Long) = {
    val m = math.max(width, height)
    if (m <= maxDim) (width, height)
    else (width * maxDim / m, height * maxDim / m)
  }

  def md5hex(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("MD5").digest(bytes))

  private def hex(digest: Array[Byte]): String =
    digest.map(b => f"${b & 0xff}%02x").mkString

  /** The feature-extraction job: (doc_id, content: binary) → features.
    * Executor-side batch loop; decoder state (here: the MessageDigest) is
    * set up once per partition and reused across the batch (digest()
    * resets the instance). */
  def features(docs: DataFrame, s: SparkSession): Dataset[FeatureRow] = {
    import s.implicits._
    docs.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val d = decode(bytes)
          val (tw, th) = resize(d.width, d.height, ThumbMax)
          FeatureRow(
            id, d.kind, d.width, d.height,
            d.frames.size.toLong, hex(md.digest(d.frames.head)), tw, th)
        }
      }
  }
}

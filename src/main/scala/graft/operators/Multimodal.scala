package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Embedder

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media are OPAQUE BINARY columns with typed metadata beside them, and
  * decode/feature-extraction runs per partition with one decoder
  * instance per partition (the initialization pattern a real codec or
  * model requires).
  *
  * The actual byte decoding is a clearly-marked STUB ([[Md5StubDecoder]])
  * because no image/audio libraries exist in this environment — but it
  * is a DETERMINISTIC stub built on the same md5 math as the text
  * embedder, so the full plumbing (binary schema, partition batching,
  * decoder lifecycle, downstream aggregation) is exercised AND
  * hash-checked against the DuckDB oracle (q_media_stats). Swapping in
  * a real decoder changes one class, nothing else.
  *
  * At 100 TB: media bytes never shuffle — decode happens in the scan
  * stage via mapPartitions, and only small decoded features/metadata
  * flow into joins and aggregations downstream.
  */
object Multimodal {

  /** One media row: the binary payload + sidecar metadata. */
  case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Decoded features; `features` stands in for pixels/spectrograms. */
  case class DecodedMedia(
      id: Long,
      mime: String,
      byteSize: Long,
      width: Int,
      height: Int,
      f0: Double,
      features: Array[Float])

  /** Decoder contract: one instance per partition, may hold heavy state
    * (a codec, a model session). */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): DecodedMedia
  }

  /** STUB decoder — deterministic md5-derived fake features standing in
    * for real pixel/audio decoding (no media libraries in this
    * environment). The formulas are intentionally oracle-expressible. */
  class Md5StubDecoder extends MediaDecoder {
    def decode(row: MediaRow): DecodedMedia = {
      val text = new String(row.media, "UTF-8")
      val h = Embedder.md5IntLocal(text)
      val n = row.media.length.toLong
      DecodedMedia(
        id = row.id,
        mime = row.mime,
        byteSize = n,
        width = (n % 1920L).toInt,
        height = ((n * 7L) % 1080L).toInt,
        f0 = (h % 10000L) / 10000.0,
        features = Embedder.embedLocal(text))
    }
  }

  /** Partition-parallel decode: decoder constructed ONCE per partition
    * (the pattern real codecs need), rows streamed through it. */
  def decode(
      media: Dataset[MediaRow],
      mkDecoder: () => MediaDecoder = () => new Md5StubDecoder): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // per-partition init
      rows.map(decoder.decode)
    }
  }

  /** Adapt a DataFrame with (idCol: bigint, binCol: binary, mimeCol:
    * string) into the typed media Dataset. */
  def asMedia(
      df: DataFrame,
      idCol: String = "id",
      binCol: String = "media",
      mimeCol: String = "mime"): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("media"),
        col(mimeCol).as("mime"))
      .as[MediaRow]
  }

  /** Per-mime corpus stats over the decoded features — the downstream
    * aggregation a data-curation pipeline runs after decode. */
  def mediaStats(decoded: Dataset[DecodedMedia]): DataFrame =
    decoded
      .toDF()
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum("byteSize").as("total_bytes"),
        avg("f0").as("avg_f0"),
        avg("width").as("avg_width"))

  /** One sampled "frame" of a media payload. */
  case class Frame(id: Long, mime: String, frame_idx: Int, frame_hash: Long)

  /** Frame sampling: n evenly-spaced fixed-width byte windows per media
    * payload (what a video pipeline does per keyframe), each reduced to
    * a stable hash standing in for the decoded frame. Runs in the same
    * per-partition decoder pass as [[decode]]; payloads shorter than a
    * window emit a single whole-payload frame. */
  def frameSamples(
      media: Dataset[MediaRow],
      nFrames: Int = 4,
      window: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      val text = new String(row.media, "UTF-8")
      if (text.length < window)
        Seq(Frame(row.id, row.mime, 0, Embedder.md5IntLocal(text)))
      else {
        val step = (text.length - window) / math.max(1, nFrames - 1)
        (0 until nFrames).map { i =>
          val start = math.min(i * step, text.length - window)
          Frame(row.id, row.mime, i,
            Embedder.md5IntLocal(text.substring(start, start + window)))
        }
      }
    }
  }

  /** Resize stub: deterministic fake downscale — real pixel resampling
    * would slot in here; the plumbing (dims recomputed, features
    * re-extracted from the "resized" payload) is what's real. */
  def resizeStub(d: DecodedMedia, maxW: Int, maxH: Int): DecodedMedia = {
    val scale = math.min(1.0, math.min(
      maxW.toDouble / math.max(1, d.width),
      maxH.toDouble / math.max(1, d.height)))
    d.copy(
      width = math.max(1, (d.width * scale).toInt),
      height = math.max(1, (d.height * scale).toInt))
  }
}

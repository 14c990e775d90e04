package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata columns.
  * `payload` layout used by the STUB codec: 8-byte header
  * (be16 width, be16 height, be32 sampleRate) followed by the body.
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

case class MediaMeta(width: Int, height: Int, sample_rate: Int, n_bytes: Int)

case class DecodedMedia(media_id: Long, kind: String, payload: Array[Byte],
  width: Int, height: Int, sample_rate: Int, n_bytes: Int)

/** Multimodal-column plumbing (north star, SURVEY.md §2 category checklist):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * The *codec* step is a clearly-marked STUB — this environment ships no
  * image/audio libraries, so `decodeMeta` parses a deterministic fake
  * header instead of calling a real decoder. Everything Spark-side is real
  * and tested: the schema, the per-partition batch iteration shape (the
  * Scala analogue of `mapInPandas` — one iterator per partition, setup
  * amortized per batch, never per row), narrow no-shuffle execution, and
  * partition preservation. Swapping the stub for a real codec changes one
  * function body and nothing about the plan.
  */
object MultiModal {

  /** STUB codec: parse the fake 8-byte header. A real deployment would
    * invoke an image/audio codec here (payload bytes are opaque to Spark
    * either way — the plumbing is identical).
    */
  def decodeMeta(payload: Array[Byte]): MediaMeta = {
    def be16(i: Int) = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)
    def be32(i: Int) =
      ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
        ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
    if (payload.length < 8) MediaMeta(0, 0, 0, payload.length)
    else MediaMeta(be16(0), be16(2), be32(4), payload.length)
  }

  /** Encode the fake header (test fixture / STUB resize helper). */
  def encodeHeader(width: Int, height: Int, sampleRate: Int): Array[Byte] =
    Array[Byte](
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((sampleRate >> 24) & 0xff).toByte, ((sampleRate >> 16) & 0xff).toByte,
      ((sampleRate >> 8) & 0xff).toByte, (sampleRate & 0xff).toByte)

  /** Decode metadata for every row — per-partition batch shape: the decoder
    * (in real life: a codec context, a model handle) is constructed once
    * per partition, then streamed over the iterator. Narrow: no shuffle.
    */
  def withDecodedMeta(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    implicit val enc = Encoders.product[DecodedMedia]
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/context init — STUB: none)
      it.map { r =>
        val m = decodeMeta(r.payload)
        DecodedMedia(r.media_id, r.kind, r.payload, m.width, m.height, m.sample_rate, m.n_bytes)
      }
    }
  }

  /** Real (non-stub) feature extraction: 256-bin byte histogram per payload
    * — the shape of any per-item feature extractor (embedding, spectrogram).
    */
  val byteHistogram = udf { payload: Array[Byte] =>
    val h = new Array[Long](256)
    var i = 0
    while (i < payload.length) { h(payload(i) & 0xff) += 1L; i += 1 }
    h
  }

  /** Frame sampling: split the body (after the 8-byte header) into `n`
    * contiguous frames — array-of-binary out, one row in. Real slicing.
    */
  def frameSample(n: Int) = udf { payload: Array[Byte] =>
    val body = payload.drop(8)
    if (body.isEmpty || n <= 0) Array.empty[Array[Byte]]
    else {
      val sz = math.max(1, body.length / n)
      (0 until n).map(i => body.slice(i * sz, math.min((i + 1) * sz, body.length))).toArray
    }
  }

  /** STUB resize: rewrites the header to the target dimensions and
    * truncates/cycles the body to w*h bytes (a real implementation would
    * resample pixels; deterministic fake keeps the dataflow testable).
    */
  def resize(w: Int, h: Int) = udf { payload: Array[Byte] =>
    val body = payload.drop(8)
    val target = w * h
    val out = new Array[Byte](target)
    var i = 0
    while (i < target && body.nonEmpty) { out(i) = body(i % body.length); i += 1 }
    encodeHeader(w, h, decodeMeta(payload).sample_rate) ++ out
  }

  /** Column-level convenience: metadata decode + histogram + frame stats in
    * one narrow select over a DataFrame with a binary `payload` column.
    */
  def enrich(df: DataFrame, frames: Int = 4): DataFrame =
    df.withColumn("hist", byteHistogram(col("payload")))
      .withColumn("frames", frameSample(frames)(col("payload")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
}

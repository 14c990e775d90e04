package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.multimodal.{MediaRow, MultiModal}

/** Multimodal tests: metadata parsing is real (genuine PNG/JPEG/GIF/WAV
  * container headers, built byte-by-byte below from the published format
  * specs); only pixel/sample decode stays stubbed. The schema, batch shape,
  * narrow execution, and partition preservation are asserted on real plans
  * (SURVEY.md north star). Synthetic payloads use the legacy graft header.
  */
class MultiModalSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def be16b(v: Int) = b(v >> 8, v & 0xff)
  private def be32b(v: Int) = b(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
  private def le16b(v: Int) = b(v & 0xff, v >> 8)
  private def le32b(v: Int) = b(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24)

  /** Minimal-but-valid container headers per the public format specs. */
  private def png(w: Int, h: Int): Array[Byte] =
    b(0x89) ++ ascii("PNG") ++ b(0x0d, 0x0a, 0x1a, 0x0a) ++
      be32b(13) ++ ascii("IHDR") ++ be32b(w) ++ be32b(h) ++
      b(8, 2, 0, 0, 0) ++ be32b(0) // bit depth, color type, crc placeholder

  private def jpeg(w: Int, h: Int): Array[Byte] =
    b(0xff, 0xd8) ++                                  // SOI
      b(0xff, 0xe0) ++ be16b(16) ++ ascii("JFIF") ++ b(0) ++
      b(1, 2, 0) ++ be16b(72) ++ be16b(72) ++ b(0, 0) ++ // APP0 body (14)
      b(0xff, 0xc0) ++ be16b(11) ++ b(8) ++ be16b(h) ++ be16b(w) ++
      b(1, 0x11, 0) ++                                // SOF0: 1 component
      b(0xff, 0xd9)                                   // EOI

  private def gif(w: Int, h: Int): Array[Byte] =
    ascii("GIF89a") ++ le16b(w) ++ le16b(h) ++ b(0, 0, 0)

  private def wav(rate: Int): Array[Byte] =
    ascii("RIFF") ++ le32b(36) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(2) ++ le32b(rate) ++
      le32b(rate * 4) ++ le16b(4) ++ le16b(16) ++
      ascii("data") ++ le32b(0)

  test("decodeMeta parses real PNG/JPEG/GIF/WAV container headers") {
    MultiModal.decodeMeta(png(1920, 1080)) shouldBe
      graft.multimodal.MediaMeta(1920, 1080, 0, png(1920, 1080).length)
    MultiModal.decodeMeta(jpeg(640, 480)).width shouldBe 640
    MultiModal.decodeMeta(jpeg(640, 480)).height shouldBe 480
    MultiModal.decodeMeta(gif(320, 200)).width shouldBe 320
    MultiModal.decodeMeta(gif(320, 200)).height shouldBe 200
    MultiModal.decodeMeta(wav(44100)).sample_rate shouldBe 44100
    MultiModal.decodeMeta(wav(16000)).sample_rate shouldBe 16000
  }

  test("detectKind keys on the same magic bytes") {
    MultiModal.detectKind(png(2, 2)) shouldBe "png"
    MultiModal.detectKind(jpeg(2, 2)) shouldBe "jpeg"
    MultiModal.detectKind(gif(2, 2)) shouldBe "gif"
    MultiModal.detectKind(wav(8000)) shouldBe "wav"
    MultiModal.detectKind(MultiModal.encodeHeader(4, 4, 0) ++ b(1, 2, 3)) shouldBe "raw"
  }

  test("malformed containers degrade to raw/zeros — never throw, never parse garbage") {
    // truncated PNG: signature present but no IHDR → must NOT be labeled
    // png, and must NOT fall into the legacy header (which would read
    // garbage dimensions out of the signature bytes)
    val truncatedPng = png(1920, 1080).take(12)
    MultiModal.detectKind(truncatedPng) shouldBe "raw"
    MultiModal.decodeMeta(truncatedPng) shouldBe
      graft.multimodal.MediaMeta(0, 0, 0, truncatedPng.length)
    // hostile WAV: chunk size 0x7FFFFFF0 would overflow an Int cursor;
    // must degrade, not crash the decode task
    val hostileWav = ascii("RIFF") ++ le32b(36) ++ ascii("WAVE") ++
      ascii("junk") ++ le32b(0x7ffffff0)
    noException should be thrownBy MultiModal.decodeMeta(hostileWav)
    MultiModal.decodeMeta(hostileWav) shouldBe
      graft.multimodal.MediaMeta(0, 0, 0, hostileWav.length)
    MultiModal.detectKind(hostileWav) shouldBe "raw"
    // truncated JPEG: SOI only, no SOF frame header
    val soiOnly = b(0xff, 0xd8, 0xff, 0xd9)
    MultiModal.detectKind(soiOnly) shouldBe "raw"
    MultiModal.decodeMeta(soiOnly).width shouldBe 0
    // kind and metadata must agree for arbitrary junk: kind != raw implies
    // parsed (non-legacy) metadata, raw implies zeros-or-legacy
    val junk = Seq(truncatedPng, hostileWav, soiOnly, Array.empty[Byte],
      ascii("GIF89"), ascii("RIFF1234WAV"))
    junk.foreach { p =>
      MultiModal.detectKind(p) shouldBe "raw"
      noException should be thrownBy MultiModal.decodeMeta(p)
    }
  }

  test("real-container rows flow through the distributed decode path") {
    implicit val enc = Encoders.product[MediaRow]
    val rows = Seq(
      MediaRow(1L, "image", png(800, 600)),
      MediaRow(2L, "image", jpeg(1024, 768)),
      MediaRow(3L, "image", gif(64, 64)),
      MediaRow(4L, "audio", wav(22050)))
    val out = MultiModal.withDecodedMeta(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    out.map(d => (d.width, d.height, d.sample_rate)) shouldBe
      Array((800, 600, 0), (1024, 768, 0), (64, 64, 0), (0, 0, 22050))
  }

  private def media = {
    implicit val enc = Encoders.product[MediaRow]
    T.t(spark, sf001, "documents").limit(64).select("doc_id", "text")
      .map { r =>
        val id = r.getLong(0)
        val body = r.getString(1).getBytes("UTF-8")
        val header = MultiModal.encodeHeader((id % 640).toInt + 16, 480, 44100)
        MediaRow(id, if (id % 2 == 0) "image" else "audio", header ++ body)
      }(enc).repartition(5)
  }

  test("decode recovers header metadata through the batch path") {
    val decoded = MultiModal.withDecodedMeta(media)
    val rows = decoded.collect()
    rows should have length 64
    rows.foreach { d =>
      d.width shouldBe (d.media_id % 640).toInt + 16
      d.height shouldBe 480
      d.sample_rate shouldBe 44100
      d.n_bytes shouldBe d.payload.length
    }
  }

  test("decode is narrow: adds no shuffle, partitions preserved") {
    val in = media
    val decoded = MultiModal.withDecodedMeta(in)
    decoded.rdd.getNumPartitions shouldBe 5
    def exchanges(p: String) = p.split("Exchange").length - 1
    // decoding must add zero exchanges over whatever the input plan has
    exchanges(decoded.queryExecution.executedPlan.toString()) shouldBe
      exchanges(in.queryExecution.executedPlan.toString())
  }

  test("byte histogram counts every body byte exactly once") {
    val df = MultiModal.enrich(media.toDF())
    df.select(col("media_id"), aggregate(col("hist"), lit(0L), (a, x) => a + x).as("tot"),
      col("n_bytes")).collect().foreach { r =>
      r.getLong(1) shouldBe r.getLong(2)
    }
  }

  test("frame sampling partitions the body losslessly for n frames") {
    val df = MultiModal.enrich(media.toDF(), frames = 4)
    df.select("media_id", "payload", "frames").collect().foreach { r =>
      val payload = r.getAs[Array[Byte]](1)
      val frames = r.getSeq[Array[Byte]](2)
      frames.length shouldBe 4
      // last frame extends to the end: concatenation is the full body
      frames.flatten.toArray shouldBe payload.drop(8)
    }
  }

  test("stub resize rewrites header and sizes the body to w*h") {
    val out = media.toDF().withColumn("r", MultiModal.resize(32, 8)(col("payload")))
    out.select("r").collect().foreach { r =>
      val p = r.getAs[Array[Byte]](0)
      val m = MultiModal.decodeMeta(p)
      m.width shouldBe 32
      m.height shouldBe 8
      m.sample_rate shouldBe 44100
      p.length shouldBe 8 + 32 * 8
    }
  }
}

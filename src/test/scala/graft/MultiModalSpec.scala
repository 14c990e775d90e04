package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.multimodal.{MediaRow, MultiModal}

/** Multimodal tests: metadata parsing is real (genuine PNG/JPEG/GIF/WAV
  * container headers, built byte-by-byte below from the published format
  * specs), and pixel/sample decode is real for every raster container —
  * BMP arithmetically, PNG/JPEG/GIF through the JDK's own javax.imageio
  * codecs. The schema, batch shape, narrow execution, and partition
  * preservation are asserted on real plans (SURVEY.md north star).
  * Synthetic payloads use the legacy graft header.
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

  test("BMP pixel decode is real: known pixels round-trip through encode/decode") {
    import graft.multimodal.MultiModal.RgbImage
    // 2×2 raster: red, green / blue, white (top-down RGB)
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val img = RgbImage(2, 2, rgb)
    val bmp = MultiModal.encodeBmp(img)
    MultiModal.detectKind(bmp) shouldBe "bmp"
    MultiModal.decodeMeta(bmp).width shouldBe 2
    MultiModal.decodeMeta(bmp).height shouldBe 2
    val back = MultiModal.decodeBmp(bmp).get
    back.width shouldBe 2
    back.height shouldBe 2
    back.rgb shouldBe rgb
  }

  test("BMP resize is a real nearest-neighbour resample, not a header rewrite") {
    import graft.multimodal.MultiModal.RgbImage
    val rgb = Array[Byte](
      10, 10, 10,  20, 20, 20,
      30, 30, 30,  40, 40, 40)
    val bmp = MultiModal.encodeBmp(RgbImage(2, 2, rgb))
    val up = MultiModal.resizeRgb(MultiModal.decodeBmp(bmp).get, 4, 4)
    up.width shouldBe 4
    // each source pixel becomes a 2×2 block under nearest-neighbour
    up.rgb((0 * 4 + 0) * 3) shouldBe 10
    up.rgb((0 * 4 + 3) * 3) shouldBe 20
    up.rgb((3 * 4 + 0) * 3) shouldBe 30
    up.rgb((3 * 4 + 3) * 3) shouldBe 40
    // and the resize UDF takes the real path for BMP payloads
    import spark.implicits._
    val out = Seq(bmp).toDF("payload")
      .select(MultiModal.resize(4, 4)(org.apache.spark.sql.functions.col("payload")))
      .collect()(0).getAs[Array[Byte]](0)
    MultiModal.decodeBmp(out).get.rgb shouldBe up.rgb
  }

  private def imageBytes(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, fmt, o)
    o.toByteArray
  }

  test("PNG pixel decode is real: JDK codec recovers known pixels exactly") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val p = imageBytes(img, "png")
    MultiModal.detectKind(p) shouldBe "png"
    val dec = MultiModal.decodeImage(p).get
    (dec.width, dec.height) shouldBe ((2, 2))
    dec.rgb shouldBe Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    // header metadata parse agrees with the codec's dimensions
    MultiModal.decodeMeta(p) shouldBe graft.multimodal.MediaMeta(2, 2, 0, p.length)
  }

  test("JPEG pixel decode is real: uniform gray survives the lossy codec") {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x808080)
    val p = imageBytes(img, "jpg")
    MultiModal.detectKind(p) shouldBe "jpeg"
    val dec = MultiModal.decodeImage(p).get
    (dec.width, dec.height) shouldBe ((4, 4))
    // lossy codec: every channel within a small tolerance of mid-gray
    dec.rgb.foreach(v => math.abs((v & 0xff) - 0x80) should be <= 4)
    MultiModal.decodeMeta(p).width shouldBe 4
  }

  test("resize takes the real raster path for PNG payloads") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x0a0a0a); img.setRGB(1, 0, 0x141414)
    img.setRGB(0, 1, 0x1e1e1e); img.setRGB(1, 1, 0x282828)
    val p = imageBytes(img, "png")
    import spark.implicits._
    val out = Seq(p).toDF("payload")
      .select(MultiModal.resize(4, 4)(col("payload")))
      .collect()(0).getAs[Array[Byte]](0)
    // output is a real 4×4 BMP raster with nearest-neighbour 2×2 blocks
    val r = MultiModal.decodeBmp(out).get
    (r.width, r.height) shouldBe ((4, 4))
    r.rgb((0 * 4 + 0) * 3) shouldBe 10
    r.rgb((0 * 4 + 3) * 3) shouldBe 20
    r.rgb((3 * 4 + 0) * 3) shouldBe 30
    r.rgb((3 * 4 + 3) * 3) shouldBe 40
  }

  test("resize with hostile target dimensions degrades instead of overflowing") {
    import spark.implicits._
    val bmp = MultiModal.encodeBmp(graft.multimodal.MultiModal.RgbImage(2, 2,
      Array.fill[Byte](12)(7)))
    // 50000×50000×3 overflows Int on the raster path: must fall back (and
    // cap the synthetic body), not throw NegativeArraySize / OOM the task
    noException should be thrownBy {
      Seq(bmp).toDF("payload")
        .select(MultiModal.resize(50000, 50000)(col("payload"))).collect()
    }
    // fallback header packs w/h as be16: a 70000-wide target must report
    // the clamped 65535, not silently wrap to 70000 & 0xFFFF = 4464
    val legacy = MultiModal.encodeHeader(2, 2, 0) ++ Array.fill[Byte](4)(9)
    val out = Seq(legacy).toDF("payload")
      .select(MultiModal.resize(70000, 1)(col("payload")))
      .collect()(0).getAs[Array[Byte]](0)
    MultiModal.decodeMeta(out).width shouldBe 65535
  }

  test("ambiguous 2-byte signatures fall back to the legacy header when unparseable") {
    // a legacy fixture whose be16 width is 0x424D ('BM'): too short for a
    // structural BMP parse, so metadata must come from the legacy header —
    // not be zeroed by the signature match
    val p = MultiModal.encodeHeader(0x424d, 123, 7) ++ b(1, 1, 1, 1)
    MultiModal.decodeMeta(p) shouldBe graft.multimodal.MediaMeta(0x424d, 123, 7, p.length)
    // same for a width of 0xFFD8 (the JPEG SOI marker)
    val q = MultiModal.encodeHeader(0xffd8, 55, 9) ++ b(0, 0, 0, 0, 0)
    MultiModal.decodeMeta(q).height shouldBe 55
    MultiModal.decodeMeta(q).sample_rate shouldBe 9
  }

  test("WAV PCM sample decode and per-frame RMS are real") {
    // 16-bit PCM mono: 4 zero samples then 4 full-scale samples
    val samples = Array[Short](0, 0, 0, 0, 32767, -32768, 32767, -32768)
    val data = samples.flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val wavPcm = ascii("RIFF") ++ le32b(36 + data.length) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(1) ++ le32b(8000) ++
      le32b(16000) ++ le16b(2) ++ le16b(16) ++
      ascii("data") ++ le32b(data.length) ++ data
    MultiModal.pcmSamples(wavPcm).get shouldBe samples
    val rms = MultiModal.audioRms(wavPcm, 2).get
    rms(0) shouldBe 0.0 +- 1e-9
    rms(1) shouldBe 1.0 +- 1e-3 // full-scale square wave
    // non-PCM/truncated audio degrades to None, never throws
    MultiModal.pcmSamples(ascii("RIFF") ++ le32b(4) ++ ascii("WAVE")) shouldBe None
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

  test("non-raster resize fallback rewrites header and sizes the body to w*h") {
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

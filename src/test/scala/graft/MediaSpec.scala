package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The declared multimodal query: real container decode over a parquet
  * binary-column round trip (MultiModalSpec pins the decoders themselves;
  * this pins the query's emitted values).
  */
class MediaSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("multimodal_meta decodes fixtures; BMP and PNG pixel sums agree") {
    val rows = SparkEntry.queries("multimodal_meta")(spark, sf001).collect()
    rows.length shouldBe 4
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // detected kinds come from magic bytes, independent of the label column
    byId(1L).getString(2) shouldBe "bmp"
    byId(2L).getString(2) shouldBe "png"
    byId(3L).getString(2) shouldBe "wav"
    byId(4L).getString(2) shouldBe "raw"
    // BMP and PNG encode the SAME raster: the arithmetic decoder and the
    // javax.imageio decoder must recover identical dimensions and pixels
    byId(1L).getInt(3) shouldBe 6
    byId(1L).getInt(4) shouldBe 4
    byId(2L).getInt(3) shouldBe 6
    byId(2L).getInt(4) shouldBe 4
    byId(1L).getLong(7) should be > 0L
    byId(1L).getLong(7) shouldBe byId(2L).getLong(7)
    // WAV: fmt-chunk sample rate; frame 2 of the half-scale square wave
    byId(3L).getInt(5) shouldBe 8000
    byId(3L).getDouble(8) shouldBe 0.5 +- 1e-3
    // legacy synthetic payload: header dims, no decodable raster
    byId(4L).getInt(3) shouldBe 7
    byId(4L).getInt(4) shouldBe 5
    byId(4L).getLong(7) shouldBe -1L
  }
}

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

  test("multimodal_phash: codec and brightness invariance, near-dup at Hamming 1, unrelated dropped") {
    val pairs = SparkEntry.queries("multimodal_phash")(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // the SAME raster through BMP (11) and PNG (12) — identical hash
    pairs((11L, 12L)) shouldBe 0L
    // +30 uniform brightness (14): gradient comparisons are unchanged
    pairs((11L, 14L)) shouldBe 0L
    pairs((12L, 14L)) shouldBe 0L
    // the local block edit (13) is a true near-dup of the whole family
    pairs((11L, 13L)) should (be >= 1L and be <= 10L)
    pairs((12L, 13L)) shouldBe pairs((11L, 13L)) // 11 ≡ 12 by hash
    // the unrelated raster (15) appears in NO pair (Hamming ~20 > 10)
    pairs.keys.flatMap(p => Seq(p._1, p._2)) should not contain 15L
    // banding found every qualifying pair: 4 family members, C(4,2) = 6
    pairs.size shouldBe 6
    // spec-level ground truth: recompute the two interesting distances
    // straight from the fixture rasters, no Spark in the path
    import graft.multimodal.MultiModal
    val fx = graft.queries.Media.phashFixtures
      .flatMap(m => MultiModal.decodeImage(m.payload).map(m.media_id -> MultiModal.dhash64(_))).toMap
    java.lang.Long.bitCount(fx(11L) ^ fx(12L)) shouldBe 0
    java.lang.Long.bitCount(fx(11L) ^ fx(13L)).toLong shouldBe pairs((11L, 13L))
  }

  test("multimodal_dedup: the image family collapses to one survivor; " +
      "the unrelated raster survives alone") {
    val rows = SparkEntry.queries("multimodal_dedup")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    rows.map(_._1).sorted shouldBe Array(11L, 12L, 13L, 14L, 15L)
    // 11/12/14 (same raster via two codecs + brightness) and 13 (the
    // block edit at Hamming 1) form ONE cluster; min-id 11 survives
    val family = rows.filter(t => Set(11L, 12L, 13L, 14L)(t._1))
    family.map(_._2).distinct.length shouldBe 1
    family.filter(_._3).map(_._1) shouldBe Array(11L)
    // the unrelated raster is its own cluster and survives
    val other = rows.find(_._1 == 15L).get
    other._2 should not be family.head._2
    other._3 shouldBe true
    // exactly two survivors total: 5 images -> 2 representatives
    rows.count(_._3) shouldBe 2
  }

  test("multimodal_resize: 8x6 everywhere, deterministic bytes, " +
      "raster-vs-fallback split") {
    val run1 = SparkEntry.queries("multimodal_resize")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // raster payloads (the 5 phash images) decode to true 8x6 BMPs
    val rasters = run1.filter(_._2 == "image")
    rasters.length shouldBe 5
    rasters.foreach { t =>
      t._3 shouldBe 8L; t._4 shouldBe 6L
      t._5 shouldBe (54L + 6 * 24) // BMP header + 6 rows of padded stride
    }
    // the same raster through BMP (11) and PNG (12) resizes to
    // byte-identical output — the canonical-BMP re-encode contract
    rasters.find(_._1 == 11L).get._6 shouldBe rasters.find(_._1 == 12L).get._6
    // non-raster payloads (audio fixtures) take the documented fallback
    // (no true raster dims)
    run1.filter(_._2 == "audio").foreach(t => t._3 shouldBe -1L)
    // rerun-deterministic: identical md5s end to end
    val run2 = SparkEntry.queries("multimodal_resize")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(5)))
    run2.toMap shouldBe run1.map(t => (t._1, t._6)).toMap
  }

  test("multimodal_audio_fp: gain invariance, near-dup edit kept, unrelated dropped") {
    val pairs = SparkEntry.queries("multimodal_audio_fp")(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // 2x gain (22): every frame energy scales by 4 exactly — identical fp
    pairs((21L, 22L)) shouldBe 0L
    // three-segment edit (23): a true near-dup of 21 and 22
    pairs((21L, 23L)) should (be >= 1L and be <= 6L)
    pairs((22L, 23L)) shouldBe pairs((21L, 23L))
    // the unrelated pattern (24) survives no pair
    pairs.keys.flatMap(p => Seq(p._1, p._2)) should not contain 24L
    pairs.size shouldBe 3 // C(3,2) over the {21,22,23} family
    // ground truth straight from the PCM fixtures
    import graft.multimodal.MultiModal
    val fx = graft.queries.Media.audioFixtures
      .flatMap(m => MultiModal.pcmSamples(m.payload).map(m.media_id -> MultiModal.audioFp32(_))).toMap
    java.lang.Long.bitCount(fx(21L) ^ fx(22L)) shouldBe 0
    java.lang.Long.bitCount(fx(21L) ^ fx(23L)).toLong shouldBe pairs((21L, 23L))
    java.lang.Long.bitCount(fx(21L) ^ fx(24L)) should be > 6
  }

  test("multimodal_frames samples every 3rd frame by seek and drops corrupt payloads") {
    val rows = SparkEntry.queries("multimodal_frames")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 12-frame pan sampled at stride 3 → frames 0,3,6,9; 6-frame static → 0,3
    rows.filter(_._1 == 31L).map(_._2).toSeq shouldBe Seq(0L, 3L, 6L, 9L)
    rows.filter(_._1 == 32L).map(_._2).toSeq shouldBe Seq(0L, 3L)
    // corrupt payload (33) contributes zero rows, not a failure
    rows.map(_._1) should not contain 33L
    // static clip: every sampled frame hashes identically
    rows.filter(_._1 == 32L).map(_._3).distinct.length shouldBe 1
    // ground truth: decode the pan clip directly and compare hash + pixsum
    import graft.multimodal.MultiModal
    val pan = graft.queries.Media.videoFixtures.find(_.media_id == 31L).get
    val direct = MultiModal.sampleGvidFrames(pan.payload, 3).map { case (i, im) =>
      (i.toLong, MultiModal.dhash64(im), im.rgb.foldLeft(0L)((a, v) => a + (v & 0xff)))
    }
    rows.filter(_._1 == 31L).map(t => (t._2, t._3, t._4)).toSeq shouldBe
      direct.map(t => (t._1, t._2, t._3))
  }
}

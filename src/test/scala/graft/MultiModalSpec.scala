package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.multimodal.{MediaRow, MultiModal}

/** Multimodal plumbing tests: the codec is a stub, but the schema, batch
  * shape, narrow execution, and partition preservation are real (SURVEY.md
  * north star). Payloads are synthesized deterministically from documents.
  */
class MultiModalSpec extends AnyFunSuite with SparkFixture with Matchers {

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
      frames.flatten.toArray shouldBe payload.drop(8)
        .take(frames.map(_.length).sum) // last partial chunk beyond n*sz is truncated
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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.examples.PipelineDemo

/** Smoke coverage for the end-to-end example so it can't silently rot. */
class PipelineDemoSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("cleanCorpus dedups, filters, and annotates") {
    val tr = new graft.operators.Tracked
    val corpus = PipelineDemo.cleanCorpus(spark, sf001, tr)
    val n = corpus.count()
    n should be > 0L
    n should be < T.t(spark, sf001, "documents").count() // something was dropped
    corpus.columns should contain allOf ("quality", "pred", "ws_toks", "fp")
    // survivors are exact-dedup canonical: no duplicate texts remain
    corpus.groupBy("text").count().filter(col("count") > 1).count() shouldBe 0L
    tr.release()
  }

  test("discretizedFeatures bins both dimensions for every vector") {
    val feats = PipelineDemo.discretizedFeatures(spark, sf001)
    feats.count() shouldBe T.t(spark, sf001, "embeddings").count()
    feats.filter(col("b0").isNull || col("b1").isNull).count() shouldBe 0L
  }
}

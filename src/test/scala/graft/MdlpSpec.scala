package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.ml.{CAIMDiscretizerModel, MDLPDiscretizer}

/** MDLP discretizer laws (round 11 — Fayyad & Irani 1993 over the shared
  * SupervisedHistogram): perfectly separable data cuts at the class
  * boundary, a pure column yields no cuts, interleaved noise is rejected
  * by the MDL criterion, boundaries are invariant to input partitioning,
  * and the shared model round-trips through save/load.
  */
class MdlpSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def fitOn(df: org.apache.spark.sql.DataFrame): Array[Double] =
    new MDLPDiscretizer()
      .setInputCols(Array("x")).setOutputCols(Array("xb"))
      .setLabelCol("y").fit(df).boundaries(0)

  test("separable two-class data cuts exactly at the class boundary") {
    import spark.implicits._
    // class a on 1..40, class b on 61..100 — clean margin at 50.5; enough
    // rows that the MDL term cannot reject the obvious split
    val df = ((1 to 40).map(v => (v.toDouble, "a")) ++
      (61 to 100).map(v => (v.toDouble, "b"))).toDF("x", "y")
    fitOn(df) shouldBe Array(1.0, 50.5, 100.0)
  }

  test("three separable classes recover both boundaries recursively") {
    import spark.implicits._
    val df = ((1 to 30).map(v => (v.toDouble, "a")) ++
      (41 to 70).map(v => (v.toDouble, "b")) ++
      (81 to 110).map(v => (v.toDouble, "c"))).toDF("x", "y")
    fitOn(df) shouldBe Array(1.0, 35.5, 75.5, 110.0)
  }

  test("a single-class (pure) column yields no interior cuts") {
    import spark.implicits._
    val df = (1 to 50).map(v => (v.toDouble, "only")).toDF("x", "y")
    fitOn(df) shouldBe Array(1.0, 50.0)
  }

  test("MDL rejects cuts on label-independent noise") {
    import spark.implicits._
    // label alternates with every value: every candidate split leaves both
    // halves at maximal entropy, so no gain clears the MDL threshold
    val df = (1 to 60).map(v => (v.toDouble, if (v % 2 == 0) "a" else "b"))
      .toDF("x", "y")
    fitOn(df).length shouldBe 2 // just [min, max]
  }

  test("boundaries are invariant to input partitioning") {
    val e = T.t(spark, sf001, "embeddings")
      .select(element_at(col("embedding"), 1).cast("double").as("x"),
        col("label").as("y"))
    val base = fitOn(e)
    base.length should be >= 2
    fitOn(e.repartition(7)) shouldBe base
    fitOn(e.orderBy(rand(seed = 11))) shouldBe base
  }

  test("candidate cap keeps the fit deterministic and bounded") {
    val e = T.t(spark, sf001, "embeddings")
      .select(element_at(col("embedding"), 1).cast("double").as("x"),
        col("label").as("y"))
    def boundsOf(cap: Int) = new MDLPDiscretizer()
      .setInputCols(Array("x")).setOutputCols(Array("xb"))
      .setLabelCol("y").setMaxCandidates(cap).fit(e).boundaries(0)
    val capped = boundsOf(16)
    capped.length should be >= 2
    boundsOf(16) shouldBe capped // deterministic under compression
  }

  test("model save/load round-trips through the shared CAIM model class") {
    import spark.implicits._
    val df = ((1 to 40).map(v => (v.toDouble, "a")) ++
      (61 to 100).map(v => (v.toDouble, "b"))).toDF("x", "y")
    val model = new MDLPDiscretizer()
      .setInputCols(Array("x")).setOutputCols(Array("xb"))
      .setLabelCol("y").fit(df)
    val dir = java.nio.file.Files.createTempDirectory("mdlp-model").toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = CAIMDiscretizerModel.load(dir)
    loaded.boundaries shouldBe model.boundaries
    val binned = loaded.transform(df).select("x", "xb").collect()
    binned.foreach { r =>
      r.getDouble(1) shouldBe (if (r.getDouble(0) <= 50.5) 0.0 else 1.0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Contamination

/** Train/eval n-gram contamination detection: planted leaks are found,
  * fresh docs stay clean, short docs report zero windows, attribution
  * counts the right train docs. */
class ContaminationSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val n = 5

  test("planted leaks are detected, fresh docs are clean") {
    import spark.implicits._
    val train = T.t(spark, sf001, "documents").select("doc_id", "text")
    // eval set: a verbatim window lifted from a train doc, a fresh doc
    // sharing no 5-gram, and a doc shorter than the window size
    val lifted = train.orderBy("doc_id").head().getString(1)
      .split(" ").slice(2, 12).mkString(" ")
    val eval_ = Seq(
      (9001L, s"prefix tokens $lifted suffix tokens"),
      (9002L, "completely novel vocabulary nowhere in corpus whatsoever truly"),
      (9003L, "too short")
    ).toDF("doc_id", "text")
    val r = Contamination.ngramHits(train, eval_, n).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    r.keySet shouldBe Set(9001L, 9002L, 9003L)
    val (w1, h1, t1, c1) = r(9001L)
    c1 shouldBe true
    h1 should be >= 6L // the 10-token lifted span carries 6 shared 5-grams
    t1 should be >= 1L
    w1 shouldBe 14L - (n - 1) // 14 tokens -> 10 windows
    r(9002L) shouldBe ((4L, 0L, 0L, false)) // 8 tokens -> 4 windows
    r(9003L) shouldBe ((0L, 0L, 0L, false))
  }

  test("self-contamination is total: every doc flags against itself") {
    val docs = T.t(spark, sf001, "documents").select("doc_id", "text")
    val r = Contamination.ngramHits(docs, docs, n)
    // every doc with at least one window must be contaminated (by itself)
    r.where(col("n_windows") > 0 && !col("contaminated")).count() shouldBe 0L
    // and every window of every such doc is a hit
    r.where(col("n_windows") > 0 && col("hits") =!= col("n_windows"))
      .count() shouldBe 0L
  }

  test("property: hits/attribution equal an in-memory brute force on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // tiny vocabulary forces real window collisions between random docs;
    // expected values come from a direct set computation independent of
    // the hashed-inverted-index dataflow
    val vocab = Vector("ab", "cd", "ef", "gh", "ij")
    val docGen = Gen.choose(1, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val caseGen: Gen[(List[String], List[String], Int)] = for {
      nTrain <- Gen.choose(1, 10)
      nEval <- Gen.choose(1, 8)
      train <- Gen.listOfN(nTrain, docGen)
      ev <- Gen.listOfN(nEval, docGen)
      ng <- Gen.choose(2, 4)
    } yield (train, ev, ng)
    val params = Gen.Parameters.default
    var run = 0
    var seedNo = 0L
    while (run < 20 && seedNo < 400) {
      caseGen.apply(params, Seed(seedNo)).foreach { case (trainTxt, evalTxt, ng) =>
        def windows(t: String): Seq[Seq[String]] =
          // limit -1 keeps trailing empty tokens like Spark's split()
          // (generated texts have none — rigor against future generators)
          t.split(" ", -1).toSeq.sliding(ng).filter(_.length == ng).toSeq
        val trainW = trainTxt.zipWithIndex.flatMap { case (t, i) =>
          windows(t).map(w => w -> i.toLong)
        }
        val trainByW = trainW.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val expected = evalTxt.zipWithIndex.map { case (t, i) =>
          val ws = windows(t)
          val hits = ws.distinct.filter(trainByW.contains)
          val attrib = hits.flatMap(trainByW(_)).toSet
          (i.toLong + 100, ws.length.toLong, hits.length.toLong,
            attrib.size.toLong, hits.nonEmpty)
        }.sortBy(_._1)
        val trainDf = trainTxt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val evalDf = evalTxt.zipWithIndex.map { case (t, i) => (i.toLong + 100, t) }
          .toDF("doc_id", "text")
        val got = Contamination.ngramHits(trainDf, evalDf, ng)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getBoolean(4))).toSeq
        withClue(s"seed=$seedNo n=$ng: ") { got shouldBe expected }
        run += 1
      }
      seedNo += 1
    }
    run should be >= 15
  }

  test("no text crosses the join: both sides carry hashed windows only") {
    import spark.implicits._
    val train = T.t(spark, sf001, "documents").select("doc_id", "text")
    val eval_ = Seq((1L, "the fast key order sort")).toDF("doc_id", "text")
    val plan = Contamination.ngramHits(train, eval_, n)
      .queryExecution.executedPlan.toString
    // the join key is the xxhash64 window value; the window STRING must
    // not appear as a join-side attribute (same discipline as the
    // hash-compacted jaccard kernel)
    plan should include("xxhash64")
  }
}
